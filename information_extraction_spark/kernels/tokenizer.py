"""Tokenization / NN-input-prep kernels (SURVEY.md §2.2 P2, P4,
P8-P11): pure functions, batched through pandas UDFs at the Spark
layer (functions/encoding.py).

These reproduce the *data-processing* semantics of the reference's
model-input preparation; the tensors they would feed are consumed by
the pluggable model kernels (not shipped — deterministic dict kernels
stand in, see kernels/extraction.py).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

UNK = "[UNK]"
PAD = "[PAD]"
CLS = "[CLS]"
SEP = "[SEP]"


def expand_postag_per_char(
    postag: Sequence[tuple[str, str]],
) -> tuple[list[str], list[str]]:
    """Repeat each word and POS once per character so word/pos streams
    align 1:1 with the char stream (reference labeling/dataset.py:12-27,
    P2). Returns (words_per_char, pos_per_char)."""
    words: list[str] = []
    pos: list[str] = []
    for word, p in postag:
        for _ in word:
            words.append(word)
            pos.append(p)
    return words, pos


def wordpiece_tokenize(
    text: str,
    vocab: Mapping[str, int] | set[str],
    keep_unknown: bool = False,
    max_chars_per_word: int = 100,
) -> list[str]:
    """Greedy longest-match-first WordPiece over whitespace-split,
    CJK-isolated words (semantics of the reference BERT tokenizer,
    legacy/labeling/bert/tokenization.py:309-431 + the Chinese-char
    isolation of BasicTokenizer :194-307; the ``keep_unknown`` flag is
    the tokenize_not_UNK variant :161-192 that preserves the original
    surface instead of emitting [UNK]).

    Continuation pieces carry the '##' prefix. This is a fresh
    implementation of the published WordPiece algorithm, not a port.
    """
    def is_cjk(ch: str) -> bool:
        cp = ord(ch)
        return (
            0x4E00 <= cp <= 0x9FFF
            or 0x3400 <= cp <= 0x4DBF
            or 0xF900 <= cp <= 0xFAFF
        )

    # Basic pass: lowercase, isolate CJK chars, split on whitespace.
    out_words: list[str] = []
    buf: list[str] = []
    for ch in text.lower():
        if ch.isspace():
            if buf:
                out_words.append("".join(buf))
                buf = []
        elif is_cjk(ch):
            if buf:
                out_words.append("".join(buf))
                buf = []
            out_words.append(ch)
        else:
            buf.append(ch)
    if buf:
        out_words.append("".join(buf))

    pieces: list[str] = []
    for word in out_words:
        if len(word) > max_chars_per_word:
            pieces.append(word if keep_unknown else UNK)
            continue
        start = 0
        word_pieces: list[str] = []
        ok = True
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                piece = word[start:end]
                if start > 0:
                    piece = "##" + piece
                if piece in vocab:
                    cur = piece
                    break
                end -= 1
            if cur is None:
                ok = False
                break
            word_pieces.append(cur)
            start = end
        if ok:
            pieces.extend(word_pieces)
        else:
            pieces.append(word if keep_unknown else UNK)
    return pieces


def truncate_tokens(tokens: Sequence[str], max_seq_length: int) -> list[str]:
    """Reserve room for [CLS]/[SEP] (reference
    classification/dataset_bert.py:32, P9)."""
    return list(tokens[: max_seq_length - 2])


def frame_with_special_tokens(
    tokens: Sequence[str], max_seq_length: int
) -> tuple[list[str], list[int], list[int]]:
    """[CLS] + tokens + [SEP], zero segment ids, attention mask, all
    right-padded to max_seq_length (reference
    classification/dataset_bert.py:34-45 /
    run_predicate_classification.py:309-340, P10).

    Returns (framed_tokens, segment_ids, input_mask)."""
    toks = [CLS, *truncate_tokens(tokens, max_seq_length), SEP]
    mask = [1] * len(toks)
    seg = [0] * len(toks)
    pad_n = max_seq_length - len(toks)
    toks += [PAD] * pad_n
    mask += [0] * pad_n
    seg += [0] * pad_n
    return toks, seg, mask


def predicate_conditioned_frame(
    tokens: Sequence[str],
    predicate: str,
    predicate_index: int,
    max_seq_length: int,
) -> tuple[list[str], list[int], list[int]]:
    """Stage-2 input framing: second segment repeats the predicate
    len(tokens) times with segment id ``predicate_index + 1`` — the
    predicate-conditioned encoding of run_sequnce_labeling.py:298-330
    (P11).

    Returns (framed_tokens, segment_ids, input_mask)."""
    half = (max_seq_length - 3) // 2
    text_toks = list(tokens[:half])
    pred_toks = [predicate] * len(text_toks)
    toks = [CLS, *text_toks, SEP, *pred_toks, SEP]
    seg = (
        [0] * (len(text_toks) + 2)
        + [predicate_index + 1] * (len(pred_toks) + 1)
    )
    mask = [1] * len(toks)
    pad_n = max_seq_length - len(toks)
    toks += [PAD] * pad_n
    seg += [0] * pad_n
    mask += [0] * pad_n
    return toks, seg, mask


def index_tokens(
    tokens: Sequence[str],
    vocab: Mapping[str, int],
    unk_id: int = 0,
) -> list[int]:
    """Token → id via broadcast vocab (J2 — in-kernel map lookup,
    never a shuffle join; reference classification/dataset.py:67)."""
    return [vocab.get(t, unk_id) for t in tokens]


def pad_ids(
    ids: Sequence[int],
    length: int,
    pad_id: int = 0,
    left: bool = False,
) -> list[int]:
    """Pad/truncate to fixed length. The reference LEFT-pads
    classification inputs (classification/dataset.py:65-76) and
    right-pads labeling inputs (pytorch/labeling/dataset.py:125-135)
    — P8."""
    ids = list(ids[:length])
    pad = [pad_id] * (length - len(ids))
    return pad + ids if left else ids + pad


def multi_hot(labels: Sequence[int], n_classes: int = 50) -> list[int]:
    """spo_list → [0/1]*n multi-hot (classification/dataset.py:10-16,
    P5)."""
    out = [0] * n_classes
    for i in labels:
        if 0 <= i < n_classes:
            out[i] = 1
    return out


def one_hot(index: int, n_classes: int = 50) -> list[int]:
    """Relation index → one-hot (labeling/dataset.py:30-33, P6)."""
    out = [0] * n_classes
    if 0 <= index < n_classes:
        out[index] = 1
    return out


def dp_segment(
    text: str, freq: dict[str, int], max_word_len: int = 16
) -> list[str]:
    """Dictionary-based max-probability segmentation of an
    UNSEGMENTED string — the published unigram-DP algorithm behind
    jieba's dictionary route (build a DAG of dictionary matches per
    position, then right-to-left DP maximizing the sum of unigram
    log-probabilities; out-of-vocabulary characters score as
    frequency-1 singletons). This is the real algorithm the P3 seam
    stands in for when the jieba package itself is absent
    (reference pytorch/labeling/dataset.py:49-55 calls jieba.posseg).

    Ties break toward the LONGER candidate word (the (score, end)
    tuple max — identical to the published recurrence's behavior).
    Deterministic: same text + same dict → same tokens.
    """
    import math as _math

    n = len(text)
    if n == 0:
        return []
    total = sum(freq.values()) or 1
    log_total = _math.log(total)
    # route[i] = (best score of text[i:], end index of first word)
    route: list[tuple[float, int]] = [(0.0, 0)] * (n + 1)
    for i in range(n - 1, -1, -1):
        best = None
        for j in range(i, min(i + max_word_len, n)):
            word = text[i : j + 1]
            if j > i and word not in freq:
                continue
            score = (
                _math.log(freq.get(word) or 1)
                - log_total
                + route[j + 1][0]
            )
            cand = (score, j)
            if best is None or cand > best:
                best = cand
        route[i] = best  # j == i always admissible → never None
    out: list[str] = []
    i = 0
    while i < n:
        j = route[i][1]
        out.append(text[i : j + 1])
        i = j + 1
    return out


def segment_text(text: str):
    """Live segmentation + POS (reference pytorch/labeling/dataset.py:
    49-55 uses jieba.posseg, P3). jieba is not in this container, so
    this gates on the import and falls back to a deterministic
    whitespace/CJK-char segmentation with pos='x'."""
    try:
        import jieba.posseg as posseg  # type: ignore

        return [(w, p) for w, p in posseg.lcut(text)]
    except ImportError:
        out: list[tuple[str, str]] = []
        for token in text.split(" "):
            if not token:
                continue
            out.append((token, "x"))
        return out


def unigram_viterbi(
    word: str, scores: dict[str, int], max_piece: int = 4
) -> list[str]:
    """Viterbi segmentation under an INTEGER micro-nat unigram piece
    model — the E-step of SentencePiece's unigram trainer (Kudo 2018)
    in the repo's exact-arithmetic form: piece scores are
    round(ln(p)·10^6) BIGINTs quantized BEFORE any DP sum, so the DP
    compares integers only and a SQL restatement agrees bit-for-bit
    (dp_segment is the float/jieba-shaped sibling; THIS one is the
    cross-engine-provable trainer kernel). State d = characters
    remaining; best[d] = max over piece lengths pl <= max_piece of
    score(piece) + best[d - pl], ties to the LONGER piece. Pieces
    absent from the model are inadmissible — callers guarantee
    coverage (every single char scored)."""
    n = len(word)
    best = [0] * (n + 1)
    choice = [0] * (n + 1)
    for d in range(1, n + 1):
        bb = None
        for pl in range(1, min(max_piece, d) + 1):
            piece = word[n - d : n - d + pl]
            s = scores.get(piece)
            if s is None:
                continue
            cand = (s + best[d - pl], pl)
            if bb is None or cand > bb:
                bb = cand
        if bb is None:
            raise ValueError(f"no admissible piece at {word!r} d={d}")
        best[d], choice[d] = bb
    out = []
    d = n
    while d > 0:
        pl = choice[d]
        out.append(word[n - d : n - d + pl])
        d -= pl
    return out
