"""NN-input-prep kernel goldens (SURVEY §2.2 P2, P4-P11)."""

from __future__ import annotations

from information_extraction_spark.kernels.tokenizer import (
    CLS,
    PAD,
    SEP,
    UNK,
    expand_postag_per_char,
    frame_with_special_tokens,
    index_tokens,
    multi_hot,
    one_hot,
    pad_ids,
    predicate_conditioned_frame,
    segment_text,
    truncate_tokens,
    wordpiece_tokenize,
)


def test_expand_postag_per_char():
    """labeling/dataset.py:12-27: word/pos repeated per char so the
    three streams align 1:1."""
    postag = [("《", "w"), ("端脑", "nw"), ("》", "w")]
    words, pos = expand_postag_per_char(postag)
    assert words == ["《", "端脑", "端脑", "》"]
    assert pos == ["w", "nw", "nw", "w"]
    assert len(words) == len("《端脑》")


def test_wordpiece_cjk_isolated_and_hash_pieces():
    vocab = {"新", "地", "球", "ge", "##nes", "##is", "the"}
    got = wordpiece_tokenize("新地球genesis the", vocab)
    assert got == ["新", "地", "球", "ge", "##nes", "##is", "the"]


def test_wordpiece_unk_vs_not_unk():
    vocab = {"the"}
    assert wordpiece_tokenize("the zzz", vocab) == ["the", UNK]
    # tokenize_not_UNK variant (tokenization.py:161-192) keeps surface.
    assert wordpiece_tokenize("the zzz", vocab, keep_unknown=True) == [
        "the",
        "zzz",
    ]


def test_wordpiece_longest_match_first():
    vocab = {"un", "##aff", "##able", "##a", "##ff", "unaff"}
    assert wordpiece_tokenize("unaffable", vocab) == ["unaff", "##able"]


def test_truncate_and_frame():
    toks = [f"t{i}" for i in range(10)]
    assert truncate_tokens(toks, 8) == toks[:6]
    framed, seg, mask = frame_with_special_tokens(toks[:3], 8)
    assert framed == [CLS, "t0", "t1", "t2", SEP] + [PAD] * 3
    assert mask == [1] * 5 + [0] * 3
    assert seg == [0] * 8


def test_predicate_conditioned_frame():
    """run_sequnce_labeling.py:298-330: second segment repeats the
    predicate len(text) times; segment id = predicate_index + 1."""
    toks = ["a", "b", "c"]
    framed, seg, mask = predicate_conditioned_frame(toks, "rel", 4, 11)
    assert framed == [CLS, "a", "b", "c", SEP, "rel", "rel", "rel", SEP, PAD, PAD]
    assert seg == [0, 0, 0, 0, 0, 5, 5, 5, 5, 0, 0]
    assert mask == [1] * 9 + [0] * 2


def test_index_and_pad_sides():
    vocab = {"a": 3, "b": 4}
    ids = index_tokens(["a", "b", "x"], vocab, unk_id=1)
    assert ids == [3, 4, 1]
    # LEFT pad for classification (classification/dataset.py:65-76),
    # right pad for labeling (pytorch/labeling/dataset.py:125-135).
    assert pad_ids(ids, 5, pad_id=0, left=True) == [0, 0, 3, 4, 1]
    assert pad_ids(ids, 5, pad_id=0, left=False) == [3, 4, 1, 0, 0]
    assert pad_ids(ids, 2) == [3, 4]


def test_multi_hot_one_hot():
    assert multi_hot([0, 3], 5) == [1, 0, 0, 1, 0]
    assert one_hot(2, 4) == [0, 0, 1, 0]
    assert multi_hot([99], 5) == [0] * 5


def test_segment_text_fallback_without_jieba():
    got = segment_text("hello world")
    assert [w for w, _ in got] == ["hello", "world"]
