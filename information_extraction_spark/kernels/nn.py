"""Pure-numpy BiLSTM inference kernels — the tensor model behind the
pluggable seam.

The reference's winning models are BERT + BiLSTM(-CRF) sequence
models (classification/model_bert.py:14-118 for stage 1,
labeling/model.py:14-163 + crf.py for stage 2). Their fine-tuned
weights are not redistributable, so the engine ships deterministic
KB kernels by default (kernels/extraction.py) — but the seam those
kernels sit behind (mapInPandas over Arrow batches, weights as a
Spark broadcast, inputs framed by the P8-P11 tokenizer operators)
must demonstrably feed a REAL tensor model. This module proves it
with a seeded random-weight char-level BiLSTM implemented in numpy
(torch is absent from this container; the array math is identical):

* ``init_weights`` — one flat dict of float32 arrays, broadcast once
  per executor exactly like model weights on a cluster;
* ``bilstm_forward`` — batched (B, T, D) forward over a padded int
  matrix built by P8 (index+pad) / P10 (CLS/SEP+mask) / P11
  (predicate-conditioned segments);
* ``classify_logits`` — stage-1 head: masked mean-pool → sigmoid
  multi-label scores over the predicate inventory;
* ``tag_ids`` — stage-2 head: per-position argmax over the 9-tag
  BIESO alphabet (labeling/tagging.py:9-51's label space).

Parity with the reference's scores is NOT the goal (random weights);
batch shape, padding, masking and broadcast plumbing are — pinned by
tests/test_nn_kernel.py, which runs the full extraction DAG with
these kernels swapped in.
"""

from __future__ import annotations

import numpy as np

# BIESO tag alphabet (index 0 must be 'O' so padding decodes to
# no-entity).
TAGS = (
    "O",
    "B-SUB",
    "I-SUB",
    "E-SUB",
    "S-SUB",
    "B-OBJ",
    "I-OBJ",
    "E-OBJ",
    "S-OBJ",
)
N_TAGS = len(TAGS)

# Special-token ids (P8 vocab layout: specials first, then chars).
PAD_ID, UNK_ID, CLS_ID, SEP_ID = 0, 1, 2, 3
N_SPECIAL = 4

MAX_SEG = 64  # segment-id embedding rows (predicate_index + 1 < 64)


def init_weights(
    vocab_size: int,
    n_predicates: int = 50,
    dim: int = 32,
    hidden: int = 32,
    seed: int = 0,
    scale: float = 1.0,
) -> dict[str, np.ndarray]:
    """Seeded random float32 weights; a fine-tuned checkpoint would be
    loaded into the same dict and broadcast the same way. ``scale``
    ~1.0 keeps the random tagger's argmax position-sensitive (at 0.1
    the bias term dominates and every position collapses to one tag —
    fine for shape tests, useless for an end-to-end smoke that should
    emit some decodable spans)."""
    rng = np.random.default_rng(seed)

    def m(*shape: int) -> np.ndarray:
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    return {
        "emb": m(vocab_size, dim),
        "seg": m(MAX_SEG, dim),
        "w_f": m(dim, 4 * hidden),
        "u_f": m(hidden, 4 * hidden),
        "b_f": m(4 * hidden),
        "w_b": m(dim, 4 * hidden),
        "u_b": m(hidden, 4 * hidden),
        "b_b": m(4 * hidden),
        "w_cls": m(2 * hidden, n_predicates),
        "b_cls": m(n_predicates),
        "w_tag": m(2 * hidden, N_TAGS),
        "b_tag": m(N_TAGS),
    }


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def _lstm_dir(
    x: np.ndarray,
    w: np.ndarray,
    u: np.ndarray,
    b: np.ndarray,
    reverse: bool,
    lengths: np.ndarray | None = None,
) -> np.ndarray:
    """One LSTM direction over (B, T, D) → (B, T, H). Time loop,
    batch-vectorized. With ``lengths``, packed-sequence semantics
    (torch's pack_padded_sequence): state and outputs are held at
    zero on PAD positions (t >= length), so the backward direction
    effectively STARTS at each row's last real position and PAD
    content can never leak into the real region."""
    bsz, t_len, _ = x.shape
    hid = u.shape[0]
    h = np.zeros((bsz, hid), dtype=np.float32)
    c = np.zeros((bsz, hid), dtype=np.float32)
    out = np.zeros((bsz, t_len, hid), dtype=np.float32)
    steps = range(t_len - 1, -1, -1) if reverse else range(t_len)
    for t in steps:
        gates = x[:, t, :] @ w + h @ u + b
        i, f, g, o = np.split(gates, 4, axis=1)
        c_new = _sigmoid(f) * c + _sigmoid(i) * np.tanh(g)
        h_new = _sigmoid(o) * np.tanh(c_new)
        if lengths is not None:
            valid = (t < lengths)[:, None]
            c = np.where(valid, c_new, 0.0).astype(np.float32)
            h = np.where(valid, h_new, 0.0).astype(np.float32)
        else:
            c, h = c_new, h_new
        out[:, t, :] = h
    return out


def bilstm_forward(
    weights: dict[str, np.ndarray],
    ids: np.ndarray,
    seg_ids: np.ndarray | None = None,
    lengths: np.ndarray | None = None,
) -> np.ndarray:
    """(B, T) int token ids [+ segment ids] → (B, T, 2H) states.
    ``lengths`` enables packed-sequence masking (see _lstm_dir)."""
    assert ids.ndim == 2, f"expected (B, T) id matrix, got {ids.shape}"
    if lengths is not None:
        lengths = np.asarray(lengths, dtype=np.int64)
        assert lengths.shape == (ids.shape[0],)
        assert (lengths >= 1).all() and (lengths <= ids.shape[1]).all()
    x = weights["emb"][ids]
    if seg_ids is not None:
        assert seg_ids.shape == ids.shape
        x = x + weights["seg"][seg_ids]
    fwd = _lstm_dir(
        x, weights["w_f"], weights["u_f"], weights["b_f"], False, lengths
    )
    bwd = _lstm_dir(
        x, weights["w_b"], weights["u_b"], weights["b_b"], True, lengths
    )
    return np.concatenate([fwd, bwd], axis=2)


def classify_logits(
    weights: dict[str, np.ndarray],
    ids: np.ndarray,
    mask: np.ndarray,
) -> np.ndarray:
    """Stage-1 head: masked mean-pool → (B, n_predicates) sigmoid
    scores (the multi-label sigmoid of model_bert.py's classifier).
    The mask doubles as the packed-sequence length source, which is
    only valid for a CONTIGUOUS-PREFIX mask ([CLS]..[SEP] then PAD,
    the P10 right-padded framing — asserted below, because a
    left-padded input would silently zero the real tokens' state
    instead of the padding's). PAD content therefore cannot reach the
    pooled states through either LSTM direction."""
    lengths = mask.sum(axis=1).clip(min=1)
    prefix = (
        np.arange(mask.shape[1])[None, :] < lengths[:, None]
    ).astype(mask.dtype)
    assert np.array_equal(mask != 0, prefix != 0), (
        "classify_logits requires a contiguous-prefix (right-padded) "
        "mask; left-padded inputs must be re-framed"
    )
    states = bilstm_forward(weights, ids, lengths=lengths)
    m = mask.astype(np.float32)[:, :, None]
    pooled = (states * m).sum(axis=1) / np.maximum(
        m.sum(axis=1), 1.0
    )
    return _sigmoid(pooled @ weights["w_cls"] + weights["b_cls"])


def tag_ids(
    weights: dict[str, np.ndarray],
    ids: np.ndarray,
    seg_ids: np.ndarray,
    lengths: np.ndarray | None = None,
) -> np.ndarray:
    """Stage-2 head: (B, T) → (B, T) argmax tag ids over TAGS."""
    states = bilstm_forward(weights, ids, seg_ids, lengths)
    logits = states @ weights["w_tag"] + weights["b_tag"]
    return logits.argmax(axis=2)


def crf_decode(
    transitions: np.ndarray,
    emissions: np.ndarray,
    lengths: np.ndarray | None = None,
) -> np.ndarray:
    """Batched MASK-AWARE Viterbi decode: the reference's labeling
    model is a BiLSTM-*CRF* (labeling/model.py:14-163 + crf.py:163-335
    — `viterbi_decode` over learned tag-transition scores AND the
    input mask), so the seam must demonstrably run a structured
    decoder whose padding cannot perturb real positions.
    ``transitions`` is (n_tags, n_tags) [from→to]; ``emissions`` is
    (B, T, n_tags); ``lengths`` (B,) gives each row's real (unpadded)
    frame length — each row's path is decoded over exactly its first
    ``lengths[b]`` steps (backtrace starts at position lengths[b]-1,
    so PAD emissions beyond it never influence the path) and PAD
    positions emit tag 0 ('O'). Pure max-sum dynamic programming,
    batch-vectorized over B — the recurrence crf.py implements in
    torch.
    """
    bsz, t_len, n = emissions.shape
    assert transitions.shape == (n, n)
    if lengths is None:
        lengths = np.full(bsz, t_len, dtype=np.int64)
    lengths = np.asarray(lengths, dtype=np.int64)
    assert lengths.shape == (bsz,)
    assert (lengths >= 1).all() and (lengths <= t_len).all()
    score = emissions[:, 0, :].copy()  # (B, n)
    back = np.zeros((bsz, t_len, n), dtype=np.int64)
    # Per-step score history so each row can start its backtrace at
    # its OWN final real position (DP at step t depends only on
    # emissions[:, :t+1], so truncation per row is exact).
    score_hist = np.zeros((bsz, t_len, n), dtype=emissions.dtype)
    score_hist[:, 0, :] = score
    for t in range(1, t_len):
        # (B, from, to): prior path score + transition + emission
        cand = score[:, :, None] + transitions[None, :, :]
        back[:, t, :] = cand.argmax(axis=1)
        score = cand.max(axis=1) + emissions[:, t, :]
        score_hist[:, t, :] = score
    rows = np.arange(bsz)
    last = lengths - 1
    path = np.zeros((bsz, t_len), dtype=np.int64)
    path[rows, last] = score_hist[rows, last, :].argmax(axis=1)
    for t in range(t_len - 2, -1, -1):
        active = last > t  # rows whose real region extends past t
        prev = back[rows, t + 1, path[:, t + 1]]
        path[:, t] = np.where(active, prev, path[:, t])
    # PAD positions (>= length) stay tag 0 ('O')
    pos = np.arange(t_len)[None, :]
    path[pos >= lengths[:, None]] = 0
    return path


def tag_ids_crf(
    weights: dict[str, np.ndarray],
    ids: np.ndarray,
    seg_ids: np.ndarray,
    lengths: np.ndarray | None = None,
) -> np.ndarray:
    """Stage-2 head with CRF decoding: BiLSTM emissions → mask-aware
    Viterbi over the learned transition matrix (weights['crf']; added
    by ``with_crf``). ``lengths`` = per-row count of real (non-PAD)
    frame positions, i.e. the attention-mask sum — applied BOTH as
    packed-sequence masking in the BiLSTM (PAD cannot reach real
    emissions through the backward direction) and as the Viterbi
    decode bound."""
    states = bilstm_forward(weights, ids, seg_ids, lengths)
    emissions = states @ weights["w_tag"] + weights["b_tag"]
    return crf_decode(weights["crf"], emissions, lengths)


def with_crf(
    weights: dict[str, np.ndarray], seed: int = 1, scale: float = 1.0
) -> dict[str, np.ndarray]:
    """Attach a seeded random (n_tags, n_tags) transition matrix —
    the CRF parameters a trained checkpoint would provide."""
    rng = np.random.default_rng(seed)
    return {
        **weights,
        "crf": (rng.standard_normal((N_TAGS, N_TAGS)) * scale).astype(
            np.float32
        ),
    }


# --- Checkpoint serialization ----------------------------------------------
#
# The reference ships trained weights as TF checkpoints and converts
# them for inference (convert_tf_checkpoint_to_pytorch.py:31-77 — read
# tensors by name, reshape, load_state_dict). The analog here is an
# npz round-trip: every float32 array in the weight dict (plus the
# optional CRF transition matrix and the char vocab) is stored
# losslessly, so a fine-tuned model saved on a trainer box reloads
# bit-identically on every executor after one broadcast.

CHECKPOINT_VERSION = 1

_REQUIRED_WEIGHT_KEYS = frozenset(
    {
        "emb", "seg", "w_f", "u_f", "b_f", "w_b", "u_b", "b_b",
        "w_cls", "b_cls", "w_tag", "b_tag",
    }
)


def save_checkpoint(
    path: str,
    weights: dict[str, np.ndarray],
    vocab: dict[str, int] | None = None,
) -> None:
    """Serialize a weight dict (and optionally its char vocab — a
    checkpoint without the vocab it was trained with is unusable) to
    one ``.npz`` file. npy storage is exact binary, so the round trip
    is bit-identical."""
    import json

    missing = _REQUIRED_WEIGHT_KEYS - set(weights)
    if missing:
        raise ValueError(f"weight dict missing keys: {sorted(missing)}")
    arrays: dict[str, np.ndarray] = {
        f"w::{k}": np.asarray(v) for k, v in weights.items()
    }
    arrays["meta::version"] = np.array(CHECKPOINT_VERSION, dtype=np.int64)
    if vocab is not None:
        arrays["meta::vocab_json"] = np.array(
            json.dumps(vocab, ensure_ascii=False, sort_keys=True)
        )
    np.savez_compressed(path, **arrays)


def load_checkpoint(
    path: str,
) -> tuple[dict[str, np.ndarray], dict[str, int] | None]:
    """Load and VALIDATE a checkpoint written by ``save_checkpoint``:
    required keys present, consistent embedding/hidden dimensions, and
    a square CRF matrix over the tag alphabet when one is carried.
    Returns ``(weights, vocab_or_None)``."""
    import json

    with np.load(path, allow_pickle=False) as z:
        version = int(z["meta::version"])
        if version != CHECKPOINT_VERSION:
            raise ValueError(
                f"checkpoint version {version} unsupported "
                f"(expected {CHECKPOINT_VERSION})"
            )
        weights = {
            k[len("w::") :]: z[k] for k in z.files if k.startswith("w::")
        }
        vocab = (
            json.loads(str(z["meta::vocab_json"]))
            if "meta::vocab_json" in z.files
            else None
        )
    missing = _REQUIRED_WEIGHT_KEYS - set(weights)
    if missing:
        raise ValueError(f"checkpoint missing weights: {sorted(missing)}")
    dim = weights["emb"].shape[1]
    hidden = weights["u_f"].shape[0]
    checks = [
        (weights["seg"].shape[1] == dim, "seg dim != emb dim"),
        (weights["w_f"].shape == (dim, 4 * hidden), "w_f shape"),
        (weights["u_f"].shape == (hidden, 4 * hidden), "u_f shape"),
        (weights["b_f"].shape == (4 * hidden,), "b_f shape"),
        (weights["w_b"].shape == (dim, 4 * hidden), "w_b shape"),
        (weights["u_b"].shape == (hidden, 4 * hidden), "u_b shape"),
        (weights["b_b"].shape == (4 * hidden,), "b_b shape"),
        (weights["w_cls"].shape[0] == 2 * hidden, "w_cls rows"),
        (
            weights["b_cls"].shape == (weights["w_cls"].shape[1],),
            "b_cls shape",
        ),
        (weights["w_tag"].shape == (2 * hidden, N_TAGS), "w_tag shape"),
        (weights["b_tag"].shape == (N_TAGS,), "b_tag shape"),
    ]
    if "crf" in weights:
        checks.append(
            (weights["crf"].shape == (N_TAGS, N_TAGS), "crf shape")
        )
    bad = [msg for ok, msg in checks if not ok]
    if bad:
        raise ValueError(f"checkpoint shape validation failed: {bad}")
    if vocab is not None and weights["emb"].shape[0] < len(vocab):
        raise ValueError(
            f"embedding rows {weights['emb'].shape[0]} < vocab size "
            f"{len(vocab)}"
        )
    return weights, vocab


def build_char_vocab(chars: list[str]) -> dict[str, int]:
    """P7-shaped vocab: specials at fixed ids, then sorted chars."""
    vocab = {"[PAD]": PAD_ID, "[UNK]": UNK_ID, "[CLS]": CLS_ID, "[SEP]": SEP_ID}
    for i, c in enumerate(sorted(chars)):
        vocab[c] = N_SPECIAL + i
    return vocab
