"""Checkpoint save/load behind the tensor seam (VERDICT r02 #1):
an npz round-trip must reproduce the weight dict bit-identically, and
a pipeline run from the RELOADED checkpoint must emit exactly the
triples the in-memory weights emit — the reference's
convert_tf_checkpoint_to_pytorch.py artifact seam, completed.

Also pins the inference-dedup memo (VERDICT r02 #3): a corpus with
duplicated turns must produce set-identical triples with the memo on
and off.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from information_extraction_spark import schemas as S
from information_extraction_spark.kernels import nn

N_PRED = 8
PREDICATES = [f"rel{k:02d}" for k in range(N_PRED)]


@pytest.fixture(scope="module")
def vocab(transcripts_pdf):
    chars = sorted({c for t in transcripts_pdf["text"] for c in t})
    v = nn.build_char_vocab(chars)
    for p in PREDICATES:
        v[p] = len(v)
    return v


@pytest.fixture(scope="module")
def weights(vocab):
    return nn.with_crf(
        nn.init_weights(len(vocab), n_predicates=N_PRED, seed=11), seed=3
    )


def test_roundtrip_bit_identical(tmp_path, weights, vocab):
    path = os.path.join(tmp_path, "model.npz")
    nn.save_checkpoint(path, weights, vocab)
    loaded, loaded_vocab = nn.load_checkpoint(path)
    assert set(loaded) == set(weights)
    for k in weights:
        assert loaded[k].dtype == weights[k].dtype, k
        assert loaded[k].shape == weights[k].shape, k
        # npy storage is exact binary — bit identity, not allclose
        assert np.array_equal(loaded[k], weights[k]), k
    assert loaded_vocab == vocab


def test_roundtrip_without_vocab(tmp_path, weights):
    path = os.path.join(tmp_path, "bare.npz")
    nn.save_checkpoint(path, weights)
    loaded, loaded_vocab = nn.load_checkpoint(path)
    assert loaded_vocab is None
    assert np.array_equal(loaded["crf"], weights["crf"])


def test_save_rejects_missing_keys(tmp_path, weights):
    broken = {k: v for k, v in weights.items() if k != "u_b"}
    with pytest.raises(ValueError, match="u_b"):
        nn.save_checkpoint(os.path.join(tmp_path, "x.npz"), broken)


def test_load_validates_shapes(tmp_path, weights, vocab):
    path = os.path.join(tmp_path, "bad.npz")
    corrupt = dict(weights)
    corrupt["crf"] = np.zeros((3, 3), dtype=np.float32)
    nn.save_checkpoint(path, corrupt, vocab)
    with pytest.raises(ValueError, match="crf shape"):
        nn.load_checkpoint(path)
    corrupt = dict(weights)
    corrupt["u_f"] = corrupt["u_f"][:, :-1]
    nn.save_checkpoint(path, corrupt, vocab)
    with pytest.raises(ValueError, match="shape validation"):
        nn.load_checkpoint(path)


def test_load_rejects_vocab_larger_than_embedding(tmp_path, weights):
    path = os.path.join(tmp_path, "small_emb.npz")
    big_vocab = {f"t{i}": i for i in range(weights["emb"].shape[0] + 5)}
    nn.save_checkpoint(path, weights, big_vocab)
    with pytest.raises(ValueError, match="embedding rows"):
        nn.load_checkpoint(path)


def _schemas_df(spark):
    rows = [
        (k, PREDICATES[k], f"T{k % 7}", f"U{k % 5}") for k in range(N_PRED)
    ]
    return spark.createDataFrame(rows, schema=S.RELATION_SCHEMAS)


_KEY = ["conv_id", "turn_idx", "predicate", "subject", "object"]


def test_pipeline_from_reloaded_checkpoint_bit_identical(
    spark, transcripts_pdf, weights, vocab, tmp_path
):
    """Save → reload → broadcast → extract: the loaded checkpoint's
    triples must equal the in-memory weights' triples exactly."""
    from information_extraction_spark.operators.nn_inference import (
        nn_extract_triples,
        nn_extract_triples_from_checkpoint,
    )

    pdf = transcripts_pdf.head(40)
    tdf = spark.createDataFrame(pdf, schema=S.TRANSCRIPTS)
    schemas = _schemas_df(spark)
    direct = nn_extract_triples(
        spark, tdf, schemas, weights, vocab, threshold=0.5
    ).toPandas()

    path = os.path.join(tmp_path, "ckpt.npz")
    nn.save_checkpoint(path, weights, vocab)
    reloaded = nn_extract_triples_from_checkpoint(
        spark, tdf, schemas, path, threshold=0.5
    ).toPandas()

    a = sorted(direct[_KEY].itertuples(index=False, name=None))
    b = sorted(reloaded[_KEY].itertuples(index=False, name=None))
    assert len(a) > 0
    assert a == b


def test_checkpoint_without_vocab_rejected_by_pipeline(
    spark, weights, tmp_path
):
    from information_extraction_spark.operators.nn_inference import (
        nn_extract_triples_from_checkpoint,
    )

    path = os.path.join(tmp_path, "novocab.npz")
    nn.save_checkpoint(path, weights)
    with pytest.raises(ValueError, match="no vocab"):
        nn_extract_triples_from_checkpoint(
            spark, None, None, path
        )


def test_dedup_memo_output_set_identical(
    spark, transcripts_pdf, weights, vocab
):
    """A duplicate-bearing corpus (each turn repeated 3×, distinct
    conv_ids) through the memoized and unmemoized paths must emit
    set-identical triples — the memo is a pure-function cache, never
    a semantic change."""
    from information_extraction_spark.operators.nn_inference import (
        nn_extract_triples,
    )

    base = transcripts_pdf.head(20)
    dups = []
    for rep in range(3):
        d = base.copy()
        d["conv_id"] = d["conv_id"].astype(str) + f"_rep{rep}"
        dups.append(d)
    corpus = pd.concat(dups, ignore_index=True)
    tdf = spark.createDataFrame(corpus, schema=S.TRANSCRIPTS)
    schemas = _schemas_df(spark)

    on = nn_extract_triples(
        spark, tdf, schemas, weights, vocab, threshold=0.5, dedup=True
    ).toPandas()
    off = nn_extract_triples(
        spark, tdf, schemas, weights, vocab, threshold=0.5, dedup=False
    ).toPandas()
    sa = set(on[_KEY].itertuples(index=False, name=None))
    sb = set(off[_KEY].itertuples(index=False, name=None))
    assert len(sa) > 0
    assert sa == sb
    # every replica must carry the same triples as its base conv
    reps = {c.rsplit("_rep", 1)[1] for c in on["conv_id"]}
    assert reps == {"0", "1", "2"}
