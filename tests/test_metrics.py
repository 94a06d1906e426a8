"""Metric operators vs hand-computed expectations (A2-A4)."""

from __future__ import annotations

import pandas as pd

from information_extraction_spark.operators.metrics import (
    label_set_accuracy,
    multilabel_f1,
    multiset_span_f1,
)


def test_multilabel_f1(spark):
    # Row 1: preds {0,2} gold {0,1} → tp=1 fp=1 fn=1
    # Row 2: preds {1} gold {1}     → tp=1
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "probs": [[0.9, 0.1, 0.8], [0.2, 0.7, 0.3]],
                "labels": [[1, 1, 0], [0, 1, 0]],
            }
        )
    )
    got = multilabel_f1(df).collect()[0]
    assert (got["tp"], got["fp"], got["fn"]) == (2, 1, 1)
    assert got["precision_"] == round(2 / 3, 4)
    assert got["recall_"] == round(2 / 3, 4)
    assert got["f1"] == round(2 / 3, 4)


def _spo_df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["text", "predicate", "subject", "object"])
    )


def test_multiset_span_f1_consumes_golden_occurrences(spark):
    """labeling/predict.py:96-128: a golden item is consumed once
    (list.remove), so a duplicate prediction beyond golden
    multiplicity is a fp."""
    pred = _spo_df(
        spark,
        [
            ("s1", "p", "a", "b"),
            ("s1", "p", "a", "b"),  # duplicate: one tp + one fp
            ("s2", "p", "x", "y"),  # text not in golden → fp
        ],
    )
    gold = _spo_df(
        spark,
        [
            ("s1", "p", "a", "b"),
            ("s1", "q", "c", "d"),  # unmatched → fn
            ("s3", "p", "m", "n"),  # text not in pred → fn
        ],
    )
    got = multiset_span_f1(pred, gold).collect()[0]
    assert (got["tp"], got["fp"], got["fn"]) == (1, 2, 2)


def test_label_set_accuracy(spark):
    pred = spark.createDataFrame(
        pd.DataFrame(
            {"k": ["a", "a", "b", "c"], "label": ["x", "y", "x", "z"]}
        )
    )
    gold = spark.createDataFrame(
        pd.DataFrame(
            {"k": ["a", "a", "b", "b", "c"], "label": ["x", "y", "x", "y", "w"]}
        )
    )
    got = label_set_accuracy(pred, gold, keys=["k"]).collect()[0]
    # a: {x,y}=={x,y} exact; b: {x}⊂{x,y} subset only; c: {z} vs {w} neither
    assert got["exact_count"] == 1
    assert got["subset_count"] == 2  # a and b
    assert got["superset_count"] == 1  # a only
    assert got["n_keys"] == 3


def test_combine_scores_modes_and_validation(spark):
    """Ensemble operator: weighted mean vs logit sum on keyed score
    tables; mismatched weights rejected."""
    import pytest as _pytest

    from information_extraction_spark.operators.ensemble import (
        combine_scores,
    )

    a = spark.createDataFrame([("x", 0.2), ("y", 1.0)], "k string, score double")
    b = spark.createDataFrame([("x", 0.6), ("y", 0.0)], "k string, score double")
    mean = {
        r["k"]: r["ensemble_score"]
        for r in combine_scores([a, b], [1.0, 3.0], ["k"]).collect()
    }
    assert abs(mean["x"] - (0.2 * 1 + 0.6 * 3) / 4) < 1e-12
    assert abs(mean["y"] - 0.25) < 1e-12
    sums = {
        r["k"]: r["ensemble_score"]
        for r in combine_scores([a, b], [1.0, 3.0], ["k"], mode="sum").collect()
    }
    assert abs(sums["x"] - 2.0) < 1e-12
    with _pytest.raises(ValueError):
        combine_scores([a], [1.0, 2.0], ["k"])
