"""Stage-level quality metrics (SURVEY.md §2.4 A2-A4).

All are single-pass aggregations over exploded (row, class) or
(row, item) pairs — map-side combinable, one tiny shuffle each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def multilabel_f1(
    scored: DataFrame,
    probs_col: str = "probs",
    labels_col: str = "labels",
    threshold: float = 0.5,
) -> DataFrame:
    """Multi-label classification micro F1 over a (probs, labels)
    matrix — elementwise TP/FP/FN of thresholded probabilities
    accumulated across all rows and classes (reference
    classification/utils.py:57-81, A2).

    ``probs``: array<double> per row; ``labels``: array<int> 0/1
    multi-hot of equal length. Returns one row (tp, fp, fn,
    precision_, recall_, f1) with the reference's rounding-free
    ratios rounded to 4dp for reporting.
    """
    pairs = scored.select(
        F.explode(
            F.zip_with(
                F.col(probs_col),
                F.col(labels_col),
                lambda p, y: F.struct(
                    (p > threshold).cast("int").alias("pred"),
                    y.cast("int").alias("gold"),
                ),
            )
        ).alias("e")
    ).select(F.col("e.pred").alias("pred"), F.col("e.gold").alias("gold"))
    sums = pairs.agg(
        F.sum(F.col("pred") * F.col("gold")).cast("long").alias("tp"),
        F.sum(F.col("pred") * (1 - F.col("gold"))).cast("long").alias("fp"),
        F.sum((1 - F.col("pred")) * F.col("gold")).cast("long").alias("fn"),
    )
    p = F.col("tp") * 1.0 / (F.col("tp") + F.col("fp"))
    r = F.col("tp") * 1.0 / (F.col("tp") + F.col("fn"))
    return sums.select(
        "tp",
        "fp",
        "fn",
        F.round(p, 4).alias("precision_"),
        F.round(r, 4).alias("recall_"),
        F.round(2 * p * r / (p + r), 4).alias("f1"),
    )


def multiset_span_f1(
    predicted: DataFrame,
    golden: DataFrame,
    keys: list[str] | None = None,
    item_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key MULTISET tp/fp/fn micro F1 (reference
    labeling/predict.py:96-128, A3): each predicted item consumes at
    most one golden occurrence (the reference's ``list.remove``), so
    duplicate predictions beyond the golden multiplicity count as fp,
    and unmatched golden occurrences as fn. Keys present on only one
    side contribute all-fp / all-fn (predict.py:121-124).

    Implemented with per-(key, item) occurrence counts:
    tp = Σ min(n_pred, n_gold); fp = Σ (n_pred - min); fn = Σ (n_gold - min).
    """
    keys = keys or ["text"]
    item_cols = item_cols or ["predicate", "subject", "object"]
    group = keys + item_cols
    p = predicted.groupBy(group).agg(F.count("*").alias("n_pred"))
    g = golden.groupBy(group).agg(F.count("*").alias("n_gold"))
    joined = p.join(g, group, "full_outer").select(
        F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
        F.coalesce("n_gold", F.lit(0)).alias("n_gold"),
    )
    m = F.least(F.col("n_pred"), F.col("n_gold"))
    sums = joined.agg(
        F.sum(m).cast("long").alias("tp"),
        F.sum(F.col("n_pred") - m).cast("long").alias("fp"),
        F.sum(F.col("n_gold") - m).cast("long").alias("fn"),
    )
    prec = F.col("tp") * 1.0 / (F.col("tp") + F.col("fp"))
    rec = F.col("tp") * 1.0 / (F.col("tp") + F.col("fn"))
    return sums.select(
        "tp",
        "fp",
        "fn",
        F.round(prec, 4).alias("precision_"),
        F.round(rec, 4).alias("recall_"),
        F.round(2 * prec * rec / (prec + rec), 4).alias("f1"),
    )


def label_set_accuracy(
    predicted: DataFrame,
    golden: DataFrame,
    keys: list[str],
    label_col: str = "label",
) -> DataFrame:
    """Exact / subset / superset counts between per-key predicted and
    golden label SETS (reference evaluate_classifiction.py:53-73, A4)."""
    p = predicted.groupBy(keys).agg(
        F.collect_set(label_col).alias("pset")
    )
    g = golden.groupBy(keys).agg(F.collect_set(label_col).alias("gset"))
    j = p.join(g, keys, "full_outer").select(
        F.coalesce("pset", F.array()).alias("pset"),
        F.coalesce("gset", F.array()).alias("gset"),
    )
    subset = F.size(F.array_except("pset", "gset")) == 0
    superset = F.size(F.array_except("gset", "pset")) == 0
    return j.agg(
        F.sum((subset & superset).cast("int")).cast("long").alias("exact_count"),
        F.sum(subset.cast("int")).cast("long").alias("subset_count"),
        F.sum(superset.cast("int")).cast("long").alias("superset_count"),
        F.count("*").alias("n_keys"),
    )
