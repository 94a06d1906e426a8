"""Model-ensemble combination (SURVEY §2.9): weighted probability
averaging (reference classification/ensemble.py:85-141 — the
submission combined model prob matrices with weights like
[1, 10, 30, 9, 100]) and logit summing (labeling/ensemble.py:126-166).

In the reference these are numpy array ops over line-aligned score
files; here they are column arithmetic over keyed score tables —
an inner equi-join per model on the explicit example key (never
positional alignment), then a weighted sum expression. Scales as one
shuffle per model table (or zero when the tables are co-partitioned/
bucketed on the key).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def combine_scores(
    dfs: Sequence[DataFrame],
    weights: Sequence[float],
    keys: Sequence[str],
    score_col: str = "score",
    mode: str = "mean",
    out_col: str = "ensemble_score",
    assert_unique: bool = True,
) -> DataFrame:
    """Combine per-example scalar scores from N model tables.

    ``mode='mean'``: weighted average, Σ(wᵢ·sᵢ)/Σw (classification
    ensemble). ``mode='sum'``: plain weighted sum (the labeling
    ensemble's logit addition). Examples are matched by ``keys`` —
    an example must appear in every table (inner joins), mirroring
    the reference's equal-line-count assertion.

    ``assert_unique`` (default True) is the Spark analog of that
    alignment assertion: a duplicated key in any table would silently
    multiply join rows and inflate the combined scores, so each table
    is folded through a hash aggregate on the key — count(*) must be 1
    or the job fails with a clear message. A hash aggregate (not a
    window) keeps the guard sort-free with map-side partial combine,
    and its final-stage exchange is hash-partitioned on exactly the
    join keys, so the join reuses the partitioning instead of adding
    a shuffle. Pass False for pre-validated bucketed inputs.
    """
    if len(dfs) != len(weights) or not dfs:
        raise ValueError("need one weight per score table")
    if mode not in ("mean", "sum"):
        raise ValueError(f"unknown mode {mode!r}")
    total = float(sum(weights)) if mode == "mean" else 1.0
    out = None
    parts = []
    for i, (df, w) in enumerate(zip(dfs, weights)):
        col = f"_s{i}"
        cur = df.select(
            *keys, (F.col(score_col) * F.lit(float(w))).alias(col)
        )
        if assert_unique:
            agg = cur.groupBy(*keys).agg(
                F.sum(col).alias(col), F.count("*").alias("_n")
            )
            guard = F.when(F.col("_n") == 1, F.col(col)).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"combine_scores: duplicate key in model "
                            f"table {i} for ("
                        ),
                        F.concat_ws(
                            ", ", *[F.col(k).cast("string") for k in keys]
                        ),
                        F.lit(")"),
                    )
                )
            )
            cur = agg.select(*keys, guard.alias(col))
        parts.append(col)
        out = cur if out is None else out.join(cur, list(keys), "inner")
    expr = parts[0] if len(parts) == 1 else "+".join(parts)
    return out.withColumn(
        out_col, F.expr(expr) / F.lit(total)
    ).select(*keys, out_col)
