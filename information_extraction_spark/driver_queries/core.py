"""Core relational/window operator queries (SURVEY.md §2.2-2.6) over
the driver test tables, each with a DuckDB oracle.

Conventions for oracle comparability:
* every computed column is aliased identically on both sides,
* counts/ranks are cast to BIGINT on both sides,
* float aggregates are rounded to whole units or 4 decimals so the
  value hash is stable across engines,
* no timestamp output columns (epoch seconds as BIGINT instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        # Within-module duplicate guard: dict assignment is silently
        # last-wins, so a re-used name would overwrite an existing
        # query (and its oracle) without any error — the cross-module
        # guard in __init__ can't see it. Raise at import time.
        if name in QUERIES:
            raise ValueError(f"duplicate query name in module: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- W1: stable ordering per key (reference SequentialSampler order,
# classification/predict.py:27-28) -----------------------------------------


@_q(
    "w1_stable_turn_order",
    """
    SELECT user_id, event_id, rn FROM (
      SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events) t
    WHERE rn <= 3
    """,
)
def w1_stable_turn_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "rn")
    )


# --- W2: sessionization — the SQL shape of the span-decode stateful
# scan (SURVEY §2.5 W2: lag + running-sum segment ids) ----------------------


@_q(
    "w2_sessionize",
    """
    WITH g AS (
      SELECT user_id, event_id, epoch(ts) AS sec,
             CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w > 1800
                  THEN 1 ELSE 0 END AS gap
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, event_id,
             sum(gap) OVER (PARTITION BY user_id ORDER BY sec, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_id
      FROM g)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           min(event_id) AS first_event
    FROM s GROUP BY user_id, session_id
    """,
)
def w2_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "sec", F.unix_timestamp("ts")
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    gap = F.when(
        F.col("sec") - F.lag("sec").over(w) > 1800, F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy("user_id").orderBy("sec", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        ev.withColumn("gap", gap)
        .withColumn("session_id", F.sum("gap").over(run).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event"),
        )
    )


# --- W3: top-k per group (fallback top-10 pattern,
# prepare_data_for_labeling_infer.py:23-33) ---------------------------------


@_q(
    "w3_topk_per_group",
    """
    SELECT o_custkey, o_orderkey, rn FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def w3_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    )


# --- J1: broadcast dimension join (schema-dim lookup,
# produce_submit_json_file.py:275) ------------------------------------------


@_q(
    "j1_broadcast_dim_join",
    """
    SELECT p.p_brand,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(round(sum(l.l_quantity)) AS BIGINT) AS total_qty,
           CAST(round(sum(l.l_extendedprice * (1 - l.l_discount))) AS BIGINT)
             AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def j1_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_quantity")).cast("long").alias("total_qty"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            )
            .cast("long")
            .alias("revenue"),
        )
    )


# --- J4: semi/anti join (golden ⋈ predicted membership,
# calc_pr.py:199-207) --------------------------------------------------------


@_q(
    "j4_semi_join",
    """
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def j4_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@_q(
    "j4_anti_join",
    """
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def j4_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


# --- J6: within-group cartesian pairing (subjects × objects,
# produce_submit_json_file.py:284-288) ---------------------------------------


@_q(
    "j6_cartesian_pairs",
    """
    SELECT a.l_orderkey AS orderkey, a.l_linenumber AS ln1,
           b.l_linenumber AS ln2
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
    """,
)
def j6_cartesian_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    a = li.alias("a")
    b = li.alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") < F.col("b.l_linenumber")),
    ).select(
        F.col("a.l_orderkey").alias("orderkey"),
        F.col("a.l_linenumber").alias("ln1"),
        F.col("b.l_linenumber").alias("ln2"),
    )


# --- J7/A7: group-collect (output_dict grouping,
# produce_submit_json_file.py:283-288) ---------------------------------------


@_q(
    "j7_groupby_collect",
    """
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids
    FROM documents GROUP BY lang
    """,
)
def j7_groupby_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("doc_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("doc_ids"),
    )


# --- A1: micro P/R/F1 aggregation (calc_pr.py:198-217) ----------------------


@_q(
    "a1_micro_prf1",
    """
    WITH flags AS (
      SELECT CASE WHEN value > 50 THEN 1 ELSE 0 END AS pred,
             CASE WHEN event_type IN ('click', 'purchase') THEN 1 ELSE 0 END
               AS gold
      FROM events
    ), sums AS (
      SELECT CAST(sum(pred * gold) AS BIGINT) AS correct_sum,
             CAST(sum(pred) AS BIGINT) AS predict_sum,
             CAST(sum(gold) AS BIGINT) AS recall_sum
      FROM flags)
    SELECT correct_sum, predict_sum, recall_sum,
           round(correct_sum * 1.0 / predict_sum, 4) AS precision_,
           round(correct_sum * 1.0 / recall_sum, 4) AS recall_,
           round(2.0 * (correct_sum * 1.0 / predict_sum)
                     * (correct_sum * 1.0 / recall_sum)
                 / ((correct_sum * 1.0 / predict_sum)
                    + (correct_sum * 1.0 / recall_sum)), 4) AS f1
    FROM sums
    """,
)
def a1_micro_prf1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    flags = ev.select(
        F.when(F.col("value") > 50, 1).otherwise(0).alias("pred"),
        F.when(F.col("event_type").isin("click", "purchase"), 1)
        .otherwise(0)
        .alias("gold"),
    )
    sums = flags.agg(
        F.sum(F.col("pred") * F.col("gold")).cast("long").alias("correct_sum"),
        F.sum("pred").cast("long").alias("predict_sum"),
        F.sum("gold").cast("long").alias("recall_sum"),
    )
    p = F.col("correct_sum") * 1.0 / F.col("predict_sum")
    r = F.col("correct_sum") * 1.0 / F.col("recall_sum")
    return sums.select(
        "correct_sum",
        "predict_sum",
        "recall_sum",
        F.round(p, 4).alias("precision_"),
        F.round(r, 4).alias("recall_"),
        F.round(2.0 * p * r / (p + r), 4).alias("f1"),
    )


# --- A1+J4+J5: the FULL official evaluation (operators/evaluation.
# calc_pr — normalization, alias expansion with the identity member,
# semi-join correctness, micro P/R/F1) driver-visible with a value
# oracle. Gold/pred/alias are deterministic transforms of the
# documents table chosen so every rule fires somewhere: book-name
# wrap (《》 strip), subject matched via alias, object matched via
# alias while the subject matches DIRECTLY despite having aliases
# (the identity-member rule — the r03 ADVICE miss), and outright
# wrong objects. The oracle recomputes the match set analytically
# (post-normalization values derived by construction) and must agree
# on all six aggregate outputs.

_ALIAS_EVAL_ORACLE = """
WITH d AS (
  SELECT doc_id,
         lower(string_split(text, ' ')[1]) AS w1,
         lower(string_split(text, ' ')[2]) AS w2
  FROM documents
  WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 2
    AND string_split(text, ' ')[1] <> '' AND string_split(text, ' ')[2] <> ''
), gold AS (
  SELECT 'd' || doc_id AS key,
         CASE WHEN doc_id % 2 = 0 THEN 'g_' || w1 ELSE w1 END AS s,
         'p' || (doc_id % 3) AS p,
         CASE WHEN doc_id % 3 = 0 THEN 'o_' || w2 ELSE w2 END AS o
  FROM d
), pred AS (
  SELECT 'd' || doc_id AS key, w1 AS s, 'p' || (doc_id % 3) AS p,
         CASE WHEN doc_id % 5 = 0 THEN w2 || '_wrong' ELSE w2 END AS o
  FROM d
), amap AS (
  SELECT DISTINCT w1 AS k, 'g_' || w1 AS a FROM d WHERE doc_id % 2 = 0
  UNION
  SELECT DISTINCT w2 AS k, 'o_' || w2 AS a FROM d WHERE doc_id % 3 = 0
), amap_id AS (
  SELECT k, a FROM amap UNION SELECT DISTINCT k, k FROM amap
), matched AS (
  SELECT DISTINCT p.key, p.s, p.p, p.o
  FROM pred p
  JOIN gold g ON g.key = p.key AND g.p = p.p
  LEFT JOIN amap_id ms ON ms.k = p.s
  LEFT JOIN amap_id mo ON mo.k = p.o
  WHERE coalesce(ms.a, p.s) = g.s AND coalesce(mo.a, p.o) = g.o
), sums AS (
  SELECT (SELECT count(*) FROM matched) AS c,
         (SELECT count(*) FROM pred) AS pn,
         (SELECT count(*) FROM gold) AS rn
)
SELECT CAST(c AS DOUBLE) AS correct_sum,
       CAST(pn AS DOUBLE) AS predict_sum,
       CAST(rn AS DOUBLE) AS recall_sum,
       round(c * 1.0 / pn, 4) AS precision_,
       round(c * 1.0 / rn, 4) AS recall_,
       CASE WHEN c = 0 THEN 0.0
            ELSE round(2.0 * (c * 1.0 / pn) * (c * 1.0 / rn)
                       / ((c * 1.0 / pn) + (c * 1.0 / rn)), 4)
       END AS f1
FROM sums
"""


@_q("a1_alias_eval", _ALIAS_EVAL_ORACLE)
def a1_alias_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from information_extraction_spark.operators.evaluation import calc_pr

    ws = F.split("text", " ")
    base = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.size(ws) >= 2))
        .select(
            "doc_id",
            F.lower(ws.getItem(0)).alias("w1"),
            F.lower(ws.getItem(1)).alias("w2"),
        )
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    key = F.concat(F.lit("d"), F.col("doc_id")).alias("key")
    pnum = F.concat(F.lit("p"), (F.col("doc_id") % 3)).alias("predicate")
    # Gold carries RAW shapes (book-name wrap); calc_pr must normalize.
    gold = base.select(
        key,
        F.when(
            F.col("doc_id") % 2 == 0, F.concat(F.lit("g_"), "w1")
        ).otherwise(F.col("w1")).alias("subject"),
        pnum,
        F.when(
            F.col("doc_id") % 3 == 0, F.concat(F.lit("o_"), "w2")
        ).otherwise(F.concat(F.lit("《"), "w2", F.lit("》"))).alias("object"),
    )
    pred = base.select(
        key,
        F.col("w1").alias("subject"),
        pnum,
        F.when(
            F.col("doc_id") % 5 == 0, F.concat("w2", F.lit("_wrong"))
        ).otherwise(F.col("w2")).alias("object"),
    )
    alias_df = (
        base.filter(F.col("doc_id") % 2 == 0)
        .select(
            F.col("w1").alias("canonical"),
            F.concat(F.lit("g_"), "w1").alias("alias"),
        )
        .unionByName(
            base.filter(F.col("doc_id") % 3 == 0).select(
                F.col("w2").alias("canonical"),
                F.concat(F.lit("o_"), "w2").alias("alias"),
            )
        )
        .dropDuplicates()
    )
    return calc_pr(pred, gold, alias_df=alias_df, key="key").select(
        "correct_sum",
        "predict_sum",
        "recall_sum",
        F.col("precision").alias("precision_"),
        F.col("recall").alias("recall_"),
        "f1",
    )


# --- A4: label-set exact/subset/superset accuracy
# (evaluate_classifiction.py:53-73) ------------------------------------------


@_q(
    "a4_set_relations",
    """
    WITH per_doc AS (
      SELECT doc_id,
             count(DISTINCT CASE WHEN length(w) >= 5 THEN w END) AS np,
             count(DISTINCT CASE WHEN w LIKE '%a%' THEN w END) AS ng,
             count(DISTINCT CASE WHEN length(w) >= 5 AND w LIKE '%a%'
                            THEN w END) AS ni
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents) t
      GROUP BY doc_id)
    SELECT CAST(sum(CASE WHEN np = ng AND ni = np THEN 1 ELSE 0 END) AS BIGINT)
             AS exact_count,
           CAST(sum(CASE WHEN ni = np THEN 1 ELSE 0 END) AS BIGINT)
             AS subset_count,
           CAST(sum(CASE WHEN ni = ng THEN 1 ELSE 0 END) AS BIGINT)
             AS superset_count
    FROM per_doc
    """,
)
def a4_set_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    per_doc = words.groupBy("doc_id").agg(
        F.countDistinct(F.when(F.length("w") >= 5, F.col("w"))).alias("np"),
        F.countDistinct(F.when(F.col("w").contains("a"), F.col("w"))).alias(
            "ng"
        ),
        F.countDistinct(
            F.when((F.length("w") >= 5) & F.col("w").contains("a"), F.col("w"))
        ).alias("ni"),
    )
    eq = (F.col("np") == F.col("ng")) & (F.col("ni") == F.col("np"))
    return per_doc.agg(
        F.sum(F.when(eq, 1).otherwise(0)).cast("long").alias("exact_count"),
        F.sum(F.when(F.col("ni") == F.col("np"), 1).otherwise(0))
        .cast("long")
        .alias("subset_count"),
        F.sum(F.when(F.col("ni") == F.col("ng"), 1).otherwise(0))
        .cast("long")
        .alias("superset_count"),
    )


# --- A5: exact dedup (set-dedup per sentence, calc_pr.py:73-85) -------------


@_q(
    "a5_dedup_exact",
    """
    SELECT md5(text) AS fingerprint, CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS first_doc
    FROM documents GROUP BY md5(text)
    """,
)
def a5_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("fingerprint")).agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc")
    )


# --- A8: histogram stats (spo_count.py:10-24) --------------------------------


@_q(
    "a8_histogram",
    """
    SELECT CAST(floor(n_chars / 50) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM documents GROUP BY 1
    """,
)
def a8_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(
        F.floor(F.col("n_chars") / 50).cast("long").alias("bucket")
    ).agg(F.count("*").alias("n"))


# --- A9: threshold sweep over a cached relation (prob2score.py:93-99) --------


@_q(
    "a9_threshold_sweep",
    """
    SELECT t.threshold,
           CAST(sum(CASE WHEN e.value > t.threshold THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pred,
           round(sum(CASE WHEN e.value > t.threshold
                          AND e.event_type IN ('click', 'purchase')
                     THEN 1 ELSE 0 END) * 1.0
                 / sum(CASE WHEN e.value > t.threshold THEN 1 ELSE 0 END), 4)
             AS precision_
    FROM events e
    CROSS JOIN (SELECT CAST(unnest([40.0, 45.0, 50.0, 55.0, 60.0]) AS DOUBLE)
                  AS threshold) t
    GROUP BY t.threshold
    """,
)
def a9_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    # No cache: the broadcast cross-join scans events exactly once in
    # this single-action query (a cache would never be reused and was
    # leaked — VERDICT r01 hygiene note).
    ev = _t(spark, sf_dir, "events")
    thresholds = spark.createDataFrame(
        [(t,) for t in (40.0, 45.0, 50.0, 55.0, 60.0)], "threshold double"
    )
    joined = ev.crossJoin(F.broadcast(thresholds))
    pred = F.when(F.col("value") > F.col("threshold"), 1).otherwise(0)
    correct = F.when(
        (F.col("value") > F.col("threshold"))
        & F.col("event_type").isin("click", "purchase"),
        1,
    ).otherwise(0)
    # NULL-safe precision: a threshold with zero predictions is 0/0 —
    # NaN in Spark but NULL in DuckDB. Emit NULL explicitly so the row
    # is retained AND both engines agree (a9_best_threshold instead
    # EXCLUDES such thresholds, because NaN sorts first under desc and
    # would win its argmax).
    return joined.groupBy("threshold").agg(
        F.sum(pred).cast("long").alias("n_pred"),
        F.when(
            F.sum(pred) > 0,
            F.round(F.sum(correct) * 1.0 / F.sum(pred), 4),
        ).alias("precision_"),
    )


# --- A9b: best-threshold selection — the sweep's argmax, the
# reference's `score > best_score` loop (prob2score.py:93-102, which
# sweeps 0.46-0.56 and keeps the best-F1 threshold). Deterministic
# tie-break: lowest threshold wins (strict > in the reference keeps
# the FIRST best of an ascending sweep — same rule). Ordering is on
# the UNROUNDED metric (exact int counts divided once), so both
# engines agree on ties.


@_q(
    "a9_best_threshold",
    """
    WITH sweep AS (
      SELECT t.threshold,
             sum(CASE WHEN e.value > t.threshold THEN 1 ELSE 0 END)
               AS n_pred,
             sum(CASE WHEN e.value > t.threshold
                      AND e.event_type IN ('click', 'purchase')
                 THEN 1 ELSE 0 END) AS n_correct
      FROM events e
      CROSS JOIN (SELECT CAST(unnest([40.0, 45.0, 50.0, 55.0, 60.0])
                              AS DOUBLE) AS threshold) t
      GROUP BY t.threshold
      HAVING sum(CASE WHEN e.value > t.threshold THEN 1 ELSE 0 END) > 0
    )
    SELECT threshold,
           round(n_correct * 1.0 / n_pred, 4) AS best_precision
    FROM sweep
    ORDER BY n_correct * 1.0 / n_pred DESC, threshold
    LIMIT 1
    """,
)
def a9_best_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    thresholds = spark.createDataFrame(
        [(t,) for t in (40.0, 45.0, 50.0, 55.0, 60.0)], "threshold double"
    )
    joined = ev.crossJoin(F.broadcast(thresholds))
    pred = F.when(F.col("value") > F.col("threshold"), 1).otherwise(0)
    correct = F.when(
        (F.col("value") > F.col("threshold"))
        & F.col("event_type").isin("click", "purchase"),
        1,
    ).otherwise(0)
    sweep = joined.groupBy("threshold").agg(
        F.sum(correct).alias("_n_correct"), F.sum(pred).alias("_n_pred")
    )
    # Thresholds with zero predictions are excluded on BOTH sides
    # (HAVING n_pred > 0 in the oracle): Spark's 0/0 double is NaN,
    # which sorts FIRST under desc and would pick the degenerate
    # threshold, while DuckDB yields NULL (sorted last).
    sweep = sweep.filter(F.col("_n_pred") > 0).select(
        "threshold",
        (F.col("_n_correct") * 1.0 / F.col("_n_pred")).alias("_prec"),
    )
    # 5-row relation: orderBy().limit(1) is TakeOrderedAndProject —
    # the argmax never funnels the sweep through a global window.
    return (
        sweep.orderBy(F.col("_prec").desc(), "threshold")
        .limit(1)
        .select("threshold", F.round("_prec", 4).alias("best_precision"))
    )


# --- P13/P14: normalization (del_bookname + lowercase,
# calc_pr.py:41-45,82-83) ------------------------------------------------------


@_q(
    "p13_normalize",
    """
    WITH wrapped AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN '《' || upper(text) || '》'
                  ELSE upper(text) END AS raw
      FROM documents)
    SELECT doc_id,
           CASE WHEN lower(raw) LIKE '《%》' AND length(raw) >= 2
                THEN substring(lower(raw), 2, length(raw) - 2)
                ELSE lower(raw) END AS normalized
    FROM wrapped
    """,
)
def p13_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from information_extraction_spark.operators.evaluation import (
        normalize_entity,
    )

    d = _t(spark, sf_dir, "documents")
    raw = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.lit("《"), F.upper("text"), F.lit("》")),
    ).otherwise(F.upper("text"))
    return d.select(
        "doc_id", normalize_entity(raw).alias("normalized")
    )
