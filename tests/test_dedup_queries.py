"""Adversarial checks for the blocked/salted dedup queries: the
driver's DuckDB oracle runs them on the fixed test corpus only, so
these tests pit the scale-shaped implementations (banded salted
MinHash-LSH, length-band-blocked Jaccard) against brute-force Spark
implementations of the same definitions on corpora crafted to hit the
edges — empty text, sub-shingle-length docs, exact duplicates, case
variants, and pairs sitting exactly on the 20-char length window.
"""

from __future__ import annotations

import os
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from information_extraction_spark.driver_queries.textdata import (
    dd_minhash_lsh,
    dd_ngram_jaccard,
)


def _adversarial_docs() -> pd.DataFrame:
    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "delta", "ion", "muon", "tau"]
    rows = []
    # Random docs, several near-identical clusters, case variants.
    for i in range(120):
        n = rng.randint(1, 12)
        text = " ".join(rng.choice(words) for _ in range(n))
        rows.append(text)
    base = " ".join(words)
    rows += [base] * 5  # exact duplicates
    rows += [base.upper(), base.title()]  # case variants
    rows += ["", "ab", "abcd", "abcde"]  # empty / below shingle width
    # Pairs exactly at the ±20 n_chars boundary of the Jaccard window.
    rows += ["x" * 30, "x" * 50, "x" * 51]
    return pd.DataFrame(
        {
            "doc_id": range(len(rows)),
            "text": rows,
            "lang": [("en" if i % 3 else "de") for i in range(len(rows))],
            "source": ["t"] * len(rows),
            "n_chars": [len(t) for t in rows],
        }
    )


@pytest.fixture(scope="module")
def adv_sf_dir(spark, tmp_dir):
    d = os.path.join(tmp_dir, "adv_sf")
    pdf = _adversarial_docs()
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def test_minhash_lsh_matches_bruteforce_or_join(spark, adv_sf_dir):
    """The banded + salted equi-join must emit exactly the pairs the
    definitional OR-of-band-keys join emits, exactly once each."""
    docs = spark.read.parquet(f"{adv_sf_dir}/documents.parquet")
    positions = F.when(
        F.length("text") >= 5, F.sequence(F.lit(1), F.length("text") - 4)
    ).otherwise(F.array().cast("array<int>"))
    sh = (
        docs.withColumn("pos", F.explode(positions))
        .select("doc_id", F.expr("substring(text, pos, 5)").alias("shingle"))
        .dropDuplicates(["doc_id", "shingle"])
    )

    def mh(i):
        return F.min(F.md5(F.concat("shingle", F.lit(f"#{i}"))))

    sig = sh.groupBy("doc_id").agg(
        F.concat(mh(1), mh(2)).alias("k1"), F.concat(mh(3), mh(4)).alias("k2")
    )
    a, b = sig.alias("a"), sig.alias("b")
    brute = (
        a.join(
            b,
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                (F.col("a.k1") == F.col("b.k1"))
                | (F.col("a.k2") == F.col("b.k2"))
            ),
        )
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .collect()
    )
    got = dd_minhash_lsh(spark, adv_sf_dir).collect()
    brute_set = {(r.da, r.db) for r in brute}
    got_list = [(r.da, r.db) for r in got]
    assert set(got_list) == brute_set
    # Exactly once per pair (first-band-wins dedup, no distinct).
    assert len(got_list) == len(brute_set)
    # The exact-duplicate cluster must be fully paired.
    dup_ids = list(range(120, 125))
    for i in dup_ids:
        for j in dup_ids:
            if i < j:
                assert (i, j) in brute_set


def test_ngram_jaccard_matches_unblocked_join(spark, adv_sf_dir):
    """Length-band blocking must be lossless vs the unblocked
    definitional join, including pairs exactly 20 chars apart."""
    docs = spark.read.parquet(f"{adv_sf_dir}/documents.parquet").select(
        "doc_id",
        "lang",
        "n_chars",
        F.array_distinct(F.split("text", " ")).alias("ws"),
    )
    docs = docs.withColumn("nw", F.size("ws"))
    a, b = docs.alias("a"), docs.alias("b")
    size_ratio = (
        F.least(F.col("a.nw"), F.col("b.nw"))
        * 1.0
        / F.greatest(F.col("a.nw"), F.col("b.nw"))
    )
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (F.abs(F.col("a.n_chars") - F.col("b.n_chars")) <= 20)
        & (size_ratio >= 0.8),
    ).select(
        F.col("a.doc_id").alias("da"),
        F.col("b.doc_id").alias("db"),
        F.size(F.array_intersect("a.ws", "b.ws")).alias("i"),
        F.col("a.nw").alias("na"),
        F.col("b.nw").alias("nb"),
    )
    jac = F.col("i") * 1.0 / (F.col("na") + F.col("nb") - F.col("i"))
    brute = {
        (r.da, r.db)
        for r in pairs.filter(jac >= 0.8).select("da", "db").collect()
    }
    got = [(r.da, r.db) for r in dd_ngram_jaccard(spark, adv_sf_dir).collect()]
    assert set(got) == brute
    assert len(got) == len(brute)


def _scan_metrics(df):
    """SQL metrics of the first leaf scan of an EXECUTED DataFrame
    (collect the same instance first — count() builds its own plan)."""
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    m = leaves.apply(0).metrics()
    vals = {}
    it = m.iterator()
    while it.hasNext():
        kv = it.next()
        vals[kv._1()] = kv._2().value()
    return vals


def test_ivf_index_probe_partition_prunes(spark):
    """The IVF write-time partitioning story, made physical: the
    cid-partitioned index's probe scan must read ONLY the nprobe=2
    probed partitions (scan metric numPartitions == 2, vs all lists
    for an unfiltered read), with the cid filter showing up as a
    PartitionFilter at the source — and pruning must not change a
    single result row vs the broadcast-rescore variant."""
    from pyspark.sql import functions as F

    from information_extraction_spark.driver_queries.textdata import (
        ann_ivf_probe,
        ann_ivf_pruned_probe,
        ivf_index_path,
        write_ivf_index,
    )

    sf = "/root/testdata/sf0.001"
    got = [tuple(r) for r in ann_ivf_pruned_probe(spark, sf).collect()]
    base = [tuple(r) for r in ann_ivf_probe(spark, sf).collect()]
    assert got == base and len(got) == 10

    path, _cent, probe = write_ivf_index(spark, sf)
    assert path == ivf_index_path(sf)
    import os as _os

    cid_dirs = [d for d in _os.listdir(path) if d.startswith("cid=")]
    assert len(cid_dirs) > len(probe) >= 2

    idx = spark.read.parquet(path)
    pruned = idx.filter(F.col("cid").isin([int(c) for c in probe]))
    pruned.collect()
    pm = _scan_metrics(pruned)
    assert pm["numPartitions"] == len(probe)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    scan_line = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    assert "cid" in scan_line.split("PartitionFilters")[1][:40]

    full = idx.filter(F.lit(True))
    full.collect()
    fm = _scan_metrics(full)
    assert fm["numPartitions"] == len(cid_dirs)
    assert pm["numFiles"] < fm["numFiles"]


def test_incremental_lsh_matches_bruteforce_and_is_broadcast(
    spark, adv_sf_dir
):
    """The batch-vs-persisted-index path must emit exactly the
    base×new pairs the definitional OR-of-band-keys join emits (once
    each), the probe plan must BROADCAST the batch side and feed the
    index scan straight into the join (no exchange on the base side),
    and the index build must be write-once."""
    import os as _os

    from information_extraction_spark.driver_queries.textdata import (
        dd_incremental_lsh,
        lsh_index_path,
        write_lsh_index,
    )

    docs = spark.read.parquet(f"{adv_sf_dir}/documents.parquet")
    positions = F.when(
        F.length("text") >= 5, F.sequence(F.lit(1), F.length("text") - 4)
    ).otherwise(F.array().cast("array<int>"))
    sh = (
        docs.withColumn("pos", F.explode(positions))
        .select("doc_id", F.expr("substring(text, pos, 5)").alias("shingle"))
        .dropDuplicates(["doc_id", "shingle"])
    )

    def mh(i):
        return F.min(F.md5(F.concat("shingle", F.lit(f"#{i}"))))

    sig = sh.groupBy("doc_id").agg(
        F.concat(mh(1), mh(2)).alias("k1"), F.concat(mh(3), mh(4)).alias("k2")
    )
    a, b = sig.alias("a"), sig.alias("b")
    brute = {
        (r.da, r.db)
        for r in a.join(
            b,
            (F.col("a.doc_id") % 7 != 0)
            & (F.col("b.doc_id") % 7 == 0)
            & (
                (F.col("a.k1") == F.col("b.k1"))
                | (F.col("a.k2") == F.col("b.k2"))
            ),
        )
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .collect()
    }
    q = dd_incremental_lsh(spark, adv_sf_dir)
    got = [(r.da, r.db) for r in q.collect()]
    assert set(got) == brute
    assert len(got) == len(brute)  # first-band-wins: once per pair
    assert brute  # the corpus must actually exercise the path
    # Disjoint sides: every da is base, every db is new.
    assert all(da % 7 != 0 and db % 7 == 0 for da, db in got)

    # AQE's toString carries both Final and Initial sections; judge
    # the final plan only.
    plan = (
        q._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "BroadcastHashJoin" in plan
    # The index side reaches the join without any shuffle: the only
    # exchanges in the whole plan are the batch side's broadcast and
    # the batch-spread repartition.
    import re

    n_exchanges = len(re.findall(r"(?<!Broadcast)Exchange", plan))
    assert "BroadcastExchange" in plan and n_exchanges <= 1

    # Write-once: a second build call must reuse the committed index.
    path = lsh_index_path(adv_sf_dir)
    mtime = _os.path.getmtime(path + ".meta.json")
    assert write_lsh_index(spark, adv_sf_dir) == path
    assert _os.path.getmtime(path + ".meta.json") == mtime


def test_containment_matches_bruteforce_and_direction(spark, tmp_dir):
    """dd_containment's prefix-filtered plan vs a brute-force all-
    pairs Spark computation of the same definition on a corpus with a
    genuine sub-document inclusion; also pins the direction rule (the
    SMALLER set is the contained side; ties break by doc_id)."""
    from information_extraction_spark.driver_queries.textdata import (
        dd_containment,
    )

    big = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        # doc 0: a slice of doc 3 -> containment(0 -> 3) high.
        (0, big[:30]),
        (3, big),
        # unrelated doc.
        (6, "xx yy zz qq ww ee rr tt uu ii oo pp"),
        # exact duplicate of doc 0 (equal sizes: tie -> da < db).
        (9, big[:30]),
        # below shingle width: contributes no shingles, must not crash.
        (12, "abc"),
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": ["t"] * len(rows),
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    d = os.path.join(tmp_dir, "contain_sf")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got = {
        (r["da"], r["db"]): (r["na"], r["nb"], r["i"], r["cont_ppm"])
        for r in dd_containment(spark, d).collect()
    }
    # Brute force the same definition in Python.
    sh = {
        i: {t[k: k + 5] for k in range(len(t) - 4)}
        for i, t in rows
        if len(t) >= 5 and i % 3 == 0
    }
    want = {}
    for a in sh:
        for b in sh:
            if a == b:
                continue
            na, nb = len(sh[a]), len(sh[b])
            if not (na < nb or (na == nb and a < b)):
                continue
            i = len(sh[a] & sh[b])
            if 5 * i >= 3 * na:
                want[(a, b)] = (na, nb, i, (i * 1000000) // na)
    assert got == want
    assert (0, 3) in got        # the inclusion pair survives
    assert (0, 9) in got        # equal-size exact dup, da < db


def test_dup_spans_islands_merge_and_boundaries(spark, tmp_dir):
    """Two docs share a 10-word verbatim passage (3 consecutive dup
    8-grams -> ONE span of 10 words); a unique doc emits nothing; two
    separated shared passages in one doc stay TWO islands."""
    from information_extraction_spark.driver_queries.textdata import (
        dd_dup_spans,
    )

    shared = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"           # 10 words
    shared2 = "z1 z2 z3 z4 z5 z6 z7 z8"                 # exactly 8
    rows = [
        # doc 0: shared at positions 1..10, then unique filler, then
        # shared2 — two islands.
        (0, shared + " u1 u2 u3 u4 u5 " + shared2),
        # doc 1: shared embedded after 2 unique words.
        (1, "a1 a2 " + shared + " b1 b2"),
        # doc 2: carries shared2 only.
        (2, "c1 " + shared2 + " c2 c3 c4 c5 c6 c7"),
        # doc 3: fully unique, long enough to emit grams.
        (3, " ".join(f"q{i}" for i in range(12))),
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": ["t"] * len(rows),
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    d = os.path.join(tmp_dir, "dupspans_sf")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got = {
        (r["doc_id"], r["start_pos"]): (
            r["end_pos"], r["n_grams"], r["span_words"]
        )
        for r in dd_dup_spans(spark, d).collect()
    }
    # doc 0: shared -> grams at pos 1..3 (10 words = 3 dup 8-grams);
    # shared2 starts at word 16 -> single gram at pos 16.
    assert got[(0, 1)] == (3, 3, 10)
    assert got[(0, 16)] == (16, 1, 8)
    # doc 1: shared starts at word 3 -> dup grams at pos 3..5.
    assert got[(1, 3)] == (5, 3, 10)
    # doc 2: shared2 at word 2 -> one gram at pos 2.
    assert got[(2, 2)] == (2, 1, 8)
    # no spans for doc 3, and no extras anywhere.
    assert len(got) == 4


def test_edit_distance_threshold_blocking_and_band_boundary(spark, tmp_dir):
    """Hand-built corpus pinning: exact distance values, the <=20
    inclusion boundary, 21-edit exclusion, cross-band pairs (lengths
    19 vs 39 share no bucket but bucket±1 probing finds them), and
    cross-lang silence."""
    from information_extraction_spark.driver_queries.textdata import (
        dd_edit_distance,
    )

    base = "the quick brown fox jumps over the lazy dog tonight"  # 52
    rows = [
        (0, base, "en"),
        (1, base[:-1] + "s", "en"),                 # 1 substitution
        (2, base + "XXXXXXXXXXXXXXXXXXXX", "en"),   # +20 appended
        (3, base + "Y" * 21, "en"),                 # 21 edits: excluded
        (4, base, "de"),                            # other lang: silent
        # band boundary: 19 chars (bucket 0) vs 39 chars (bucket 1),
        # distance exactly 20 — found only via the ±1 bucket probe.
        (5, "a" * 19, "en"),
        (6, "a" * 39, "en"),
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": ["t"] * len(rows),
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    d = os.path.join(tmp_dir, "editdist_sf")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got = {
        (r["da"], r["db"]): r["dist"]
        for r in dd_edit_distance(spark, d).collect()
    }
    assert got[(0, 1)] == 1
    assert got[(0, 2)] == 20
    assert got[(5, 6)] == 20
    # doc 1 vs 2: substitution undone + 20 appends = 21 -> excluded?
    # No: 1->2 is base[:-1]+"s" vs base+20X: distance 1 (restore 't')
    # + 20 inserts = 21 -> must be absent.
    assert (1, 2) not in got
    assert (0, 3) not in got           # 21 edits
    assert all(da != 4 and db != 4 for (da, db) in got)  # lang block
    assert set(got) == {(0, 1), (0, 2), (5, 6)}


def test_nn_descent_improves_init_and_ranks_densely(spark):
    """NN-Descent output invariants: (1) the refinement discovers
    edges absent from the init top-k (from_init=0 rows exist — a
    single-blocking init is closed under the local join and would
    make this empty, the measured pitfall in the block comment);
    (2) per-node ranks are dense 1..min(k, candidates) with
    similarities non-increasing; (3) every vector keeps a neighbor
    list."""
    from collections import defaultdict

    from information_extraction_spark.driver_queries.textdata import (
        emb_nn_descent,
    )

    sf = "/root/testdata/sf0.001"
    rows = emb_nn_descent(spark, sf).collect()
    by_src = defaultdict(list)
    for r in rows:
        by_src[r.src].append(r)
    assert len(by_src) == 500
    new_edges = 0
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 4
        # final top-k over a candidate superset: sims sorted desc
        sims = [r.cos4 for r in rs]
        assert sims == sorted(sims, reverse=True)
        new_edges += sum(1 for r in rs if r.from_init == 0)
    assert new_edges > 0  # the round actually improved the init


def test_cdc_chunks_self_synchronize_after_edit(spark):
    """CDC's defining property: prepending an edit shifts only the
    chunks BEFORE the first post-edit boundary — the boundary rule
    depends on the last 8 chars alone, so the shared suffix cuts
    into identical chunks. Also pins the short-text (< window) and
    tail-chunk rules."""
    from information_extraction_spark.driver_queries.textdata import (
        cdc_chunks,
    )

    import random

    # A periodic text can legitimately produce zero boundaries (only
    # ~period distinct windows exist); use a varied seeded text that
    # is known to cut into 3 chunks.
    rng = random.Random(11)
    words = [
        "alpha", "beta", "gamma", "delta", "epsilon",
        "zeta", "eta", "theta", "iota", "kappa",
    ]
    base = " ".join(rng.choice(words) for _ in range(80))
    edited = "zz zz " + base
    df = spark.createDataFrame(
        [(1, base), (2, edited), (3, "tiny")], "doc_id long, text string"
    )
    rows = cdc_chunks(df).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.chunk)
    # chunks reassemble the text exactly (no gaps, no overlaps)
    assert "".join(by_doc[1]) == base
    assert "".join(by_doc[2]) == edited
    # short text below the hash window -> one whole-text chunk
    assert by_doc[3] == ["tiny"]
    # self-synchronization: all but the first edited chunk coincide
    # with base chunks (the edit is absorbed by the first boundary)
    shared = set(by_doc[1]) & set(by_doc[2])
    assert len(shared) >= len(by_doc[1]) - 1 > 0
