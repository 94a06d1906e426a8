"""Entity linking & canonicalization (north rule: "entity linking and
canonicalization with a salted broadcast/hash-join alias dictionary
plus connected-components merge").

The reference's alias dictionary is only consulted at evaluation time
(calc_pr.py:141-161); our engine promotes it to a first-class linking
stage: alias rows form an undirected surface-form graph, hash-min
connected components assign every surface form a canonical id (the
lexicographically smallest member of its component — covering chains
a→b→c the flat dict cannot), and triples are canonicalized through a
broadcast join on both endpoints.

Scale: the alias dim is broadcast (no shuffle on the skewed fact
side); the CC loop shuffles only the node/edge tables (tiny vs the
fact table) and cuts lineage with localCheckpoint per iteration.
Iterations are bounded by the graph diameter, which for alias chains
is small; ``max_iter`` guards pathological inputs. If the alias dim
ever outgrows broadcast range, functions.skew.salted_join is the
drop-in replacement for the two endpoint joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from information_extraction_spark.operators.evaluation import normalize_entity


def alias_edges(alias_df: DataFrame) -> DataFrame:
    """Undirected edges from (canonical, alias) rows, lowercased."""
    return (
        alias_df.select(
            F.lower("canonical").alias("src"), F.lower("alias").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates()
    )


def connected_components(
    edges: DataFrame, max_iter: int = 25, driver_threshold: int = 100_000
) -> DataFrame:
    """Connected components: every node labeled with the minimum node
    id in its component. Returns (node, component).

    Size-dispatched: an edge list at or under ``driver_threshold``
    (the alias dictionary is a broadcast-scale dim by definition)
    runs union-find on the driver — the distributed loop costs ~2
    Spark jobs per iteration, pure latency for a graph that fits in
    one list. Larger graphs take the hash-min DataFrame loop with
    localCheckpoint per iteration to cut lineage (SURVEY §4: the one
    genuinely custom iterative operator — no GraphFrames in this
    environment). Both paths produce identical labels (tested).
    """
    # Null endpoints can never link anything (the distributed path's
    # join keys would simply not match) — drop them up front so the
    # driver path agrees and never trips over None ordering.
    edges = edges.filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    # ONE bounded probe job decides the dispatch AND supplies the
    # driver-path rows. A count-then-collect split would evaluate the
    # (possibly expensive) edges plan twice, and on nondeterministic
    # lineage the second evaluation could exceed what the count
    # promised — unbounding the collect. The cost of this shape is
    # holding ≤ threshold+1 short tuples (a few MB) briefly on the
    # driver even when the graph turns out large; that is cheaper and
    # safer than re-evaluating the plan.
    probe = edges.select("src", "dst").limit(driver_threshold + 1).collect()
    if len(probe) <= driver_threshold:
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        edge_rows = probe
        for r in edge_rows:
            # Union-by-min: the larger root links under the smaller,
            # so each component's minimum stays a root and find()
            # yields exactly the hash-min label.
            a, b = find(r["src"]), find(r["dst"])
            if a != b:
                parent[max(a, b)] = min(a, b)
        nodes = {n for r in edge_rows for n in (r["src"], r["dst"])}
        rows = [(n, find(n)) for n in sorted(nodes)]
        return edges.sparkSession.createDataFrame(
            rows, "node string, component string"
        )

    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).dropDuplicates()
    nodes = sym.select(F.col("src").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node")).localCheckpoint()

    for _ in range(max_iter):
        neighbor_labels = sym.join(
            labels, sym.src == labels.node, "inner"
        ).select(F.col("dst").alias("node"), "component")
        proposals = labels.select("node", "component").unionByName(
            neighbor_labels
        )
        new_labels = proposals.groupBy("node").agg(
            F.min("component").alias("component")
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def canonical_mapping(
    alias_df: DataFrame, driver_threshold: int = 100_000
) -> DataFrame:
    """(surface, canonical_id): every surface form in the alias graph
    mapped to its component's minimum member. ``driver_threshold=0``
    forces the distributed hash-min loop (the shape a 100 TB alias
    graph runs)."""
    comps = connected_components(
        alias_edges(alias_df), driver_threshold=driver_threshold
    )
    return comps.select(
        F.col("node").alias("surface"), F.col("component").alias("canonical_id")
    )


def er_candidates(
    triples: DataFrame,
    tau: float = 0.5,
    max_slot_freq: int = 1000,
) -> DataFrame:
    """Entity-resolution candidate generation BEYOND the alias
    dictionary: subject pairs asserting many of the same (predicate,
    object) slots are duplicate-entity candidates (two surface forms
    of one real-world entity accumulate the same facts). Returns
    (s1, s2, shared, jaccard) with jaccard = |slots₁ ∩ slots₂| /
    |slots₁ ∪ slots₂| ≥ ``tau``, s1 < s2.

    Scale shape — the standard ER blocking pattern, never an
    all-pairs subject join:

    - Candidate pairs come from an equi-join on the (predicate,
      object) blocking key; per-key fan-out is C(f, 2) where f is the
      slot's subject count.
    - ``max_slot_freq`` drops stop-slots (a (p, o) shared by 100k
      subjects is both a quadratic blowup and zero evidence of
      identity — the same reason ER blocking drops high-frequency
      blocks and dd_ngram_jaccard blocks on fine keys).
    - The per-subject slot-count table joins back on the pair's
      endpoints: co-keyed shuffles on s1 / s2, both sides already
      collapsed to entity cardinality. Nothing broadcasts — entity
      tables are unbounded at 100 TB.
    - The two join branches read the same filtered slot table; the
      EXECUTED adaptive plan reuses its exchange (ReusedExchange
      nodes under AQE — verified on the live plan), so the distinct
      runs once.
    """
    slots = triples.select("subject", "predicate", "object").distinct()
    keep = (
        slots.groupBy("predicate", "object")
        .agg(F.count("*").alias("_f"))
        .filter(F.col("_f") <= max_slot_freq)
        .select("predicate", "object")
    )
    # Stop-slots leave the similarity universe entirely: they count
    # toward neither intersection nor union (they carry no identity
    # signal either way), so degrees come from the FILTERED table.
    blocked = slots.join(keep, ["predicate", "object"])
    deg = blocked.groupBy("subject").agg(
        F.count("*").cast("long").alias("_n")
    )
    a = blocked.select(F.col("subject").alias("s1"), "predicate", "object")
    b = blocked.select(F.col("subject").alias("s2"), "predicate", "object")
    pairs = (
        a.join(b, ["predicate", "object"])
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count("*").cast("long").alias("shared"))
    )
    d1 = deg.select(F.col("subject").alias("s1"), F.col("_n").alias("_n1"))
    d2 = deg.select(F.col("subject").alias("s2"), F.col("_n").alias("_n2"))
    return (
        pairs.join(d1, "s1")
        .join(d2, "s2")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared")
                / (F.col("_n1") + F.col("_n2") - F.col("shared")).cast(
                    "double"
                ),
                4,
            ),
        )
        .filter(F.col("jaccard") >= tau)
        .select("s1", "s2", "shared", "jaccard")
    )


def build_er_slot_index(
    triples: DataFrame, max_slot_freq: int = 1000
) -> tuple[DataFrame, DataFrame]:
    """Build the persistable ER slot index for ``er_probe``: the base
    corpus's distinct (subject, predicate, object) slots with the
    subject's slot count DENORMALIZED onto every row, plus the
    stop-key table ((p, o) keys above ``max_slot_freq``). Stop-slots
    are excluded from the index entirely — the cap is fixed at BUILD
    time from base-corpus statistics, which is what an ingest
    pipeline actually knows (future batches' frequencies don't exist
    yet). Returns (index, stop_keys).

    Scale shape: two map-side-combined aggregations ((p,o) freq and
    per-subject degree over the capped universe) plus the co-keyed
    degree join-back; runs once per index build, amortized over every
    arriving batch.
    """
    slots = triples.select("subject", "predicate", "object").distinct()
    freq = slots.groupBy("predicate", "object").agg(
        F.count("*").alias("_f")
    )
    stop = freq.filter(F.col("_f") > max_slot_freq).select(
        "predicate", "object"
    )
    kept = slots.join(stop, ["predicate", "object"], "left_anti")
    deg = kept.groupBy("subject").agg(
        F.count("*").cast("long").alias("subj_slots")
    )
    return kept.join(deg, "subject"), stop


def er_probe(
    index: DataFrame,
    stop_keys: DataFrame,
    new_triples: DataFrame,
    tau: float = 0.5,
) -> DataFrame:
    """Probe an arriving batch against a persisted ER slot index (the
    incremental counterpart of ``er_candidates`` — the shape a daily
    ingest runs: the 100 TB base graph is NEVER re-blocked; the batch
    is). Returns (s_base, s_new, shared, jaccard >= tau) candidate
    links between a known base entity and a batch entity; identity
    pairs (same surface on both sides) are excluded — exact-name
    matches resolve upstream, this operator exists for the non-equal
    surfaces.

    Scale shape mirrors dd_incremental_lsh: the batch's slot table
    and the (heavy-hitter-bounded) stop-key table BROADCAST; the
    index side is a plain parquet scan streamed past the in-memory
    maps — zero shuffle, zero sort on the indexed base. The pair
    aggregation keys on (s_base, s_new) — output bounded by batch
    size × slot fan-out (the build-time cap). Base degrees ride the
    index rows (no join against an entity-sized degree table at probe
    time); the batch-side degree join is batch-bounded.
    """
    new_slots = (
        new_triples.select("subject", "predicate", "object")
        .distinct()
        .join(F.broadcast(stop_keys), ["predicate", "object"], "left_anti")
    )
    nn = new_slots.groupBy("subject").agg(
        F.count("*").cast("long").alias("_nn")
    )
    pairs = (
        index.join(
            F.broadcast(
                new_slots.select(
                    F.col("subject").alias("s_new"), "predicate", "object"
                )
            ),
            ["predicate", "object"],
        )
        .filter(F.col("subject") != F.col("s_new"))
        .select(
            F.col("subject").alias("s_base"), "s_new", "subj_slots"
        )
        .groupBy("s_base", "s_new")
        .agg(
            F.count("*").cast("long").alias("shared"),
            F.max("subj_slots").alias("_nb"),
        )
    )
    return (
        pairs.join(
            nn.select(F.col("subject").alias("s_new"), "_nn"), "s_new"
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared")
                / (F.col("_nb") + F.col("_nn") - F.col("shared")).cast(
                    "double"
                ),
                4,
            ),
        )
        .filter(F.col("jaccard") >= tau)
        .select("s_base", "s_new", "shared", "jaccard")
    )


def apply_er_merge(
    triples: DataFrame,
    tau: float = 0.5,
    max_slot_freq: int = 1000,
) -> DataFrame:
    """APPLY the ER decisions: candidate pairs (``er_candidates``) →
    connected components → rewrite every merged subject to its
    component's minimum member → re-aggregate per-triple support.
    The stage between candidate generation and a deduplicated graph —
    er_candidates proposes, this merges. Returns (subject, predicate,
    object, support, n_convs, n_surfaces) where subject is canonical
    and n_surfaces counts the distinct raw surface forms folded into
    the row (n_surfaces > 1 marks rows the merge actually changed).

    Scale shape: the component label table is bounded by the entities
    appearing in an above-threshold candidate pair — a vanishing
    fraction of the entity universe (duplicates that also share ≥ tau
    of their slots), NOT entity-sized — so it broadcasts onto the
    fact table exactly like dd_dup_clusters' doc→cluster mapping;
    unmatched subjects canonicalize to themselves via coalesce with
    no second pass. The re-aggregation is one map-side-combined
    shuffle on the rewritten (s, p, o) key. The CC runs over pair
    edges (bounded as above) with the usual driver/hash-min dispatch.
    """
    pairs = er_candidates(triples, tau=tau, max_slot_freq=max_slot_freq)
    comps = connected_components(
        pairs.select(F.col("s1").alias("src"), F.col("s2").alias("dst"))
    )
    mapping = F.broadcast(
        comps.select(
            F.col("node").alias("_raw"), F.col("component").alias("_canon")
        )
    )
    rewritten = (
        triples.withColumn("_raw", F.col("subject"))
        .drop("subject")
        .join(mapping, "_raw", "left")
        .select(
            F.coalesce("_canon", "_raw").alias("subject"),
            "predicate",
            "object",
            "conv_id",
            F.col("_raw").alias("_surface"),
        )
    )
    return rewritten.groupBy("subject", "predicate", "object").agg(
        F.count("*").cast("long").alias("support"),
        F.countDistinct("conv_id").cast("long").alias("n_convs"),
        F.countDistinct("_surface").cast("long").alias("n_surfaces"),
    )


def canonicalize_triples(
    triples: DataFrame, alias_df: DataFrame
) -> DataFrame:
    """Attach canonical subject/object ids via broadcast joins on the
    normalized surface forms. Surfaces outside the alias graph are
    their own canonical id (coalesce to self)."""
    mapping = canonical_mapping(alias_df)
    s_map = F.broadcast(
        mapping.select(
            F.col("surface").alias("_s_key"),
            F.col("canonical_id").alias("subject_canonical"),
        )
    )
    o_map = F.broadcast(
        mapping.select(
            F.col("surface").alias("_o_key"),
            F.col("canonical_id").alias("object_canonical"),
        )
    )
    out = (
        triples.withColumn("_s_key", normalize_entity(F.col("subject")))
        .withColumn("_o_key", normalize_entity(F.col("object")))
        .join(s_map, "_s_key", "left")
        .join(o_map, "_o_key", "left")
        .withColumn(
            "subject_canonical", F.coalesce("subject_canonical", F.col("_s_key"))
        )
        .withColumn(
            "object_canonical", F.coalesce("object_canonical", F.col("_o_key"))
        )
        .drop("_s_key", "_o_key")
    )
    return out


def resource_alloc_pairs(
    triples: DataFrame,
    max_obj_deg: int = 1000,
    min_shared: int = 1,
) -> DataFrame:
    """Resource-Allocation link prediction (Zhou, Lü & Zhang 2009)
    over the subject→object graph: subject pairs that share objects
    are scored by Σ 1/d(o) over the shared objects — a rare shared
    object (low degree) is strong evidence the pair is related, a
    common one is weak. The KG-completion companion to
    :func:`er_candidates` (same blocking skeleton, different key —
    the bare object, not the (predicate, object) slot — and a
    degree-weighted score instead of set Jaccard).

    Integer-exact determinism: the score is emitted in parts-per-
    million as Σ (10^6 div d(o)) — pure BIGINT on any engine; 1/d is
    monotone so ranking semantics survive the quantization.

    Scale shape: candidate pairs come from an equi-join on the object
    blocking key (per-key fan-out C(d(o), 2)); ``max_obj_deg`` drops
    hub objects — the quadratic-blowup AND zero-signal tail at once
    (for d(o) = 10^5 the pair count is 5·10^9 and each contributes
    10 ppm — the index is dominated by rare objects, so the cap
    changes scores only negligibly while bounding the join). Degrees
    ride the edge table (one map-side-combined shuffle on object)
    and join back ON the blocking key, so every shuffle is
    object-keyed and entity-cardinality; nothing broadcasts.
    """
    edges = triples.select("subject", "object").distinct()
    deg = edges.groupBy("object").agg(
        F.count("*").cast("long").alias("_d")
    ).filter(F.col("_d") <= max_obj_deg)
    scored = edges.join(deg, "object").withColumn(
        "_ppm", F.expr("CAST(1000000 div _d AS BIGINT)")
    )
    a = scored.select(F.col("subject").alias("s1"), "object", "_ppm")
    b = scored.select(F.col("subject").alias("s2"), "object")
    return (
        a.join(b, "object")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(
            F.count("*").cast("long").alias("n_shared"),
            F.sum("_ppm").cast("long").alias("ra_ppm"),
        )
        .filter(F.col("n_shared") >= min_shared)
    )


def jaccard_neighbor_pairs(
    triples: DataFrame,
    max_obj_deg: int = 1000,
    min_shared: int = 1,
) -> DataFrame:
    """Neighborhood-Jaccard link prediction over the subject→object
    graph: subject pairs scored |N(a) ∩ N(b)| / |N(a) ∪ N(b)| — the
    set-overlap companion to :func:`resource_alloc_pairs` (same
    object-key blocking, but a symmetric size-normalized score
    instead of a degree-weighted sum). Reference workflow parity:
    this is the ER-adjacent "how similar are two entities' object
    neighborhoods" signal the alias dictionary can't provide.

    The union size never materializes a union: |A ∪ B| =
    d(a) + d(b) - |A ∩ B| from the per-subject degrees, so the only
    joins are the object-blocked pair join and two subject-keyed
    degree joins on the (already pair-aggregated, far smaller) pair
    table. Degrees are computed over the SAME hub-capped edge
    universe the pairs come from — consistent set semantics (a
    dropped hub object is dropped from numerator and denominator
    alike). Score is integer ppm: n*10^6 div (d1+d2-n), pure BIGINT.

    Scale shape mirrors resource_alloc_pairs: per-object fan-out is
    C(d(o), 2) bounded by ``max_obj_deg``; every shuffle is keyed
    (object, then s1, then s2) and the degree table is
    entity-cardinality — broadcast when small, hash-join otherwise
    (left to AQE, since entity counts vary by corpus).
    """
    edges = triples.select("subject", "object").distinct()
    deg_o = (
        edges.groupBy("object")
        .agg(F.count("*").cast("long").alias("_do"))
        .filter(F.col("_do") <= max_obj_deg)
    )
    capped = edges.join(deg_o.select("object"), "object")
    deg_s = capped.groupBy("subject").agg(
        F.count("*").cast("long").alias("_ds")
    )
    a = capped.select(F.col("subject").alias("s1"), "object")
    b = capped.select(F.col("subject").alias("s2"), "object")
    pairs = (
        a.join(b, "object")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return (
        pairs.join(deg_s.withColumnRenamed("subject", "s1"), "s1")
        .withColumnRenamed("_ds", "_d1")
        .join(deg_s.withColumnRenamed("subject", "s2"), "s2")
        .withColumnRenamed("_ds", "_d2")
        .select(
            "s1",
            "s2",
            "n_shared",
            F.expr(
                "CAST((n_shared * 1000000)"
                " div (_d1 + _d2 - n_shared) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )


def cc_two_phase(edges: DataFrame, max_iter: int = 15) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contractions (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SoCC'14) — the shuffle-bounded alternative to the
    hash-min loop in :func:`connected_components`. Hash-min needs
    O(diameter) rounds and re-shuffles the FULL edge set each round;
    the two-phase star contraction converges in O(log^2 n) rounds and
    every round SHRINKS the edge set (each phase rewires nodes toward
    their neighborhood minimum, collapsing paths into stars), so the
    per-round shuffle cost decays as components contract. On a 100 TB
    alias/ER graph with long chains this is the difference between
    ~diameter and ~log^2 shuffles.

    * large-star: every node u links its LARGER neighbors (v > u) to
      min(N(u) ∪ {u}) — cuts long chains in half without ever
      directing an edge "upward".
    * small-star: every node u links its smaller-or-equal neighbors
      and itself to that minimum — flattens the remaining 2-paths.

    Convergence is an edge-set fixpoint (two subtract-counts per
    round on the already-contracted set); iteration caps at
    ``max_iter`` as a backstop. Returns (node, component) with
    component = the minimum node id reachable — byte-identical to
    :func:`connected_components` (parity-tested).
    """
    e = (
        edges.filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("a"),
            F.least("src", "dst").alias("b"),
        )
        .distinct()
        .localCheckpoint()
    )
    all_nodes = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint()
    )

    for _ in range(max_iter):
        # large-star over the symmetric view: m(u) = min(N(u) ∪ {u});
        # emit (v, m) for v > u. Output stays canonical (big, small)
        # because v > u >= m.
        sym = e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        m = sym.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        )
        ls = (
            sym.join(m, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # small-star over the downward-directed view: per larger
        # endpoint a, m = min of its smaller neighbors; emit every
        # smaller neighbor AND a itself re-linked to m.
        sm = ls.groupBy("a").agg(F.min("b").alias("m"))
        ss = (
            ls.join(sm, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .unionByName(sm.select(F.col("a"), F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint()
        )
        changed = (
            ss.exceptAll(e).count() + e.exceptAll(ss).count()
        )
        e = ss
        if changed == 0:
            break

    # Converged edge set is a star forest: every non-root node links
    # directly to its component minimum; roots appear only on the
    # small side. min() guards the (capped, non-converged) case.
    child_root = e.groupBy("a").agg(F.min("b").alias("component"))
    return all_nodes.join(
        child_root, all_nodes.node == child_root.a, "left"
    ).select(
        "node",
        F.coalesce(F.col("component"), F.col("node")).alias("component"),
    )


def sorted_neighborhood_pairs(
    ents: DataFrame, window: int = 4, col: str = "e"
) -> DataFrame:
    """Sorted-neighborhood ER candidate pairs (Hernández & Stolfo,
    SIGMOD'95): entities sorted by a normalized key, pairs emitted
    within ``window - 1`` sort positions, scored with Levenshtein.

    Complements hash blocking (er_candidates): a typo in the blocking
    field moves a record to a different hash block but usually NOT
    away from its lexicographic neighbors. The global sort is
    functions/ranking.stable_rank's two-phase range shuffle (no
    single-partition window), and the w-window join is an EQUI-join
    on rank + d, d in 1..window-1 (probe side exploded) — the bucket
    trick, not a range-join nested loop.
    """
    from information_extraction_spark.functions.ranking import stable_rank

    # '#' sorts below [a-z0-9], so ordering by the single concat
    # column equals ordering by (normalized_key, entity); the concat
    # is unique because the entity is, which stable_rank requires.
    keyed = ents.select(F.col(col).alias("e")).distinct().withColumn(
        "sk",
        F.concat(
            F.regexp_replace(F.lower(F.col("e")), "[^a-z0-9]", ""),
            F.lit("#"),
            F.col("e"),
        ),
    )
    ranked = stable_rank(keyed, "sk", out_col="rnk").select("e", "rnk")
    a = ranked.withColumn(
        "probe",
        F.explode(F.array(*[F.col("rnk") + d for d in range(1, window)])),
    ).alias("a")
    b = ranked.alias("b")
    return a.join(b, F.col("a.probe") == F.col("b.rnk")).select(
        F.col("a.e").alias("ea"),
        F.col("b.e").alias("eb"),
        (F.col("b.rnk") - F.col("a.rnk")).cast("long").alias("gap"),
        F.levenshtein(F.col("a.e"), F.col("b.e")).cast("long").alias("lev"),
    )
