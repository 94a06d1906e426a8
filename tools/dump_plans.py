"""Dump physical plans for the headline queries into PLANS.md.

Evidence that the engine produces the plans we WANT at 100 TB, not
just plans that pass at sf0.01:

- the schema/alias dims join as BroadcastHashJoin (never shuffle the
  fact side for a 50-row dim),
- parquet scans carry PushedFilters + pruned ReadSchema,
- the extraction DAG has exactly one exchange before the kernels
  (the explicit AQE-exempt repartition) and none between them,
- relational operators sit inside WholeStageCodegen spans.

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PLAN_QUERIES = [
    ("kg_extract_triples", "end-to-end extraction DAG (the flagship)"),
    ("j1_broadcast_dim_join", "50-row schema dim must broadcast"),
    (
        "mm_png_jpeg_dims",
        "native PNG/JPEG header decode: one narrow mapInPandas over "
        "the id scan, zero exchanges before the parse",
    ),
    ("dd_minhash_lsh", "shingle → minhash → band self-join"),
    ("dd_ngram_jaccard", "blocked all-pairs: equi-join on (lang, 20-char band)"),
    ("w1_stable_turn_order", "single shuffle satisfies both windows"),
    ("a1_micro_prf1", "eval join + global agg"),
    (
        "kg_truth_discovery",
        "Sums fusion: per half-step ONE map-side-combined keyed agg "
        "+ broadcast scalar max — no unpartitioned window, no "
        "nested loop",
    ),
    (
        "kg_betweenness",
        "Brandes backward levels: per level one equi-join through "
        "the closure + one (entity, pivot) sum",
    ),
    (
        "emb_nn_descent",
        "NN-Descent: bucketed init equi-joins + local join on the "
        "pivot key — no unblocked self-join anywhere",
    ),
    ("ta_quality", "explode + groupBy: partial aggregation map-side"),
    ("q1_pricing_summary", "filter pushdown must reach the parquet scan"),
    ("q3_shipping_priority", "3-table join: filtered dim broadcasts"),
    (
        "q6_forecast_revenue",
        "pure filter + global agg: every predicate must reach the "
        "scan as PushedFilters; one map-side-combined global agg",
    ),
    (
        "q5_local_supplier",
        "6-table join: supplier and region-filtered nation BROADCAST "
        "(never shuffle the facts for bounded dims); lineitem/orders/"
        "customer join on their equi-keys; the customer-supplier "
        "nationkey equality applies as a post-join filter",
    ),
    (
        "w6_sliding_window",
        "sliding event-time windows: the x2 window assignment is an "
        "Expand-style row expansion then ONE map-side-combined "
        "shuffle on (window, type) — never a range join",
    ),
    (
        "w7_session_window",
        "native session windows: gap-merge aggregation keyed on "
        "(session_window, user) — one exchange on the user key, "
        "sessions merged within partitions",
    ),
    (
        "kg_graph_diff",
        "two-sided snapshot diff: each side shuffles once on the "
        "shared (s,p,o) key; the distinct and both anti-joins reuse "
        "the exchange; nothing broadcasts by default (both snapshots "
        "unbounded at warehouse scale)",
    ),
    (
        "dd_semdedup_keep",
        "SemDeDup keep-one: the CC label table (bounded by vectors "
        "in near-dup pairs) BROADCASTS onto the full vector table; "
        "singletons coalesce to themselves — no second pass",
    ),
    (
        "kg_pagerank_personalized",
        "personalized PageRank: same localCheckpointed-edges loop as "
        "kg_pagerank; the seed set rides the plan as an isin literal "
        "(a personalization set is bounded by definition) — no extra "
        "join or shuffle over the global variant",
    ),
    (
        "ann_ivf_pq",
        "IVFADC: the coarse quantizer prunes to nprobe=2 lists "
        "(broadcast candidate ids — the embeddings side never "
        "shuffles), then the zero-shuffle ADC scan scores only the "
        "candidates",
    ),
    (
        "ann_pq_trained",
        "trained PQ: all m sub-space k-means fuse into one pass per "
        "iteration (narrow assignment against an s-indexed codebook "
        "literal; ONE (s, cid, pos) map-side-combined shuffle), then "
        "the same zero-shuffle ADC scan as ann_pq_adc",
    ),
    (
        "ta_selfsim_spans",
        "duplicated-span scoring: ONE wide pass to distinct (doc, "
        "gram); the frequency agg and the dup-filter join reuse the "
        "gram-hash exchange; doc-keyed aggregates join back at doc "
        "cardinality",
    ),
    (
        "w8_rolling_avg",
        "range-frame rolling aggregate: ONE exchange on user_id; the "
        "1h RANGE frame streams each sorted partition (WindowExec), "
        "never buffering a whole user beyond the frame",
    ),
    (
        "p7_vocab_build",
        "two-phase distributed rank: window partitioned by _pid, no "
        "global single-task sort (functions/ranking.py)",
    ),
    (
        "w13_event_runs",
        "gaps-and-islands: the change flag, its running sum, and the "
        "(user_id, run_id) rollup all share ONE exchange — user_id "
        "hash partitioning satisfies the rollup's clustering",
    ),
    (
        "j10_bloom_filter_join",
        "Bloom join pruning: the 8192-bit filter builds from the dim "
        "side and BROADCASTS; the probe is a narrow map over the "
        "lineitem scan — the fact side never exchanges",
    ),
    (
        "a12_kmv_distinct",
        "KMV sketch: one exchange of DISTINCT 8-byte hashes, then "
        "TakeOrderedAndProject — per-partition k-min heaps ARE the "
        "KMV merge; no global sort",
    ),
    (
        "q10_returned_items",
        "returned-item report: returnflag + date-window both reach "
        "their scans as PushedFilters BEFORE the orderkey shuffle; "
        "revenue pre-aggregates per customer before the dim joins; "
        "top-20 is TakeOrderedAndProject",
    ),
    (
        "p17_arrow_map",
        "mapInArrow seam: a single narrow PythonMapInArrow over the "
        "scan — zero exchanges, no pandas materialization",
    ),
    (
        "ta_pmi_collocations",
        "PMI collocations: narrow in-row shingling; ONE map-side-"
        "combined bigram shuffle; the vocabulary-sized unigram table "
        "broadcasts into both endpoint joins",
    ),
    (
        "p3_dp_segment",
        "broadcast frequency dict + narrow mapInPandas token explode "
        "(no shuffle before the result)",
    ),
    (
        "dd_dup_clusters",
        "LSH pairs -> connected components -> keep-one: the final "
        "mapping join over the (localCheckpointed) CC labels",
    ),
    (
        "ann_ivf_pruned_probe",
        "IVF probe over the cid-partitioned index: the FileScan must "
        "carry PartitionFilters on cid (reads nprobe=2 of the "
        "inverted-list partitions), then TakeOrderedAndProject",
    ),
    (
        "kg_degree_topk",
        "degree centrality: map-side partial agg on the entity key, "
        "top-20 via TakeOrderedAndProject — never a global sort",
    ),
    (
        "dd_edit_distance",
        "blocked thresholded Levenshtein: equi-join on (lang, 20-char "
        "band); the 3-arg banded levenshtein stays BEHIND the "
        "pushdown barrier (a pushed predicate would run the DP twice "
        "per candidate inside the join)",
    ),
    (
        "kg_er_sorted_neighborhood",
        "sorted-neighborhood blocking: the global rank is the "
        "two-phase range shuffle (no single-partition window); the "
        "w-window pair join is an EQUI-join on rank+d",
    ),
    (
        "ta_phrase_search",
        "phrase query: posting lists FILTERED to the two phrase "
        "terms before the (doc_id, pos+1) adjacency join — the "
        "corpus never self-joins",
    ),
    (
        "kg_star_join",
        "conjunctive BGP: two predicate-pruned DISTINCT pattern "
        "scans shuffled once on the shared subject key",
    ),
    (
        "kg_pagerank",
        "iterative PageRank: the edge table is a localCheckpointed "
        "ExistingRDD scanned per iteration (extraction runs ONCE); "
        "each iteration is one join + one agg over the node-sized "
        "rank vector, lineage cut per iteration",
    ),
    (
        "a9_best_threshold",
        "argmax via TakeOrderedAndProject, not a global window. The "
        "BroadcastNestedLoopJoin here is the INTENTIONAL cross join "
        "against the broadcast 5-row threshold grid (no equi-key "
        "exists); the fact side streams once",
    ),
    (
        "ta_split",
        "deterministic hash split: a NARROW zero-exchange projection "
        "over the scan — at 100 TB the split is a free extra column, "
        "never a shuffle or sample",
    ),
    (
        "kg_neg_sampling",
        "negative sampling: the 16-row candidate pool broadcasts "
        "(BroadcastNestedLoopJoin is the intentional ×16 cross "
        "expansion), the not-a-true-triple check is an equi-key "
        "anti-join, the argmin pick one hash aggregate — no window, "
        "no global sort",
    ),
    (
        "kg_triple_support",
        "support aggregation: ONE map-side-combined shuffle on the "
        "full (s,p,o) key; countDistinct(conv_id) expands in-place "
        "on the same key — no second wide dependency",
    ),
    (
        "kg_incremental_merge",
        "insert-only MERGE: base and incoming shuffle once on the "
        "shared (s,p,o) key (distinct + LeftAnti reuse the exchange); "
        "nothing broadcasts by default since BOTH sides are unbounded "
        "at 100 TB (AQE may still downgrade a small batch)",
    ),
    (
        "kg_functional_resolve",
        "conflict resolution: struct-ordered max argmax — three "
        "map-side-combined shuffles over progressively collapsed "
        "data ((s,p,o,conv) -> (s,p,o) -> (s,p)); the SortAggregate "
        "pair is Spark's fallback for a string field in the max "
        "buffer, sorting only the twice-collapsed support table — "
        "no window, no whole-group buffering",
    ),
    (
        "kg_pred_profile",
        "ontology profile: typed-spo collapse then multi-DISTINCT "
        "via Expand — partial aggregation keyed on (predicate, "
        "entity, gid) spreads the work across entity keys, so ~50 "
        "predicate groups never become 50 hot reducers; all three "
        "exchanges are hash aggregates with map-side partials",
    ),
    (
        "kg_provenance",
        "k-bounded provenance: ONE exchange on (s,p,o) shared by the "
        "rank window, the count window, and the final collect — the "
        "rank filter caps the collect at k strings per triple, so no "
        "hot fact ever aggregates unbounded state",
    ),
    (
        "kg_temporal_extent",
        "triple validity windows: equi-join back to the transcript "
        "table on the (conv_id, turn_idx) provenance key (bucketed "
        "by conv_id at warehouse scale -> zero-exchange; one shuffle "
        "per side unbucketed), then ONE map-side-combined shuffle on "
        "(s,p,o) for the min/max bounds",
    ),
    (
        "kg_conv_stats",
        "per-conversation yield: BOTH sides pre-aggregate on conv_id "
        "before the join, so the join moves one row per conversation "
        "— never raw turns or assertions; left join keeps zero-yield "
        "conversations",
    ),
    (
        "kg_er_candidates",
        "ER candidate generation: blocked equi-join on the (p,o) "
        "slot key (never an all-pairs subject join), stop-slot cap "
        "bounds per-key fan-out, degree join-backs co-keyed on the "
        "pair endpoints; the two self-join branches reuse one "
        "exchange over the filtered slot table",
    ),
    (
        "kg_incremental_er",
        "incremental ER probe: batch slot table + stop-keys "
        "BROADCAST, the persisted slot index streams past them "
        "unshuffled (base degrees ride the index rows — no "
        "entity-sized degree join at probe time); pair agg bounded "
        "by batch size x capped slot fan-out",
    ),
    (
        "kg_graph_pred_scan",
        "single-predicate consumer of the written graph table: the "
        "foldable bucket equality reaches the FileScan as "
        "PartitionFilters (1 of 16 bucket dirs), the predicate "
        "equality lands in PushedFilters against predicate-sorted "
        "row groups",
    ),
    (
        "ta_contamination",
        "decontamination: the (small) eval gram set BROADCASTS; the "
        "train corpus streams past it in one narrow pass — no "
        "corpus-wide shuffle or pre-distinct of the train side",
    ),
    (
        "ta_perplexity",
        "unigram-LM scoring: the vocab-bounded model broadcasts "
        "(BroadcastHashJoin) so the corpus is scored in one narrow "
        "pass, then one per-doc aggregation shuffle",
    ),
    (
        "kg_er_merge",
        "ER application: the CC label table (bounded by entities in "
        "above-threshold pairs, NOT entity-sized) BROADCASTS onto "
        "the fact table for the subject rewrite; re-aggregation is "
        "one map-side-combined shuffle on the rewritten (s,p,o) key",
    ),
    (
        "kg_cardinality_check",
        "cardinality validation: distinct on (s,p,o) then (s,p) "
        "count then the ~50-group predicate rollup — every exchange "
        "map-side combined over progressively collapsed data",
    ),
    (
        "kg_type_violations",
        "domain/range validation: the inferred-type table is "
        "ENTITY-sized, joined on the endpoint key per side (co-keyed "
        "shuffle join at warehouse scale — AQE may broadcast at test "
        "scale); the triple side pre-collapses per typed endpoint "
        "before the join",
    ),
    (
        "ann_pq_adc",
        "PQ asymmetric-distance top-k: codebooks and the query "
        "distance table are plan LITERALS — encode (m argmins) and "
        "ADC (m element_at lookups) evaluate per-row in ONE narrow "
        "scan into TakeOrderedAndProject; no shuffle anywhere",
    ),
    (
        "kg_neighbor_sample",
        "fixed-fanout neighbor sampling: distinct on (s,p,o), then "
        "ONE exchange on subject shared by the rank window, the "
        "degree window, and the fanout filter — a hub with millions "
        "of out-edges emits fanout rows",
    ),
    (
        "dd_embedding_cosine_kmeans",
        "learned-blocking near-dup: the k-means cid join is co-keyed "
        "on vec_id; the self-join pairs only within clusters (never "
        "an unblocked O(n^2) join); norms hoisted above the pair "
        "expression",
    ),
    (
        "emb_cluster_sample",
        "cluster-balanced sampling plan: emb_kmeans assignments plus "
        "one k-group map-side-combined rollup; the mean uses "
        "integer-exact 4dp-quantized sums (order-independent)",
    ),
    (
        "emb_kmeans",
        "Lloyd k-means: centroids are a k x dim plan LITERAL — the "
        "assignment pass is completely narrow (no crossJoin, no "
        "shuffle); each update is ONE map-side-combined shuffle with "
        "k x dim groups; final plan is scan -> project -> round",
    ),
    (
        "q9_json_props",
        "semi-structured scan: get_json_object evaluates JVM-side "
        "inside the codegen span (narrow projection fused into the "
        "scan), then one map-side-combined shuffle for the per-type "
        "profile — no Python in the path",
    ),
    (
        "p16_chunk_udtf",
        "Python UDTF lateral join (Spark 4): Arrow-batched "
        "BatchEvalPythonUDTF directly over the scan — completely "
        "narrow (no exchange before the chunks); per-doc explode "
        "never co-locates whole documents",
    ),
    (
        "kg_label_propagation",
        "synchronous LPA: the undirected edge table materializes "
        "once; per iteration the node-sized label vector joins onto "
        "the edge key, ONE map-side-combined (entity, label) count, "
        "then a struct-min argmax — never a whole-partition window; "
        "lineage cut per iteration",
    ),
    (
        "kg_bfs_distances",
        "multi-source BFS: per hop only the FRONTIER joins the "
        "localCheckpointed edge table; one LeftAnti vs visited drops "
        "re-reached nodes (both sides unbounded — no broadcast by "
        "assumption); lineage cut per hop",
    ),
    (
        "j8_asof_join",
        "AS-OF join as union + running max: ONE exchange on user_id "
        "feeds a single sort/window — never a per-user non-equi "
        "product; both event scans prune to (user_id, ts[, event_id])",
    ),
    (
        "j9_range_join",
        "range join with time IN the join key: window-width buckets "
        "make the interval join an equi-join on (user_id, bucket) "
        "(x2 Expand on the intervals side, one bucket per probe); "
        "the BETWEEN rides as the join condition so LEFT semantics "
        "keep zero-match rows",
    ),
    (
        "w10_hypertable_rollup",
        "hierarchical rollup: hour level aggregates the MINUTE "
        "partial table (two map-side-combined exchanges over "
        "progressively collapsed data); raw events are scanned once",
    ),
    (
        "q7_rollup",
        "ROLLUP grouping sets: one Expand (x3) into ONE map-side-"
        "combined shuffle — never three scans of the table",
    ),
    (
        "q8_pivot",
        "pivot with PINNED values: one scan, two map-side-combined "
        "exchanges over progressively collapsed data (Spark plans "
        "pivot as agg-by-(source,lang) then pivot-agg-by-source) — "
        "no values-inference pre-scan of the table",
    ),
    (
        "q2_min_cost_supplier",
        "correlated argmin: the fact join collapses to DISTINCT "
        "(brand, supplier) before the 100-row supplier dim "
        "BROADCASTS; min + argmin fuse into ONE struct-min "
        "aggregate — no per-brand window, no agg-then-rejoin",
    ),
    (
        "q11_revenue_share",
        "global-share HAVING: lineitem scanned ONCE; the 1-row "
        "global total derives from the per-type partials and "
        "broadcasts back — never a second fact scan for the scalar",
    ),
    (
        "q21_waiting_suppliers",
        "multi-EXISTS blame report: one big-big equi-join, then the "
        "localCheckpointed DISTINCT pair table feeds both the LEFT "
        "SEMI and LEFT ANTI self-joins (equi on orderkey, suppkey "
        "inequality as join residual — no per-order cross product)",
    ),
    (
        "w25_salted_agg",
        "salted two-phase hot-key aggregation: phase 1 groups on "
        "(key, _salt) map-side-combined, phase 2 merges <=16 partial "
        "rows per key; the distinct-user leg shuffles on the "
        "COMPOSITE key (no per-key set state); tiny final broadcast "
        "join",
    ),
    (
        "dd_dup_spans",
        "repeated-span detection: ONE shuffle on the md5 gram key "
        "finds duplicated grams, one big-big join back (no broadcast "
        "assumed — both sides corpus-sized), island merge windows "
        "only the surviving positions per doc",
    ),
    (
        "w23_skew_profile",
        "skew diagnostics: per-key counts map-side-combined, top-5 "
        "via TakeOrderedAndProject (never a global row_number over "
        "the key table), 1-row global stats broadcast back",
    ),
    (
        "a17_hll_mergeable",
        "mergeable HLL rollup: per-scope registers in ONE map-side-"
        "combined (scope, register) shuffle; the global merge "
        "aggregates the BOUNDED register table only — the shingle "
        "stream is never re-read for the coarser scope",
    ),
    (
        "emb_ktruss",
        "k-truss round: degree-ordered triangle enumeration (the "
        "O(m^1.5) compact-forward wedge join), a 3-way incidence "
        "union into ONE map-side-combined edge-key count, and the "
        "prune as the inner join itself; edges localCheckpoint per "
        "round so round 2 scans an ExistingRDD, not the lineage",
    ),
    (
        "w27_interval_concurrency",
        "interval sweep: boundaries range-partition by the GLOBAL "
        "(t, delta, event_id) order — a hot event_type spreads over "
        "every core (Window.partitionBy(type) would collapse it to "
        "one task); the scan pass is a narrow sorted mapInPandas; "
        "peak rollups reuse small broadcasts",
    ),
    (
        "ta_seq_packing",
        "sequence packing: ONE shuffle on the shard key feeds the "
        "FlatMapGroupsInPandas fold — the per-shard scan is "
        "sequential by CONTRACT (next-fit is order-defined), so one "
        "exchange is the proof there's nothing extra",
    ),
    (
        "ta_bigram_lm",
        "bigram LM: the bigram expansion is IN-ROW (transform over "
        "the token array — narrow); both count tables broadcast "
        "into the scoring joins; one per-doc aggregation shuffle",
    ),
    (
        "s9_corrupt_quarantine",
        "quarantine read: schema-pinned JSON FileScan (no inference "
        "pass), quarantine routing is a narrow projection, ONE "
        "map-side-combined shuffle on the bucket key",
    ),
    (
        "kg_slot_changes",
        "slot version history: co-keyed (conv_id, turn_idx) "
        "provenance equi-join, first_sec collapses assertions "
        "map-side per distinct (s,p,o), then version/lag/count "
        "share ONE (s, p) window sort over the slot-sized table — "
        "no per-assertion window state",
    ),
    (
        "kg_modularity",
        "Newman Q: undirected canonicalization is narrow; degree "
        "and label joins stay co-keyed on the node; the per-"
        "community terms aggregate map-side; exact-BIGINT terms — "
        "no float tree",
    ),
    (
        "q24_nation_volume",
        "TPC-H Q7 shape: both nation dims filter to the pair THEN "
        "broadcast (semi-pruning the fact stream); the disjunctive "
        "pair predicate evaluates post-join over two name columns, "
        "never as a join condition (which would nested-loop)",
    ),
    (
        "kg_sssp_weighted",
        "Bellman-Ford rounds: edge table materialized once "
        "(localCheckpoint), each round ONE contribution join + ONE "
        "min-aggregation shuffle of frontier-sized data; fixed "
        "round count keeps the plan bounded",
    ),
    (
        "q23_skyline",
        "Pareto frontier: per-brand window sort replaces the "
        "quadratic NOT EXISTS dominance join — one exchange on the "
        "brand key, running-min dominance check inside the sorted "
        "partition",
    ),
    (
        "w27_interval_concurrency",
        "segmented sweep: +1/-1 endpoint expansion is in-row; the "
        "two-phase rank (range-shuffle by boundary key) computes "
        "global prefix sums without a single-reducer global window",
    ),
    (
        "dd_simhash_hamming",
        "pigeonhole Hamming search: signature = ONE wide 24-sum "
        "aggregate (no bit-explode row blowup); candidates from the "
        "salted (blk, key) equi-join — never a quadratic scan; "
        "first-block-wins filter + in-row xor/bit_count verify",
    ),
    (
        "kg_conv_dedup",
        "conversation dedup: blocked equi-join on the full (s,p,o) "
        "triple key after the stop-triple cap; degree joins co-keyed "
        "on the pair endpoints; no broadcast of unbounded conv tables",
    ),
    (
        "kg_gcn_agg",
        "GraphSAGE layer: neighbor features computed IN-ROW on the "
        "edge (no feature-table join); undirected closure + ONE "
        "map-side-combined shuffle on the node key",
    ),
    (
        "emb_dbscan",
        "grid-blocked DBSCAN: candidates from the 3x3 neighbor-cell "
        "co-partitioned equi-join on (cx, cy) — bounded by local "
        "density, no all-pairs crossJoin; degree/border aggs "
        "map-side combined on the point key",
    ),
    (
        "kg_wl_kernel",
        "WL refinement: every message join and label agg co-keyed on "
        "(conv_id, endpoint) — a conversation's graph never leaves "
        "its partition; 2 rounds = one static Catalyst plan",
    ),
    (
        "kg_temporal_conflict",
        "interval-overlap detection: provenance equi-join + extent "
        "rollup reduce to <=1 row per (s,p,o) BEFORE the slot-co-"
        "keyed self-join — assertion volume never reaches the pair "
        "stage; fan-out bounded by slot version count squared",
    ),
    (
        "q26_profit_by_nation_year",
        "TPC-H Q9 shape: widget part filter and supplier→nation dim "
        "both BROADCAST and prune lineitem BEFORE the single "
        "orderkey shuffle; per-line profit cents computed in-row",
    ),
    (
        "kg_motif_census",
        "precedence triad census: first-mention rollup one shuffle "
        "on (conv, entity); capped per-conv pair self-join; wedge "
        "join keyed on the capped middle node; FFL/cycle closures "
        "as LEFT equi-join flags on the endpoint pair folded into "
        "ONE aggregate — single job, no cross product except the "
        "intentional 1-row edge-count broadcast",
    ),
    (
        "kg_louvain_move",
        "Louvain move phase: degree joins co-keyed on the edge "
        "endpoints, gain edge-wise narrow arithmetic, argmax ONE "
        "map-side-combined min(struct) aggregate on the node key — "
        "no window over the node table",
    ),
    (
        "a25_ks_drift",
        "two-sample KS: input touched by ONE map-side-combined "
        "groupBy to the value-domain histogram; the running-CDF "
        "window and sup aggregate run over the bounded histogram "
        "(documented single-partition window over bounded rows)",
    ),
]


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def summarize(plan: str) -> str:
    n_exchange = len(re.findall(r"\bExchange\b", plan))
    n_bhj = len(re.findall(r"BroadcastHashJoin", plan))
    n_smj = len(re.findall(r"SortMergeJoin", plan))
    n_bnlj = len(re.findall(r"BroadcastNestedLoopJoin", plan))
    n_wsc = len(re.findall(r"WholeStageCodegen", plan))
    pushed = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
    lines = [
        f"exchanges={n_exchange}, broadcast_hash_joins={n_bhj}, "
        f"sort_merge_joins={n_smj}, nested_loop_joins={n_bnlj}, "
        f"codegen_spans={n_wsc}"
    ]
    for p in pushed[:4]:
        lines.append(p)
    return "\n".join(lines)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from information_extraction_spark.driver_queries import QUERIES
    from information_extraction_spark.session import get_spark

    spark = get_spark(app_name="ie-plans", master="local[4]")

    out = [
        "# PLANS — physical plans of headline queries",
        "",
        f"Generated by tools/dump_plans.py at {sf_dir}. What to check:",
        "dims broadcast (no SortMergeJoin against a 50-row table),",
        "parquet scans show PushedFilters/pruned ReadSchema, kernel",
        "stages are narrow (one Exchange feeds them), joins that were",
        "nested-loop at first draft are equi-joins now.",
        "",
    ]
    def _graph_write_layout_df(spark, sf_dir):
        """The shuffle+sort stage feeding write_graph's partitioned
        sink (the pre-InsertIntoHadoopFsRelation plan): one Exchange
        hashing (pred_bucket, subject-salt) into num_tasks writers —
        NOT pred_bucket alone, which would cap the writers at the
        bucket count on any cluster — then a within-partition sort
        led by pred_bucket so the dynamic-partition writer streams
        one directory at a time without inserting its own sort."""
        from information_extraction_spark.sources.tables import (
            graph_write_layout,
        )

        return graph_write_layout(
            QUERIES["kg_extract_triples"](spark, sf_dir), num_tasks=32
        )

    specials = [
        (
            "graph_write_layout",
            "partitioned graph sink: ONE hash Exchange on "
            "(pred_bucket, subject salt) sized to the cluster "
            "(num_tasks=32 here), within-partition sort led by "
            "pred_bucket — no extra writer-inserted sort, no "
            "range-sampler re-execution of the extraction DAG",
            _graph_write_layout_df,
        ),
    ]

    entries = [
        (name, why, QUERIES[name]) for name, why in PLAN_QUERIES
    ] + specials
    for name, why, builder in entries:
        df = builder(spark, sf_dir)
        plan = plan_text(df)
        out += [
            f"## {name}",
            "",
            f"_{why}_",
            "",
            "```",
            summarize(plan),
            "```",
            "",
            "<details><summary>full formatted plan</summary>",
            "",
            "```",
            plan.rstrip(),
            "```",
            "",
            "</details>",
            "",
        ]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
