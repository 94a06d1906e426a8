"""End-to-end Spark pipeline tests: exact parity with the pure-Python
reference extractor, order invariance, and the per-turn text-equality
invariant (BASELINE.json input_hint)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from information_extraction_spark import schemas as S
from information_extraction_spark.plans.pipeline import extract_triples

TRIPLE_KEY = ["conv_id", "turn_idx", "predicate", "subject", "object"]


def _spark_triples(spark, world, transcripts_pdf) -> pd.DataFrame:
    tdf = spark.createDataFrame(transcripts_pdf, schema=S.TRANSCRIPTS)
    kb = spark.createDataFrame(world.kb_clean, schema=S.KNOWLEDGE_BASE)
    sch = spark.createDataFrame(world.schemas, schema=S.RELATION_SCHEMAS)
    out = extract_triples(spark, tdf, kb, sch)
    return out.toPandas()


def _key_set(pdf: pd.DataFrame) -> set[tuple]:
    return set(
        pdf[
            TRIPLE_KEY + ["subject_type", "object_type"]
        ].itertuples(index=False, name=None)
    )


def test_pipeline_matches_reference_oracle_exactly(
    spark, world, transcripts_pdf, golden_pdf
):
    """Clean-KB Spark run must equal the pure-Python reference
    extractor output triple-for-triple (P = R = 1.0)."""
    got = _spark_triples(spark, world, transcripts_pdf)
    assert len(got) == len(got.drop_duplicates(TRIPLE_KEY))
    assert _key_set(got) == _key_set(golden_pdf)


def test_pipeline_output_invariant_to_input_order(
    spark, world, transcripts_pdf
):
    """The reference relied on file order; we must not. A differently
    shuffled/partitioned input yields the identical triple set."""
    reshuffled = transcripts_pdf.sample(frac=1.0, random_state=7).reset_index(
        drop=True
    )
    a = _key_set(_spark_triples(spark, world, transcripts_pdf))
    tdf = spark.createDataFrame(reshuffled, schema=S.TRANSCRIPTS).repartition(13)
    kb = spark.createDataFrame(world.kb_clean, schema=S.KNOWLEDGE_BASE)
    sch = spark.createDataFrame(world.schemas, schema=S.RELATION_SCHEMAS)
    b = _key_set(extract_triples(spark, tdf, kb, sch).toPandas())
    assert a == b


def test_per_turn_text_equality_invariant(spark, world, transcripts_pdf):
    """Every output row's text must byte-equal the source turn's text
    under the (conv_id, turn_idx) key (north-rule per-turn invariant;
    reference analog: postag-concat == text,
    pytorch/analysis/check_composition.py:7-16)."""
    tdf = spark.createDataFrame(transcripts_pdf, schema=S.TRANSCRIPTS)
    kb = spark.createDataFrame(world.kb_clean, schema=S.KNOWLEDGE_BASE)
    sch = spark.createDataFrame(world.schemas, schema=S.RELATION_SCHEMAS)
    triples = extract_triples(spark, tdf, kb, sch)
    src = tdf.select("conv_id", "turn_idx", F.col("text").alias("src_text"))
    joined = triples.join(src, ["conv_id", "turn_idx"], "left")
    mismatches = joined.filter(
        F.col("src_text").isNull() | (F.col("text") != F.col("src_text"))
    ).count()
    assert mismatches == 0


def test_entities_are_substrings_of_text(spark, world, transcripts_pdf):
    """Emitted entities must occur in the turn text
    (pytorch/analysis/check_composition.py:21-29)."""
    got = _spark_triples(spark, world, transcripts_pdf)
    assert len(got) > 0
    for row in got.itertuples():
        assert row.subject.lower() in row.text.lower()
        assert row.object.lower() in row.text.lower()


def test_dual_schema_predicate_first_listed_wins(spark, world, transcripts_pdf):
    """成立日期 carries two schema rows; emitted triples must use the
    first-listed subject_type (produce_submit_json_file.py:275)."""
    got = _spark_triples(spark, world, transcripts_pdf)
    dual = got[got.predicate == "成立日期"]
    assert len(dual) > 0
    assert set(dual.subject_type) == {"机构"}


def test_fused_path_matches_staged_path(spark, world, transcripts_pdf):
    """The fully fused classify+tag+decode kernel must be triple-exact
    with the staged classify → fanout → tag+decode path, including on
    the NOISY KB (dropped + spurious entries exercise the fallback
    top-k and cross-pair one-sided-match corners that the clean-KB
    golden test cannot reach)."""
    from information_extraction_spark.operators import extract as ex

    for kb_pdf in (world.kb_clean, world.kb_noisy):
        tdf = spark.createDataFrame(transcripts_pdf, schema=S.TRANSCRIPTS)
        kb = spark.createDataFrame(kb_pdf, schema=S.KNOWLEDGE_BASE)
        sch = spark.createDataFrame(world.schemas, schema=S.RELATION_SCHEMAS)
        kb_bc = ex.broadcast_kb(spark, kb)
        ordered = ex.ordered_transcripts(tdf)
        staged = ex.assemble_triples(
            ex.tag_decode_stage(
                ex.fanout_predicates(ex.classify_stage(ordered, kb_bc)), kb_bc
            ),
            sch,
        ).toPandas()
        fused = ex.assemble_triples(
            ex.classify_tag_decode_stage(ordered, kb_bc), sch
        ).toPandas()
        assert _key_set(fused) == _key_set(staged)
        assert len(fused) == len(staged)
        # Pre-cleaned fast path (the pipeline default): the kernel
        # cleans at memo time and assemble skips its array lambdas —
        # must stay triple-exact with the staged composition.
        pre = ex.assemble_triples(
            ex.classify_tag_decode_stage(
                ordered, kb_bc, min_entity_len=ex.MIN_ENTITY_LEN
            ),
            sch,
            pre_cleaned=True,
        ).toPandas()
        assert _key_set(pre) == _key_set(staged)
        assert len(pre) == len(staged)


def test_collapse_duplicate_texts_parity(spark, world, transcripts_pdf):
    """The collapse-distinct-texts fast path (kernel once per distinct
    text globally + join-back) must be ROW-exact — not just
    key-set-exact — with the uncollapsed fused path, on a corpus where
    the same turn text recurs across conversations (the agent-
    transcript shape the collapse targets)."""
    reps = []
    for i in range(3):
        r = transcripts_pdf.copy()
        r["conv_id"] = r["conv_id"] + f"_rep{i}"
        reps.append(r)
    corpus = pd.concat(reps, ignore_index=True)
    tdf = spark.createDataFrame(corpus, schema=S.TRANSCRIPTS)
    kb = spark.createDataFrame(world.kb_clean, schema=S.KNOWLEDGE_BASE)
    sch = spark.createDataFrame(world.schemas, schema=S.RELATION_SCHEMAS)
    on = extract_triples(
        spark, tdf, kb, sch, collapse_duplicate_texts=True
    ).toPandas()
    off = extract_triples(
        spark, tdf, kb, sch, collapse_duplicate_texts=False
    ).toPandas()
    cols = sorted(on.columns)
    as_rows = lambda p: sorted(  # noqa: E731
        p[cols].itertuples(index=False, name=None)
    )
    assert len(on) == len(off) > 0
    assert as_rows(on) == as_rows(off)
    # Each replica must carry the full triple set (join-back fan-out
    # reaches every copy, not just one representative).
    per_rep = on.groupby(on.conv_id.str[-4:]).size()
    assert per_rep.nunique() == 1 and len(per_rep) == 3


def test_empty_input_yields_empty_triples(spark, world):
    """Degenerate input: zero turns must produce zero triples through
    the fused path without error (schema intact)."""
    empty = spark.createDataFrame([], schema=S.TRANSCRIPTS)
    kb = spark.createDataFrame(world.kb_clean, schema=S.KNOWLEDGE_BASE)
    sch = spark.createDataFrame(world.schemas, schema=S.RELATION_SCHEMAS)
    out = extract_triples(spark, empty, kb, sch)
    assert out.count() == 0
    assert set(TRIPLE_KEY).issubset(set(out.columns))


def test_all_miss_batch_yields_empty_not_crash(spark, world):
    """A partition whose every turn produces zero work units must
    yield an EMPTY Arrow batch with the declared schema — the
    all-float64 empty pandas default crashed streaming micro-batches
    with ArrowNotImplementedError on list<string>."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "conv_id": ["c1", "c2"],
            "turn_idx": [0, 0],
            "role": ["user"] * 2,
            "text": ["zzzz qqqq", "qqqq wwww"],  # match no KB entity
            "tool": [None] * 2,
            "ts": [pd.Timestamp("2026-01-01")] * 2,
        }
    )
    tdf = spark.createDataFrame(pdf, schema=S.TRANSCRIPTS)
    kb = spark.createDataFrame(world.kb_clean, schema=S.KNOWLEDGE_BASE)
    sch = spark.createDataFrame(world.schemas, schema=S.RELATION_SCHEMAS)
    out = extract_triples(spark, tdf, kb, sch)
    assert out.count() == 0


def test_fused_stage_rejects_out_of_regime_threshold(spark, world):
    """Direct misuse must be loud: the fused stage's fired/fallback
    split is only valid for 0.5 <= threshold < 1.0."""
    import pytest as _pytest

    from information_extraction_spark.operators import extract as ex

    kb = spark.createDataFrame(world.kb_clean, schema=S.KNOWLEDGE_BASE)
    kb_bc = ex.broadcast_kb(spark, kb)
    tdf = spark.createDataFrame(
        [("c", 0, "user", "x", None, None)], schema=S.TRANSCRIPTS
    )
    with _pytest.raises(ValueError, match="threshold"):
        ex.classify_tag_decode_stage(tdf, kb_bc, threshold=0.3)
