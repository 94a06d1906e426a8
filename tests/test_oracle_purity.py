"""oracle_sql() purity (round-5 verdict item): the driver-facing
oracle mapping must be a pure function of (catalog, sf_dir) —
identical whether or not any query has executed — and every
golden-based oracle must resolve through an ORACLE_TEMPLATES entry
rather than only via the runtime re-point side effect."""

from __future__ import annotations

from information_extraction_spark import driver_queries as dq


def test_every_golden_oracle_has_a_pure_template():
    golden = {n for n, s in dq.ORACLES.items() if "ie_spark_golden" in s}
    templated = set()
    for m in dq._MODULES:
        templated |= set(getattr(m, "ORACLE_TEMPLATES", {}))
    assert golden == templated
    # templates must be registered for known queries only
    assert templated <= set(dq.QUERIES)


def test_materialize_oracles_is_sf_derived_and_default_consistent():
    """At the driver-gate sf (0.01) the pure templates reproduce the
    import-time snapshot byte-for-byte; at another sf every
    golden-based oracle re-derives (different golden path) while the
    static oracles are unchanged."""
    at_001 = dq.materialize_oracles("/root/testdata/sf0.01")
    assert at_001 == {
        **{k: dq.ORACLES[k] for k in dq._CHANGED_THIS_ROUND
           if k in dq.ORACLES},
        **dq.ORACLES,
    }
    other = dq.materialize_oracles("/root/testdata/sf0.001")
    golden = {n for n, s in dq.ORACLES.items() if "ie_spark_golden" in s}
    for n in golden:
        assert other[n] != at_001[n], n
        assert "sf0.001" in other[n], n
    for n in set(at_001) - golden:
        assert other[n] == at_001[n], n


def test_oracle_sql_is_call_order_independent(spark):
    """Running a golden-re-pointing query at a NON-default sf must
    not change what oracle_sql()/materialize_oracles return — the
    exact coupling the round-4 verdict flagged (ORACLES[name]
    mutated inside query bodies at call time)."""
    import __spark_entry__ as e

    before = e.oracle_sql()
    pure_before = dq.materialize_oracles("/root/testdata/sf0.001")
    # kg_triple_support re-points ORACLES['kg_triple_support'] at the
    # sf0.001 golden as a side effect of running.
    dq.QUERIES["kg_triple_support"](spark, "/root/testdata/sf0.001").count()
    assert dq.current_oracle("kg_triple_support") != before[
        "kg_triple_support"
    ]  # the live dict DID move (post-run lookup still works) ...
    assert e.oracle_sql() == before  # ... but the driver API did not
    assert dq.materialize_oracles("/root/testdata/sf0.001") == pure_before
    # and the pure template equals what the runtime re-point installed
    assert (
        dq.current_oracle("kg_triple_support", "/root/testdata/sf0.001")
        == dq.current_oracle("kg_triple_support")
    )
