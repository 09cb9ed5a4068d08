"""Approximate/sketch operator tests — error-bounded, not oracle-exact.

These deliberately do NOT get driver oracle rows: HLL++ is exact in
sparse mode at small cardinality (sf0.01 would pass an exact oracle)
but drifts at sf0.1 (1501 vs 1500 measured), so an "exact" oracle would
be an artifact of the test scale, not a property of the operator. The
honest contract is a relative-error bound plus mergeability — the
property that makes sketches the 100 TB answer (partial sketches from
every partition union into the global answer without a second pass).
"""

from __future__ import annotations

from .conftest import SF_SMOKE


def test_approx_count_distinct_error_bound(spark):
    from pyspark.sql import functions as F

    from mapreduce_server_development_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    rows = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx"),
        F.countDistinct("user_id").alias("exact"),
    ).collect()
    assert rows
    for r in rows:
        assert abs(r.approx - r.exact) <= max(1, 0.03 * r.exact), r


def test_hll_sketch_estimate_and_mergeability(spark):
    """hll_sketch_agg partial sketches union (hll_union_agg) into the
    corpus-wide estimate — the map-side-combinable shape that lets a
    1000-executor job answer distinct-count without a global shuffle of
    raw values."""
    from pyspark.sql import functions as F

    from mapreduce_server_development_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    exact = ev.select(F.countDistinct("user_id")).collect()[0][0]

    direct = ev.select(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).collect()[0].est

    merged = (
        ev.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .select(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    for est in (direct, merged):
        assert abs(est - exact) <= max(1, 0.05 * exact), (est, exact)
    # Merging partials must agree with the single-pass sketch.
    assert merged == direct
