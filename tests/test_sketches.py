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


def test_hll_vocab_query_error_bound(spark):
    """q_hll_vocab's first-principles HLL (m=1024 -> ~3.25% std error)
    must land within 4 std errors of the exact per-lang vocabulary, and
    the estimate must be derived from the integer register sum alone."""
    from mapreduce_server_development_spark.plans import QUERIES

    import math

    rows = QUERIES["q_hll_vocab"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # Apply the linear-counting correction exactly as the query
        # docstring instructs callers: the raw estimator is biased high
        # when most registers are empty (E <= 2.5m).
        est = r.hll_estimate
        if est <= 2.5 * 1024 and r.empty_regs > 0:
            est = round(1024 * math.log(1024 / r.empty_regs))
        assert abs(est - r.exact_vocab) <= max(5, 0.13 * r.exact_vocab), (r, est)
        # s_scaled is the full 1024-register harmonic sum scaled by
        # 2^39: it can never exceed all-empty (1024 * 2^39).
        assert 0 < r.s_scaled <= 1024 * (1 << 39), r


def test_cms_estimates_are_one_sided(spark):
    """Count-min never under-counts: est >= exact for every probe key,
    and with w=512 >> 20 heavy hitters the overcount stays small."""
    from mapreduce_server_development_spark.plans import QUERIES

    rows = QUERIES["q_cms_heavy_hitters"](spark, SF_SMOKE).collect()
    assert len(rows) == 20
    total = sum(r.exact_cnt for r in rows)
    for r in rows:
        assert r.cms_est >= r.exact_cnt, r
        # eps = e/w ~ 0.5% of the total stream per row; min over 4
        # rows makes exceeding 5% of stream mass vanishingly unlikely.
        assert r.overcount <= max(5, 0.05 * total), (r, total)


def test_bloom_semijoin_no_false_negatives(spark):
    """A Bloom filter admits false positives but NEVER false negatives:
    every true semi-join match must pass the filter."""
    from mapreduce_server_development_spark.plans import QUERIES

    row = QUERIES["q_bloom_semijoin"](spark, SF_SMOKE).collect()[0]
    assert row.n_bloom_pass >= row.n_true
    assert row.n_false_pos == row.n_bloom_pass - row.n_true
    # ~13 bits/key at k=3 -> expected FP rate ~2-5%; 15% is the alarm.
    non_members = row.n_probe - row.n_true
    if non_members:
        assert row.n_false_pos <= max(3, 0.15 * non_members), row
