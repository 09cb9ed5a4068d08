"""Audience-overlap analytics: exact segment intersections + KMV audit.

The segmentation staple behind ad-targeting and cohort tooling: given
per-segment audiences (here: the distinct customers who placed an
order at each ``o_orderpriority``), report every pairwise overlap —
|A∩B|, Jaccard, and lift vs independence — exactly, and then estimate
the same Jaccard with a KMV (bottom-k minimum-values, Bar-Yossef et
al. 2002) sketch whose error the exact tier audits, the same
estimate-vs-exact pairing as ``q_minhash_estimate_audit``.

No reference counterpart (the reference's surface is wc/grep
executables — ``/root/reference/tests/testdata/exec``); both operators
are public knowledge (KMV / bottom-k distinct sketches, k-minimum
values Jaccard estimation).

Cross-engine discipline (the sketches.py house rules): hashes are
positional-decoded md5 spans both engines replay digit-for-digit;
every count is an exact integer; the float readouts (Jaccard, lift,
estimator error) are single shared SQL texts over those exact
integers, rounded before output.

Scale: the audience relation is one distinct shuffle on
(segment, user). Exact pair counts fan out ≤ C(|segments|,2) rows per
user keyed by user (map-side combined); the sketch tier collapses to
|segments|·k rows before ANY pairwise work. The only windows run over
(segment, hash-bucket) chunks and the bounded |segments|·k candidate
relation — never a data-scale or low-cardinality-key sort (the
q_value_anomaly defect class).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query
from .sketches import _hexval_col, _hexval_sql

# ---------------------------------------------------------------------------
# q_audience_overlap — exact pairwise segment overlap / Jaccard / lift
# ---------------------------------------------------------------------------

#: Shared readout over exact integer counts (n_a, n_b, n_overlap, nu).
_AO_FINAL = (
    "ta",
    "tb",
    "CAST(n_a AS BIGINT) AS n_a",
    "CAST(n_b AS BIGINT) AS n_b",
    "CAST(novl AS BIGINT) AS n_overlap",
    "round(CAST(novl AS DOUBLE)"
    " / CAST(n_a + n_b - novl AS DOUBLE), 6) + 0.0 AS jaccard",
    "round(CAST(novl AS DOUBLE) * CAST(nu AS DOUBLE)"
    " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) + 0.0 AS lift",
)

#: The audience relation: one row per (segment, customer).
_AUD_SQL = (
    "SELECT DISTINCT o_orderpriority AS t, o_custkey AS u FROM orders"
)


@query(
    "q_audience_overlap",
    oracle=f"""
    WITH aud AS ({_AUD_SQL}),
    sz AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM aud GROUP BY t),
    tot AS (
        SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nu FROM orders
    ),
    ix AS (
        SELECT a.t AS ta, b.t AS tb, CAST(COUNT(*) AS BIGINT) AS novl
        FROM aud a JOIN aud b ON a.u = b.u AND a.t < b.t
        GROUP BY a.t, b.t
    )
    SELECT {", ".join(_AO_FINAL)}
    FROM (SELECT ix.ta, ix.tb, sa.n AS n_a, sb.n AS n_b, ix.novl, tot.nu
          FROM ix JOIN sz sa ON sa.t = ix.ta
                  JOIN sz sb ON sb.t = ix.tb
                  CROSS JOIN tot)
    ORDER BY ta, tb
    """,
)
def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise audience overlap between order-priority
    segments: |A∩B|, Jaccard, and lift (overlap vs the independence
    expectation |A|·|B|/N — >1 means the segments co-select
    customers). The ground truth q_audience_kmv's sketch is audited
    against.

    Scale: one distinct shuffle builds the (segment, customer)
    audience; the intersection self-join is keyed by CUSTOMER, so
    each customer fans out to at most C(|segments|,2) = 10 pair rows
    (segment domain bounded, documented), partial-aggregated
    map-side. Segment sizes are a |segments|-row aggregate joined
    back by broadcast. No windows anywhere.
    """
    orders = load_table(spark, sf_dir, "orders")
    aud = orders.selectExpr(
        "o_orderpriority AS t", "o_custkey AS u"
    ).distinct()
    sz = aud.groupBy("t").agg(F.count("*").cast("long").alias("n"))
    tot = orders.agg(
        F.countDistinct("o_custkey").cast("long").alias("nu")
    )
    a = aud.selectExpr("t AS ta", "u")
    b = aud.selectExpr("t AS tb", "u AS u2")
    ix = (
        a.join(b, (F.col("u") == F.col("u2")) & (F.col("ta") < F.col("tb")))
        .groupBy("ta", "tb")
        .agg(F.count("*").cast("long").alias("novl"))
    )
    out = (
        ix.join(
            F.broadcast(sz.selectExpr("t AS ta", "n AS n_a")), "ta"
        )
        .join(F.broadcast(sz.selectExpr("t AS tb", "n AS n_b")), "tb")
        .crossJoin(F.broadcast(tot))
    )
    return out.selectExpr(*_AO_FINAL).orderBy("ta", "tb")


# ---------------------------------------------------------------------------
# q_audience_kmv — KMV bottom-k sketch estimate of the same Jaccard
# ---------------------------------------------------------------------------

_KMV_K = 64
#: 15 hex digits = 60 bits — inside a signed BIGINT for both engines.
_KMV_DIGITS = 15
#: Hash-bucket fan-out for the chunked per-segment bottom-k (stage 1
#: keeps k per (segment, h % 64) chunk; stage 2 ranks the bounded
#: 64·k candidates per segment).
_KMV_BUCKETS = 64

_KMV_FINAL = (
    "ta",
    "tb",
    f"CAST({_KMV_K} AS BIGINT) AS k",
    "CAST(usz AS BIGINT) AS union_sample",
    "CAST(matches AS BIGINT) AS matches",
    "round(CAST(matches AS DOUBLE) / CAST(usz AS DOUBLE), 6) + 0.0"
    " AS jaccard_est",
    "round(CAST(novl AS DOUBLE)"
    " / CAST(n_a + n_b - novl AS DOUBLE), 6) + 0.0 AS jaccard_exact",
    "round(abs(CAST(matches AS DOUBLE) / CAST(usz AS DOUBLE)"
    " - CAST(novl AS DOUBLE) / CAST(n_a + n_b - novl AS DOUBLE)), 6)"
    " + 0.0 AS abs_err",
)


@query(
    "q_audience_kmv",
    oracle=f"""
    WITH aud AS ({_AUD_SQL}),
    h AS (
        SELECT t,
               {_hexval_sql("md5('kmv:' || CAST(u AS VARCHAR))", _KMV_DIGITS)}
                   AS h
        FROM aud
    ),
    bot AS (
        SELECT t, h FROM (
            SELECT t, h,
                   ROW_NUMBER() OVER (PARTITION BY t ORDER BY h) AS rk
            FROM h
        ) WHERE rk <= {_KMV_K}
    ),
    tp AS (
        SELECT a.t AS ta, b.t AS tb
        FROM (SELECT DISTINCT t FROM aud) a
        JOIN (SELECT DISTINCT t FROM aud) b ON a.t < b.t
    ),
    e AS (
        SELECT tp.ta, tp.tb, bot.h, 1 AS ia, 0 AS ib
        FROM tp JOIN bot ON bot.t = tp.ta
        UNION ALL
        SELECT tp.ta, tp.tb, bot.h, 0, 1
        FROM tp JOIN bot ON bot.t = tp.tb
    ),
    g AS (
        SELECT ta, tb, h, MAX(ia) AS ia, MAX(ib) AS ib
        FROM e GROUP BY ta, tb, h
    ),
    u AS (
        SELECT ta, tb, ia, ib,
               ROW_NUMBER() OVER (PARTITION BY ta, tb ORDER BY h) AS r
        FROM g
    ),
    s AS (
        SELECT ta, tb, CAST(COUNT(*) AS BIGINT) AS usz,
               CAST(SUM(ia * ib) AS BIGINT) AS matches
        FROM u WHERE r <= {_KMV_K} GROUP BY ta, tb
    ),
    sz AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM aud GROUP BY t),
    ix AS (
        SELECT a.t AS ta, b.t AS tb, CAST(COUNT(*) AS BIGINT) AS novl
        FROM aud a JOIN aud b ON a.u = b.u AND a.t < b.t
        GROUP BY a.t, b.t
    )
    SELECT {", ".join(_KMV_FINAL)}
    FROM (SELECT s.ta, s.tb, s.usz, s.matches, ix.novl,
                 sa.n AS n_a, sb.n AS n_b
          FROM s JOIN ix ON ix.ta = s.ta AND ix.tb = s.tb
                 JOIN sz sa ON sa.t = s.ta
                 JOIN sz sb ON sb.t = s.tb)
    ORDER BY ta, tb
    """,
)
def q_audience_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k minimum values) sketch estimate of pairwise
    audience Jaccard, audited against the exact tier: keep each
    segment's k=64 smallest md5 hashes of its members; for a pair,
    the k smallest of the union U is a uniform sample of A∪B, and
    |{h ∈ U present in both bottom-k sets}| / |U| estimates J(A,B)
    (Bar-Yossef et al. 2002). The sketch is what ships at 100 TB —
    |segments|·k rows move, not audiences — and this query reports
    its measured absolute error next to the exact answer.

    Determinism: the hash is the house positional-decoded md5 span
    (engine-replayable); ranks, union samples, and match counts are
    exact integers; estimate/exact/error are one shared text.

    Scale: per-segment bottom-k is two-phase — rank within
    (segment, h % 64) hash chunks (parallelism |segments|·64, k kept
    per chunk), then rank the ≤64·k bounded candidates per segment —
    never a data-scale sort on a low-cardinality key. Everything
    pairwise happens on the |segments|·k sketch relation. The exact
    audit tier reuses q_audience_overlap's user-keyed shape.
    """
    orders = load_table(spark, sf_dir, "orders")
    aud = orders.selectExpr(
        "o_orderpriority AS t", "o_custkey AS u"
    ).distinct()
    h = aud.select(
        "t",
        _hexval_col(
            F.md5(F.concat(F.lit("kmv:"), F.col("u").cast("string"))),
            _KMV_DIGITS,
        ).alias("h"),
    )
    w1 = Window.partitionBy(
        "t", (F.col("h") % _KMV_BUCKETS).alias("bk")
    ).orderBy("h")
    cand = (
        h.withColumn("rk", F.row_number().over(w1))
        .filter(F.col("rk") <= _KMV_K)
        .drop("rk")
    )
    w2 = Window.partitionBy("t").orderBy("h")
    bot = (
        cand.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= _KMV_K)
        .select("t", "h")
    )
    types = aud.select("t").distinct()
    tp = types.selectExpr("t AS ta").join(
        F.broadcast(types.selectExpr("t AS tb")), F.col("ta") < F.col("tb")
    )
    ea = tp.join(
        bot.selectExpr("t AS ta", "h"), "ta"
    ).select("ta", "tb", "h", F.lit(1).alias("ia"), F.lit(0).alias("ib"))
    eb = tp.join(
        bot.selectExpr("t AS tb", "h"), "tb"
    ).select("ta", "tb", "h", F.lit(0).alias("ia"), F.lit(1).alias("ib"))
    g = (
        ea.unionAll(eb)
        .groupBy("ta", "tb", "h")
        .agg(F.max("ia").alias("ia"), F.max("ib").alias("ib"))
    )
    w3 = Window.partitionBy("ta", "tb").orderBy("h")
    s = (
        g.withColumn("r", F.row_number().over(w3))
        .filter(F.col("r") <= _KMV_K)
        .groupBy("ta", "tb")
        .agg(
            F.count("*").cast("long").alias("usz"),
            F.sum(F.col("ia") * F.col("ib")).cast("long").alias("matches"),
        )
    )
    sz = aud.groupBy("t").agg(F.count("*").cast("long").alias("n"))
    a = aud.selectExpr("t AS ta", "u")
    b = aud.selectExpr("t AS tb", "u AS u2")
    ix = (
        a.join(b, (F.col("u") == F.col("u2")) & (F.col("ta") < F.col("tb")))
        .groupBy("ta", "tb")
        .agg(F.count("*").cast("long").alias("novl"))
    )
    out = (
        s.join(ix, ["ta", "tb"])
        .join(F.broadcast(sz.selectExpr("t AS ta", "n AS n_a")), "ta")
        .join(F.broadcast(sz.selectExpr("t AS tb", "n AS n_b")), "tb")
    )
    return out.selectExpr(*_KMV_FINAL).orderBy("ta", "tb")

