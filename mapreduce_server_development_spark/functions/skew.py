"""Skew mitigation: salted joins.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting is the manual tool for pathological keys or
for engines/paths where AQE can't see the skew (e.g. a join feeding
a window). Semantics are identical to the plain join — only the
shuffle layout changes: the probe side spreads each hot key over
``num_salts`` sub-partitions, the build side is replicated
``num_salts``-fold (cheap when it's the smaller input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    num_salts: int = 8,
    salt_src: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join with the probe side salted into ``num_salts`` sub-keys.

    ``salt_src`` names a high-cardinality probe column used to derive
    the deterministic salt (defaults to the join key itself, which
    only helps if values within the hot key differ — pass a row-unique
    column like the fact table's primary key for real skew).
    The build side is exploded once per salt value; result equals
    ``probe.join(build, on, how)`` exactly for probe-preserving joins.
    ``right``/``full``/``right_semi``/``right_anti`` are rejected: an
    unmatched build row exists once per salt replica, so those joins
    would emit it ``num_salts`` times instead of once.
    """
    if how.replace("_", "").lower() not in {
        "inner",
        "left",
        "leftouter",
        "cross",
        "leftsemi",
        "semi",
        "leftanti",
        "anti",
    }:
        raise ValueError(
            f"salted_join cannot preserve {how!r} semantics: the "
            "replicated build side would duplicate unmatched build rows"
        )
    salt = F.pmod(F.hash(F.col(salt_src or on)), F.lit(num_salts))
    p = probe.withColumn("__salt", salt)
    b = build.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return p.join(b, [on, "__salt"], how).drop("__salt")
