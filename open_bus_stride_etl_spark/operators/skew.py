"""Skew-handling join: key salting.

The reference never needed this (Postgres, single node), but at 100 TB a
handful of hot keys (one bus line with 100x the telemetry, one empty
journey_ref) turn a shuffle join into a straggler. AQE's skew-join
splitting (enabled in session.py) handles sort-merge cases at runtime;
explicit salting is the deterministic tool when the skewed side must
aggregate first or AQE can't kick in (e.g. a shuffle-hash join whose hot
partition is one key).

Mechanics: the big side gets a random-ish (but deterministic — hash of a
row id) salt in [0, n); the small side is replicated n times; the join
key becomes (key, salt), splitting each hot key across n reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    salt_by: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the big side salted
    ``n_salts`` ways. ``salt_by`` names a big-side column whose hash
    spreads rows (defaults to the join key's own row spread via
    ``xxhash64`` of all columns — deterministic, no rand()).

    The small side is replicated n_salts times (explode), so its shuffle
    volume grows n_salts x — cheap when small, which is the only case
    salting targets (a big-big skewed join wants AQE instead)."""
    salt_src = F.xxhash64(*[F.col(c) for c in ([salt_by] if salt_by else big.columns)])
    b = big.withColumn("_salt", F.pmod(salt_src, F.lit(n_salts)).cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, on=[on, "_salt"], how=how).drop("_salt")
