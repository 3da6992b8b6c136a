"""Skew-mitigation operators — the explicit two-phase forms of work that
a single shuffle would funnel through one hot task.

Where skew is handled elsewhere in this engine:
- JOIN skew: AQE's skew-join splitting is enabled session-wide
  (session.py RUNTIME_CONFS) and handles sort-merge cases at runtime;
  ``salted_join`` below is the deterministic explicit tool for when the
  skewed side must aggregate first or AQE can't kick in (e.g. a
  shuffle-hash join whose hot partition is one key).
- Plain aggregations (sum/count/min/max): Spark's hash aggregate always
  does map-side partial aggregation, so a hot groupBy key never ships
  more than one partial row per map task.

What AQE does NOT fix is per-key WINDOW work: row_number / top-k
partitioned by a skewed key puts the hot key's every row into one task,
and distinct-per-key puts its whole value set into one aggregation
state. The operators here are the exact (result-identical) two-phase
rewrites:

- ``topk_per_key_salted``: phase 1 ranks within (key, salt) — the hot
  key's rows spread over ``n_salts`` tasks, each keeping <= k rows —
  then phase 2 re-ranks the <= k * n_salts survivors per key. Correct
  because top-k under a TOTAL order is mergeable: top-k of a union is
  the top-k of the parts' top-k's. The order must be total (include a
  unique tiebreaker column) or ranks are arbitrary in both forms.
- ``distinct_count_two_phase``: groupBy(key, value).count -> the first
  shuffle spreads a hot key across partitions by value and map-side
  combine collapses duplicates early; the second aggregation counts
  slim (key, value) survivors. Exact, unlike approx_count_distinct,
  and never materializes a per-key set in one task's state.

Cost note (measured doctrine, CLAUDE.md): two phases = two shuffles, so
on UNIFORM data these are slower than the single-shuffle forms — they
are the shape you switch to when a key-frequency histogram (one cheap
groupBy.count) shows a hot key, not a default. The registered queries
keep the single-window forms; result equality is pinned by tests
running both paths on skewed and uniform data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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

    Mechanics: the big side gets a deterministic salt in [0, n); the
    small side is replicated n times (explode); the join key becomes
    (key, salt), splitting each hot key across n reducers. The small
    side's shuffle volume grows n_salts x — cheap when small, which is
    the only case salting targets (a big-big skewed join wants AQE
    instead)."""
    salt_src = F.xxhash64(*[F.col(c) for c in ([salt_by] if salt_by else big.columns)])
    b = big.withColumn("_salt", F.pmod(salt_src, F.lit(n_salts)).cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, on=[on, "_salt"], how=how).drop("_salt")


def topk_per_key_salted(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list,
    k: int,
    n_salts: int = 16,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-``k`` rows per key under a TOTAL order, computed in two
    salted phases so a hot key spreads over ``n_salts`` tasks.

    ``order_cols``: list of Columns (e.g. ``[F.col("ts").desc(),
    F.col("event_id").asc()]``) defining a total order — include a
    unique tiebreaker or the selected rows are arbitrary (in the plain
    window form too). Emits the input columns plus ``rank_col``."""
    # salt from a hash of the full row's order-defining expressions:
    # xxhash64 over every column keeps the same key's rows uniformly
    # spread regardless of value skew WITHIN the key
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).alias("_salt")
    w1 = Window.partitionBy(*key_cols, "_salt").orderBy(*order_cols)
    phase1 = (
        df.select("*", salt)
        .withColumn("_rn1", F.row_number().over(w1))
        .where(F.col("_rn1") <= k)
        .drop("_salt", "_rn1")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        phase1.withColumn(rank_col, F.row_number().over(w2))
        .where(F.col(rank_col) <= k)
    )


def distinct_count_two_phase(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key without a per-key set in one
    task: dedup on (key, value) first (map-side combine collapses
    repeats of a hot key's popular values before the shuffle), then
    count the slim survivors."""
    return (
        df.select(*key_cols, value_col)
        .groupBy(*key_cols, value_col)
        .agg(F.lit(1))
        .groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias(out_col))
    )
