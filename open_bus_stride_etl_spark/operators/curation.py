"""Corpus curation operators: per-group quantile quality filtering and
deterministic source balancing (LLM training-data pipeline extensions;
no reference-repo analog — the reference is transit ETL).

Scale design — both operators avoid the trap their naive formulations
fall into at 100 TB:

- Quantile threshold WITHOUT a global sort: quality scores live in the
  bounded integer domain [0, 10000] (basis points), so the per-group
  k-th order statistic is computed from a per-(group, score) HISTOGRAM —
  a map-side-combined aggregation of at most 10001 rows per group —
  instead of rank-over-partition, which would sort one giant shuffle
  partition per group. The tiny threshold table broadcasts back; the
  keep-filter is map-local.
- Source balancing WITHOUT per-source ranking: per-source keep RATES
  (derived from one tiny count aggregation) turn into a deterministic
  md5-bucket filter — map-local after a broadcast join, reproducible
  across reruns and repartitionings, no quota sort. The k-th order
  statistic is tie-safe (the VALUE at rank k is deterministic even when
  row order among ties is not), which is what makes both operators
  exactly oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hex_to_long


def quantile_threshold_filter(
    scored: DataFrame,
    group_col: str,
    score_col: str,
    keep_top_n_of: tuple[int, int] = (1, 5),
) -> DataFrame:
    """Keep the top ``num/den`` fraction of rows per group by integer
    score, tie-inclusive: threshold t = the k-th highest score where
    k = ceil(n * num / den), keep rows with score >= t (ties at the
    threshold are all kept — deterministic, unlike an arbitrary tiebreak).

    Adds ``thr_<score_col>`` (the group's threshold) to the output.
    ``score_col`` must be integral and bounded (basis points) — that is
    what makes the histogram formulation exact and tiny."""
    num, den = keep_top_n_of
    hist = scored.groupBy(group_col, score_col).agg(F.count(F.lit(1)).alias("_c"))
    w_desc = (
        Window.partitionBy(group_col)
        .orderBy(F.col(score_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group_col)
    cum = hist.select(
        group_col,
        score_col,
        F.sum("_c").over(w_desc).alias("_n_ge"),
        F.sum("_c").over(w_all).alias("_n"),
    )
    k = F.expr(f"div(_n * {num} + {den} - 1, {den})")  # ceil(n*num/den), pure integers
    thr = (
        cum.where(F.col("_n_ge") >= k)
        .groupBy(group_col)
        .agg(F.max(score_col).alias(f"thr_{score_col}"))
    )
    return scored.join(F.broadcast(thr), on=group_col).where(
        F.col(score_col) >= F.col(f"thr_{score_col}")
    )


def hash_bucket_bp(key: Column, seed: str = "") -> Column:
    """Deterministic basis-point bucket in [0, 10000) from md5 of the
    (seed-salted) key — the same engine-portable membership primitive
    as operators/sampling.py, at rate resolution. Distinct pipeline
    stages MUST use distinct seeds: two stages sharing the unsalted
    stream make correlated selections (e.g. the docs a balance stage
    keeps would be exactly the docs an upsample stage duplicates)."""
    return (
        hex_to_long(F.substring(F.md5(F.concat(F.lit(seed), key.cast("string"))), 1, 10))
        % 10000
    )


def source_rates(
    docs: DataFrame,
    source_col: str = "source",
) -> DataFrame:
    """Per-source keep-rate table for uniform source mixing:
    ``(source, n_docs, rate_bp)`` with rate_bp =
    floor(min_n * 10000 / n_source) — one tiny aggregation, meant to be
    broadcast into the membership filter."""
    counts = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    min_n = counts.agg(F.min("n_docs").alias("_min_n"))
    return counts.crossJoin(F.broadcast(min_n)).select(
        source_col,
        "n_docs",
        F.expr("div(_min_n * 10000, n_docs)").cast("long").alias("rate_bp"),
    )


def balanced_docs(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    rates: DataFrame | None = None,
) -> DataFrame:
    """The balanced corpus itself: every ``docs`` column, restricted to
    the rows that survive source balancing (md5-bucket membership under
    the per-source rate). This is the composable pipeline stage —
    ``balance_sources`` reports the same selection as per-source stats.

    Membership depends only on the doc id and the broadcast rate table:
    map-local, reproducible across engines, reruns and repartitionings.
    Pass a precomputed ``rates`` (from ``source_rates``) to share one
    rate table across the stats and corpus outputs."""
    if rates is None:
        rates = source_rates(docs, source_col)
    return (
        docs.join(F.broadcast(rates.select(source_col, "rate_bp")), on=source_col)
        .where(hash_bucket_bp(F.col(id_col)) < F.col("rate_bp"))
        .drop("rate_bp")
    )


def balance_sources(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Downsample every source to ~the smallest source's size (uniform
    source mixing): per-source keep rate (basis points) =
    floor(min_n * 10000 / n_source); a doc survives when its
    deterministic md5 bucket falls under its source's rate. Returns
    per-source stats: n_docs, rate_bp, n_kept — for the balanced corpus
    itself use ``balanced_docs`` (same broadcast rate table, same
    membership rule).

    Exact-by-construction across engines AND across cluster layouts:
    membership depends only on the doc id, never on partitioning or row
    order. The rate table is one tiny aggregation + broadcast; the
    filter is map-local (this is the 100 TB-safe shape — a per-source
    rank/quota would sort giant single-source partitions)."""
    rates = source_rates(docs, source_col)
    kept = (
        docs.select(source_col, hash_bucket_bp(F.col(id_col)).alias("_b"))
        .join(F.broadcast(rates), on=source_col)
        .where(F.col("_b") < F.col("rate_bp"))
        .groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    # kept is one row per source (tiny by construction) — broadcast it so
    # the stats join never sort-merges
    return (
        rates.join(F.broadcast(kept), on=source_col, how="left")
        .select(
            source_col,
            "n_docs",
            "rate_bp",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


def epoch_upsample(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: str = "mix",
) -> DataFrame:
    """Fractional-epoch data mixing: materialize each document
    ``weight`` times, where per-source weights are fractional (the
    standard corpus-mixing spec — e.g. books 2.3 epochs, web 0.8).
    ``weights`` is a tiny ``(source, weight_bp)`` table (basis points:
    10000 = 1.0 epoch). Every document gets ``weight_bp // 10000``
    guaranteed copies plus one more iff its deterministic md5 bucket
    falls under the fractional remainder — so exactly the right
    fraction of each source repeats, reproducibly across engines and
    repartitionings (same doctrine as deterministic_sample). Output:
    one row per materialized copy ``(doc_id, source, copy_idx)``.

    Scale shape: the weights table broadcasts (it is |sources| rows);
    copy materialization is a map-local explode of a bounded sequence —
    no shuffle at all. Downstream, compose with ``shard_shuffle`` on
    (doc_id, copy_idx) to interleave the copies through the training
    order instead of clustering them."""
    n = F.expr("weight_bp div 10000") + F.when(
        hash_bucket_bp(F.col(id_col), seed) < F.col("weight_bp") % 10000, 1
    ).otherwise(0)
    return (
        docs.join(F.broadcast(weights), on=source_col)
        .withColumn("_n", n)
        # guard: sequence(1, 0) DESCENDS in Spark — empty array instead
        .withColumn(
            "_copies",
            F.when(F.col("_n") > 0, F.sequence(F.lit(1), F.col("_n"))).otherwise(
                F.array()
            ),
        )
        .select(F.col(id_col), F.col(source_col), F.explode("_copies").alias("copy_idx"))
        .select(
            F.col(id_col), F.col(source_col), F.col("copy_idx").cast("long").alias("copy_idx")
        )
    )


def leakage_safe_split(
    docs: DataFrame,
    components: DataFrame | None = None,
    weights_bp: dict[str, int] | None = None,
    id_col: str = "doc_id",
    seed: str = "split",
) -> DataFrame:
    """Train/val/test assignment with a DUPLICATE-LEAKAGE guard: the
    split key is the document's near-dup COMPONENT id (``components`` =
    ``(doc_id, component_id)`` from ``dedup.connected_components``) when
    it has one, else the doc id — so an entire near-duplicate group
    lands in ONE split, and a test document can never have a training
    twin. Splitting by plain doc hash silently leaks: with 10% dups a
    naive 90/5/5 split puts ~9.5% of test docs' near-copies in train.

    Membership is the engine's deterministic md5-bucket rule
    (reproducible across engines/reruns/partitionings; salt with
    ``seed`` so this decision stream is independent of every other
    hash-membership stage — curation.py:hash_bucket_bp doctrine).
    ``weights_bp`` maps split name -> basis points, must sum to 10000;
    cut points follow dict order. Output: ``(id_col, split)``.

    Scale shape: one left join against the slim component table (the
    dedup pipeline already materialized it) + a map-side bucket compare;
    nothing else shuffles."""
    weights_bp = weights_bp or {"train": 9000, "val": 500, "test": 500}
    if sum(weights_bp.values()) != 10000:
        raise ValueError("weights_bp must sum to 10000")
    if components is not None:
        comp = components.select(
            F.col("doc_id").alias(id_col), F.col("component_id").alias("_comp")
        )
        keyed = docs.select(id_col).join(comp, on=id_col, how="left")
        key = F.coalesce(F.col("_comp"), F.col(id_col))
    else:
        keyed = docs.select(id_col)
        key = F.col(id_col)
    bucket = hash_bucket_bp(key, seed)
    expr = None
    lo = 0
    for name, w in weights_bp.items():
        cond = (bucket >= lo) & (bucket < lo + w)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += w
    return keyed.select(F.col(id_col), expr.alias("split"))
