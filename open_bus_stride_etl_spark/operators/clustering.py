"""Distributed Lloyd's k-means over embedding columns — the centroid
trainer behind the IVF ANN index (operators/similarity.py:ann_ivf_topk
uses deterministic pivots; a real deployment trains them, and THIS is
the trainer). No reference-repo analog (the reference is transit ETL);
BASELINE.json extension.

Cross-engine exactness doctrine (plans/registry.py docstring): every
arithmetic step is integer — components are micro-unit quantized
(float32 -> double -> round, operators/similarity.py:quantized_vec),
distances are exact int64 sums of squares, and centroid means are
exact integer floor-division — so a fixed-iteration run is bit-identical
in any engine and the DuckDB oracle can unroll the same iterations as
chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import quantized_vec
from .util import track_persist


def kmeans_assignments(
    embs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
) -> DataFrame:
    """``(id, cluster)`` assignment only — see ``kmeans_fit``."""
    return kmeans_fit(embs, id_col=id_col, vec_col=vec_col, k=k, iters=iters)[0]


def kmeans_fit(
    embs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """``(assignments, centroids)`` after ``iters`` Lloyd rounds —
    ``centroids`` is the long-format ``(cluster, pos, cq)`` table the
    returned assignment was computed against: exactly the persistable
    IVF index artifact (write it as parquet, reload it to assign/probe
    new vectors without retraining — plans/llm_tasks.py:
    llm_build_ann_index / llm_ann_query).

    ``(id, cluster)`` after ``iters`` Lloyd rounds: seeds are the k
    lowest-id vectors (cluster = seed rank), each round assigns every
    point to its nearest centroid (squared L2 on quantized ints, ties to
    the lowest cluster id) and recomputes centroids as the exact integer
    floor-mean of members; clusters that lose all members keep their
    previous centroid. The returned assignment is the one computed
    against the round-``iters-1`` centroids — i.e. the labels a round-
    ``iters`` update would aggregate.

    Scale shape (the standard Spark k-means layout, cf. MLlib):
    - Points live in long format ``(id, pos, q)`` and are persisted —
      each Lloyd round is one scan of that table, never of the raw
      corpus.
    - Centroids are k x dim ≈ a few KB: they ride to executors as a
      broadcast-joined literal DataFrame, and each update round collects
      only that much back to the driver (breaking lineage growth — the
      iterative-plan trap).
    - Distance evaluation is an explode-free pos-equi-join + one
      map-side-combinable SUM per (point, cluster): no shuffle keyed by
      anything wider than the point id.
    """
    spark = embs.sparkSession
    pts = track_persist(
        embs.select(F.col(id_col).alias("id"), F.posexplode(quantized_vec(vec_col)))
        .select("id", (F.col("pos") + 1).alias("pos"), F.col("col").alias("q"))
    )

    seed_ids = [r[0] for r in embs.select(id_col).orderBy(id_col).limit(k).collect()]
    rank = {vid: i for i, vid in enumerate(seed_ids)}
    cents: dict[tuple[int, int], int] = {
        (rank[r["id"]], r["pos"]): r["q"]
        for r in pts.where(F.col("id").isin(seed_ids)).collect()
    }

    def _assign(centroids: dict) -> DataFrame:
        cdf = spark.createDataFrame(
            [(cl, pos, cq) for (cl, pos), cq in centroids.items()],
            "cluster long, pos int, cq long",
        )
        d = (
            pts.join(F.broadcast(cdf), on="pos")
            .groupBy("id", "cluster")
            .agg(F.sum((F.col("q") - F.col("cq")) * (F.col("q") - F.col("cq"))).alias("d2"))
        )
        # lexicographic struct-min = (min d2, then min cluster): the
        # deterministic tie-break the oracle reproduces with its
        # min-distance + min-cluster pair of aggregates.
        return (
            d.groupBy("id")
            .agg(F.min(F.struct("d2", "cluster")).alias("mn"))
            .select("id", F.col("mn.cluster").cast("long").alias("cluster"))
        )

    for t in range(iters):
        a = _assign(cents)
        if t == iters - 1:
            cdf = spark.createDataFrame(
                [(cl, pos, cq) for (cl, pos), cq in sorted(cents.items())],
                "cluster long, pos int, cq long",
            )
            return a.select(F.col("id").alias(id_col), "cluster"), cdf
        upd = (
            a.join(pts, on="id")
            .groupBy("cluster", "pos")
            .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("n"))
            # exact integer floor-mean: subtract pmod first so div is
            # exact (and floor == trunc), identical to the oracle's
            # (SUM - ((SUM % n) + n) % n) // n
            .select(
                "cluster", "pos",
                F.expr("CAST((s - pmod(s, n)) div n AS BIGINT)").alias("cq"),
            )
            .collect()
        )
        # merge over the previous round: clusters with no members keep
        # their old centroid
        cents = {**cents, **{(r["cluster"], r["pos"]): r["cq"] for r in upd}}
    raise AssertionError("unreachable: iters >= 1 returns inside the loop")
