"""Embedding similarity search: brute-force cosine top-k (baseline) and
an LSH-bucketed approximate variant (the scale path).

Numeric portability: embeddings are quantized to integer micro-units
(round(x * 1e6) as bigint) so dot products and norms are EXACT integer
sums — order-free, overflow-free (|x| < 1 => |q| <= 1e6, 64-dim dot <=
6.4e13 << 2^63), identical on every engine. The only floating-point
steps are one sqrt and one division on identical integers, both IEEE
correctly-rounded => bit-identical cosine scores.

Scale design: brute-force is one equi-free cross join restricted to the
(small, broadcast) query set — fine for "k queries vs corpus". The LSH
variant buckets by the sign pattern of the leading dimensions, turning
candidate generation into an equi-join on the bucket id; recall is
tunable by bucket bits / multi-probe, and the final scoring only touches
bucket-mates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 1_000_000


def quantized_components(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, pos, q) rows with q = round(x * 1e6) as bigint."""
    # float32 -> double BEFORE the multiply: both engines must quantize
    # the same exact double value or dot products drift.
    return emb.select(
        F.col(id_col), F.posexplode(F.col(vec_col)).alias("pos", "x")
    ).select(
        F.col(id_col),
        F.col("pos"),
        F.round(F.col("x").cast("double") * QUANT).cast("long").alias("q"),
    )


def norms2(comp: DataFrame, id_col: str = "vec_id") -> DataFrame:
    return comp.groupBy(id_col).agg(F.sum(F.col("q") * F.col("q")).alias("n2"))


def quantized_vec(vec_col: str) -> "F.Column":
    """array<float> -> array<bigint> of micro-units (same double-first
    rule as quantized_components)."""
    return F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * QUANT).cast("long")
    )


def _dot(a: "F.Column", b: "F.Column") -> "F.Column":
    """Exact integer dot product of two array<bigint> columns — stays in
    whole-stage codegen (no explode, no shuffle, no Python)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k nearest (by cosine) corpus vectors per query vector.
    ``queries`` has the same schema; self-matches are excluded.
    Output: query_id, cand_id, rank, cos (double, bit-portable).

    Scale shape: quantize per row, broadcast the (small) query set, and
    compute each 64-dim dot as ONE codegen'd array expression — a
    broadcast nested-loop over |corpus| x |queries| rows with zero
    shuffle until the final per-query top-k (tiny). The earlier
    posexplode+groupBy formulation moved 64x the rows through a hash
    aggregate for the same integer results."""
    from pyspark.sql import Window

    qv = queries.select(
        F.col(id_col).alias("query_id"), quantized_vec(vec_col).alias("_qq")
    ).withColumn("_qn2", _dot(F.col("_qq"), F.col("_qq")))
    cv = emb.select(
        F.col(id_col).alias("cand_id"), quantized_vec(vec_col).alias("_cq")
    ).withColumn("_cn2", _dot(F.col("_cq"), F.col("_cq")))
    cos = _dot(F.col("_qq"), F.col("_cq")) / (F.sqrt(F.col("_qn2")) * F.sqrt(F.col("_cn2")))
    scored = (
        cv.join(F.broadcast(qv), F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cos")
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the semantic-dedup stage of
    an LLM data pipeline): pairs sharing a sign-LSH bucket whose cosine
    is >= threshold. Bucketing makes candidate generation an equi-join —
    linear in bucket occupancy, never all-pairs — and true near-dups
    (cos ~ 1) agree on almost every sign bit, so recall at high
    thresholds is excellent. Output: doc_a < doc_b, cos."""
    v = emb.select(
        F.col(id_col),
        sign_lsh_bucket(vec_col, bits).alias("bucket"),
        quantized_vec(vec_col).alias("_v"),
    ).withColumn("_n2", _dot(F.col("_v"), F.col("_v")))
    a, b = v.alias("a"), v.alias("b")
    cos = _dot(F.col("a._v"), F.col("b._v")) / (
        F.sqrt(F.col("a._n2")) * F.sqrt(F.col("b._n2"))
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            cos.alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def ann_ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_pivots: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: an inverted-file index with
    ``n_pivots`` deterministic pivots (the first vectors by id — a real
    deployment trains centroids offline; determinism is what makes this
    oracle-checkable). Every vector is assigned to its nearest pivot
    (cell); queries only score their own cell's members.

    Scale shape: the pivot table is tiny and broadcast, so assignment is
    a codegen'd per-row argmax over n_pivots dots — no shuffle; the cell
    equi-join replaces the all-pairs scan, and per-cell occupancy bounds
    the scoring work (the same contract as ann_lsh_topk with a different
    partitioner)."""
    from pyspark.sql import Window

    pivots = (
        emb.orderBy(id_col)
        .limit(n_pivots)
        .select(F.col(id_col).alias("pivot_id"), quantized_vec(vec_col).alias("_pv"))
        .withColumn("_pn2", _dot(F.col("_pv"), F.col("_pv")))
    )

    def assign(df: DataFrame, out_id: str) -> DataFrame:
        v = df.select(
            F.col(id_col).alias(out_id), quantized_vec(vec_col).alias("_v")
        ).withColumn("_n2", _dot(F.col("_v"), F.col("_v")))
        cos = _dot(F.col("_v"), F.col("_pv")) / (F.sqrt(F.col("_n2")) * F.sqrt(F.col("_pn2")))
        w = Window.partitionBy(out_id).orderBy(F.col("_pcos").desc(), F.col("pivot_id").asc())
        return (
            v.crossJoin(F.broadcast(pivots))
            .withColumn("_pcos", cos)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(out_id, F.col("pivot_id").alias("cell"), "_v", "_n2")
        )

    qcells = assign(queries, "query_id").withColumnRenamed("_v", "_qv").withColumnRenamed(
        "_n2", "_qn2"
    )
    ccells = assign(emb, "cand_id")
    cos = _dot(F.col("_qv"), F.col("_v")) / (F.sqrt(F.col("_qn2")) * F.sqrt(F.col("_n2")))
    scored = (
        ccells.join(F.broadcast(qcells), on="cell")
        .where(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cos")
    )


def sign_lsh_bucket(vec_col: str = "embedding", bits: int = 8) -> "F.Column":
    """Bucket id from the sign pattern of the first ``bits`` dimensions
    (axis-aligned hyperplane LSH — deterministic, engine-portable)."""
    out = F.lit(0).cast("long")
    for j in range(bits):
        bit = F.when(F.element_at(F.col(vec_col), j + 1) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        out = out + bit * F.lit(1 << j).cast("long")
    return out


def ann_lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Approximate top-k: only bucket-mates (same sign pattern) are
    scored. Same scoring math as cosine_topk."""
    from pyspark.sql import Window

    qv = queries.select(
        F.col(id_col).alias("query_id"),
        sign_lsh_bucket(vec_col, bits).alias("bucket"),
        quantized_vec(vec_col).alias("_qq"),
    ).withColumn("_qn2", _dot(F.col("_qq"), F.col("_qq")))
    cv = emb.select(
        F.col(id_col).alias("cand_id"),
        sign_lsh_bucket(vec_col, bits).alias("bucket"),
        quantized_vec(vec_col).alias("_cq"),
    ).withColumn("_cn2", _dot(F.col("_cq"), F.col("_cq")))
    # Bucket-mates only: candidate generation is a hash equi-join on the
    # bucket id; scoring is the same codegen'd array dot as cosine_topk.
    cos = _dot(F.col("_qq"), F.col("_cq")) / (F.sqrt(F.col("_qn2")) * F.sqrt(F.col("_cn2")))
    scored = (
        cv.join(F.broadcast(qv), on="bucket")
        .where(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cos")
    )
