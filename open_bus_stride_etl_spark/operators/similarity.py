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


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k nearest (by cosine) corpus vectors per query vector.
    ``queries`` has the same schema; self-matches are excluded.
    Output: query_id, cand_id, rank, cos (double, bit-portable)."""
    from pyspark.sql import Window

    qc = quantized_components(queries, id_col, vec_col).withColumnRenamed(id_col, "query_id")
    cc = quantized_components(emb, id_col, vec_col).withColumnRenamed(id_col, "cand_id")
    qn = norms2(qc, "query_id")
    cn = norms2(cc, "cand_id")
    dots = (
        F.broadcast(qc)
        .join(cc, on="pos")
        .groupBy("query_id", "cand_id")
        .agg(F.sum(qc["q"] * cc["q"]).alias("dot"))
    )
    cos = F.col("dot") / (F.sqrt(F.col("qn.n2")) * F.sqrt(F.col("cn.n2")))
    scored = (
        dots.join(F.broadcast(qn.alias("qn")), on="query_id")
        .join(cn.alias("cn"), on="cand_id")
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

    q = queries.withColumn("bucket", sign_lsh_bucket(vec_col, bits))
    c = emb.withColumn("bucket", sign_lsh_bucket(vec_col, bits))
    qc = quantized_components(q, id_col, vec_col).withColumnRenamed(id_col, "query_id")
    cc = quantized_components(c, id_col, vec_col).withColumnRenamed(id_col, "cand_id")
    pairs = (
        F.broadcast(q.select(F.col(id_col).alias("query_id"), "bucket"))
        .join(c.select(F.col(id_col).alias("cand_id"), "bucket"), on="bucket")
        .where(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
    )
    # Join components through the candidate-pair list.
    qcc = qc.withColumnRenamed("q", "qq")
    dots = (
        pairs.join(qcc, on="query_id")
        .join(cc, on=["cand_id", "pos"])
        .groupBy("query_id", "cand_id")
        .agg(F.sum(F.col("qq") * F.col("q")).alias("dot"))
    )
    qn = norms2(qc, "query_id").withColumnRenamed("n2", "qn2")
    cn = norms2(cc, "cand_id").withColumnRenamed("n2", "cn2")
    cos = F.col("dot") / (F.sqrt(F.col("qn2")) * F.sqrt(F.col("cn2")))
    scored = dots.join(F.broadcast(qn), "query_id").join(cn, "cand_id").select(
        "query_id", "cand_id", cos.alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cos")
    )
