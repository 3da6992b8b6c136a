"""Document chunking and sequence packing — the context-window stage of
a training-data pipeline (long documents split into model-sized windows;
short documents packed together so batches waste no budget).

Both operators are deterministic pure-expression transforms, so they are
DuckDB-oracle-checkable and reproducible across engines/repartitionings:

- ``chunk_fixed``: overlapping fixed-size character windows via one
  ``posexplode(sequence(...))`` — map-local row expansion, no shuffle.
- ``pack_greedy``: streaming first-fit packing expressed as a running
  token sum per shard: bin id = (cumsum - tokens) div budget. Each
  bin's total is <= budget + max_doc_tokens (the standard streaming
  packing bound); shards ("workers") bound the sequential dependency so
  the cumsum window parallelizes — exactly how a distributed packer
  shards the corpus in practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import ws_token_count


def chunk_fixed(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 120,
    overlap: int = 20,
) -> DataFrame:
    """Overlapping character windows: starts at 0, step (chunk-overlap),
    until the text is consumed; short docs yield one chunk. Output:
    id, chunk_no, chunk_start (0-based), chunk_text."""
    step = chunk_chars - overlap
    if step <= 0:
        raise ValueError("overlap must be smaller than chunk_chars")
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.length(F.col(text_col)) - F.lit(overlap)) / F.lit(step)).cast("int"),
    )
    return docs.select(
        F.col(id_col),
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_no", "_i"),
        F.col(text_col),
    ).select(
        F.col(id_col),
        F.col("chunk_no"),
        (F.col("_i") * step).alias("chunk_start"),
        F.substring(F.col(text_col), F.col("_i") * step + 1, chunk_chars).alias(
            "chunk_text"
        ),
    )


def pack_greedy(
    docs: DataFrame,
    budget_tokens: int,
    n_shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document to a (shard, bin) so each bin's token total
    stays near ``budget_tokens``. Shard = deterministic md5 bucket of
    the doc id (engine-portable, bounds the per-partition sequential
    cumsum); within a shard, docs are packed in id order by a running
    token sum. Output: id, shard, bin_id, n_tokens."""
    from pyspark.sql import Window

    from .sampling import hash_bucket

    toks = ws_token_count(F.col(text_col))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select(
            F.col(id_col),
            hash_bucket(F.col(id_col), n_shards).cast("int").alias("shard"),
            toks.alias("n_tokens"),
        )
        .withColumn("_cum", F.sum("n_tokens").over(w))
        .select(
            id_col,
            "shard",
            F.floor((F.col("_cum") - F.col("n_tokens")) / budget_tokens)
            .cast("long")
            .alias("bin_id"),
            "n_tokens",
        )
    )
