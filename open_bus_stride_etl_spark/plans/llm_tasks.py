"""LLM corpus-curation task: the dedup/quality/language operator
families composed into one schedulable pipeline stage with a written
artifact — the shape a daily training-data refresh actually runs
(ingest -> score -> dedup -> write), driven through the same task
registry/CLI as the transit ETL tasks (SURVEY.md §3; no reference-repo
analog — BASELINE.json extension).

The selection logic is the oracle-pinned `corpus_clean_keep` query
(plans/q_llm.py): quality >= threshold, language allow-list, exact-dup
min-id keeper, MinHash-LSH near-dup loser pruning. This task adds what
a query cannot carry: reading from parquet OR JSONL crawl dumps,
writing the curated corpus (with text) as parquet, and per-stage
survivor metrics for the run ledger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..operators import text as tx
from ..session import configure
from .tasks import task


def _load_docs(spark: SparkSession, base_dir: str, input_format: str) -> DataFrame:
    configure(spark)
    if input_format == "jsonl":
        from ..sources.jsonl import load_documents_jsonl  # noqa: PLC0415

        return load_documents_jsonl(spark, f"{base_dir}/documents_jsonl")
    return spark.read.parquet(f"{base_dir}/documents.parquet")


@task(
    "llm-curate-corpus",
    cadence="daily",
    quality_min_bp=2000,
    jaccard_min_bp=5000,
    langs="en,und",
    input_format="parquet",
)
def llm_curate_corpus(
    spark: SparkSession,
    base_dir: str,
    quality_min_bp: int = 2000,
    jaccard_min_bp: int = 5000,
    langs: str = "en,und",
    input_format: str = "parquet",
    out_dir: str | None = None,
) -> dict:
    """Curate ``{base_dir}/documents.parquet`` (or ``documents_jsonl/``)
    into ``{out_dir or base_dir/curated_documents}``: quality floor,
    language allow-list, exact-dedup min-id keeper, LSH near-dup loser
    pruning — then write the surviving documents WITH their text as
    parquet and report per-stage counts.

    Scale notes: the flag aggregation is one map-combined pass over the
    scored scan; the only full-corpus shuffles are the exact-dup
    fingerprint window and the LSH pipeline's signature aggregate (the
    flattened `minhash_lsh_pairs` plan); the final write streams the
    survivor rows — nothing collects to the driver but the metric
    scalars."""
    allow = [s.strip() for s in langs.split(",") if s.strip()]
    docs = _load_docs(spark, base_dir, input_format)
    t = F.col("text")
    scored = docs.select(
        "*",
        tx.quality_score_bp(t).alias("_quality_bp"),
        tx.lang_id(t).alias("_lang"),
        tx.doc_fingerprint(t).alias("_fp"),
    ).withColumn("_min_id", F.min("doc_id").over(Window.partitionBy("_fp")))

    ok_quality = F.col("_quality_bp") >= quality_min_bp
    ok_lang = F.col("_lang").isin(allow)
    keeper = F.col("doc_id") == F.col("_min_id")
    flags = scored.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(ok_quality & ok_lang, 1)).alias("n_quality_lang"),
        F.count(F.when(ok_quality & ok_lang & keeper, 1)).alias("n_after_exact"),
    ).collect()[0]

    near_dup_losers = (
        dd.minhash_lsh_pairs(docs)
        .where(F.col("jaccard_bp") >= jaccard_min_bp)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    survivors = (
        scored.where(ok_quality & ok_lang & keeper)
        .join(near_dup_losers, on="doc_id", how="left_anti")
        .drop("_quality_bp", "_lang", "_fp", "_min_id")
    )
    out = out_dir or f"{base_dir}/curated_documents"
    survivors.write.mode("overwrite").parquet(out)
    n_final = spark.read.parquet(out).count()
    return {
        "n_total": flags["n_total"],
        "n_quality_lang": flags["n_quality_lang"],
        "n_after_exact": flags["n_after_exact"],
        "n_near_dup_dropped": flags["n_after_exact"] - n_final,
        "n_final": n_final,
        "out_dir": out,
    }
