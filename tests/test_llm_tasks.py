"""plans/llm_tasks.py: the curate-corpus task end to end — parquet and
JSONL inputs, per-stage metrics consistency, written artifact."""

import json

import pytest
from pyspark.sql import Row

from open_bus_stride_etl_spark.plans import llm_tasks  # noqa: F401 - registers
from open_bus_stride_etl_spark.plans.tasks import run_task

GOOD = (
    "the quick brown fox jumps over the lazy dog and it is a fine day "
    "in the park where the children play and the birds sing songs"
)


@pytest.fixture
def lake(spark, tmp_path):
    rows = [
        Row(doc_id=1, source="web", lang="en", text=GOOD),  # keeper
        Row(doc_id=2, source="web", lang="en", text=GOOD),  # exact dup of 1
        Row(doc_id=3, source="web", lang="en", text=GOOD + " extra trailing words here"),
        Row(doc_id=4, source="web", lang="en", text="!!! ??? ,,, ..."),  # low quality
        Row(doc_id=5, source="web", lang="en", text="der hund läuft durch den wald und der vogel singt"),
    ]
    base = str(tmp_path / "lake")
    spark.createDataFrame(rows).write.parquet(f"{base}/documents.parquet")
    return base


def test_curate_corpus_task_parquet(spark, lake, capsys):
    m = run_task(spark, "llm-curate-corpus", base_dir=lake)
    assert m["n_total"] == 5
    # doc 4 fails quality; doc 5 is German -> 3 pass quality+lang
    assert m["n_quality_lang"] == 3
    # doc 2 is the exact-dup loser of 1
    assert m["n_after_exact"] == 2
    # doc 3 is a near-dup of 1 (high Jaccard) -> dropped
    assert m["n_near_dup_dropped"] == 1 and m["n_final"] == 1
    out = spark.read.parquet(m["out_dir"])
    assert [r["doc_id"] for r in out.collect()] == [1]
    assert set(out.columns) == {"doc_id", "source", "lang", "text"}
    # the runner printed a metrics JSON line (the reference's run ledger)
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    assert json.loads(line)["task"] == "llm-curate-corpus"


def test_curate_corpus_task_jsonl(spark, lake, tmp_path):
    docs = spark.read.parquet(f"{lake}/documents.parquet")
    from open_bus_stride_etl_spark.sources.jsonl import write_jsonl

    write_jsonl(docs.coalesce(1), f"{lake}/documents_jsonl")
    m = run_task(
        spark,
        "llm-curate-corpus",
        base_dir=lake,
        input_format="jsonl",
        out_dir=str(tmp_path / "out"),
    )
    assert m["n_total"] == 5 and m["n_final"] == 1
    assert spark.read.parquet(m["out_dir"]).count() == 1
