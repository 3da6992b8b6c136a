"""plans/llm_tasks.py: the curate-corpus task end to end — parquet and
JSONL inputs, per-stage metrics consistency, written artifact."""

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

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


@pytest.fixture
def emb_lake(spark, tmp_path):
    """Embeddings with 3 well-separated direction groups + noise dims,
    so trained cells are meaningful and near-neighbors share a group."""
    import math

    rows = []
    for i in range(60):
        g = i % 3
        vec = [0.0] * 8
        vec[g] = 1.0
        vec[3 + g] = 0.5 + (i % 7) * 0.01  # within-group variation
        vec[7] = 0.001 * i
        rows.append(Row(vec_id=i + 1, embedding=[float(x) for x in vec]))
    base = str(tmp_path / "emb_lake")
    df = spark.createDataFrame(rows)
    df.select("vec_id", F.col("embedding").cast("array<float>").alias("embedding")) \
        .write.parquet(f"{base}/embeddings.parquet")
    return base


def test_ann_index_build_and_query(spark, emb_lake, tmp_path):
    """The persisted-IVF lifecycle: build writes centroid + assignment
    parquet with sane occupancy metrics; query answers from the loaded
    index without retraining, deterministically, self-excluded, and
    with in-group nearest neighbors."""
    idx = str(tmp_path / "idx")
    m = run_task(
        spark, "llm-build-ann-index", base_dir=emb_lake, k=3, iters=3, out_dir=idx
    )
    assert m["n_vectors"] == 60
    assert 1 <= m["n_cells_nonempty"] <= 3
    assert m["occupancy_max"] >= m["occupancy_min"] >= 1
    cents = spark.read.parquet(f"{idx}/centroids.parquet")
    assert cents.count() == 3 * 8  # k x dim long format

    out = str(tmp_path / "res")
    q = run_task(
        spark, "llm-ann-query", base_dir=emb_lake, index_dir=idx,
        k_top=3, n_probe=2, n_queries=6, out_dir=out,
    )
    assert q["n_queries"] == 6
    res = spark.read.parquet(out).collect()
    assert q["n_result_rows"] == len(res) == 6 * 3
    per_q = {}
    for r in res:
        assert r["cand_id"] != r["query_id"]  # self-excluded
        per_q.setdefault(r["query_id"], []).append((r["rank"], r["cand_id"], r["cos"]))
    for qid, hits in per_q.items():
        assert sorted(h[0] for h in hits) == [1, 2, 3]
        # rank-1 neighbor shares the query's direction group
        top = min(hits)[1]
        assert (top - 1) % 3 == (qid - 1) % 3
    # determinism: a second run reproduces the result exactly
    out2 = str(tmp_path / "res2")
    run_task(
        spark, "llm-ann-query", base_dir=emb_lake, index_dir=idx,
        k_top=3, n_probe=2, n_queries=6, out_dir=out2,
    )
    a = sorted(map(tuple, spark.read.parquet(out).collect()))
    b = sorted(map(tuple, spark.read.parquet(out2).collect()))
    assert a == b


def test_curate_corpus_incremental_history(spark, lake, tmp_path):
    """Daily-crawl incremental mode: run 1 seeds the fingerprint
    history; run 2 over the same corpus drops every already-seen
    survivor; genuinely new content still passes."""
    hist = str(tmp_path / "hist")
    out1 = str(tmp_path / "c1")
    m1 = run_task(
        spark, "llm-curate-corpus", base_dir=lake, out_dir=out1, history_dir=hist
    )
    assert m1["n_final"] > 0 and m1["n_seen_dropped"] == 0

    out2 = str(tmp_path / "c2")
    m2 = run_task(
        spark, "llm-curate-corpus", base_dir=lake, out_dir=out2, history_dir=hist
    )
    assert m2["n_final"] == 0
    assert m2["n_seen_dropped"] == m1["n_final"]

    # a new document (unseen fingerprint) passes on run 3
    from pyspark.sql import Row as R

    extra = spark.createDataFrame(
        [R(doc_id=99, source="web", lang="en",
           text="completely fresh sentence about rivers and mountains flowing "
                "under the bright morning sun while travelers walk the long road")]
    )
    base2 = str(tmp_path / "lake2")
    spark.read.parquet(f"{lake}/documents.parquet").unionByName(extra) \
        .write.parquet(f"{base2}/documents.parquet")
    out3 = str(tmp_path / "c3")
    m3 = run_task(
        spark, "llm-curate-corpus", base_dir=base2, out_dir=out3, history_dir=hist
    )
    assert m3["n_final"] == 1
    assert {r["doc_id"] for r in spark.read.parquet(out3).collect()} == {99}


def test_ann_query_recall_gate(spark, emb_lake, tmp_path):
    """eval_recall reports the mean recall@k against the exact baseline
    — on the well-separated fixture, probing 2 of 3 trained cells must
    recover most of the true neighbors, and probing all 3 recovers all."""
    idx = str(tmp_path / "idx")
    run_task(spark, "llm-build-ann-index", base_dir=emb_lake, k=3, iters=3, out_dir=idx)
    q = run_task(
        spark, "llm-ann-query", base_dir=emb_lake, index_dir=idx,
        k_top=3, n_probe=3, n_queries=6, out_dir=str(tmp_path / "r"),
        eval_recall=True,
    )
    assert q["recall_bp"] == 10000  # all cells probed -> exact recall


def test_export_training_shards(spark, lake, tmp_path):
    """End-to-end last mile: vocab -> tokenize -> shuffle -> sharded
    write. Every doc appears exactly once, per-shard positions are
    contiguous from 1, rows inside a shard file are stored in pos
    order, and the same seed reproduces the identical artifact while a
    different seed permutes the order."""
    out = str(tmp_path / "shards")
    m = run_task(
        spark, "llm-export-training-shards", base_dir=lake,
        vocab_size=10, n_shards=4, seed="ep0", out_dir=out,
    )
    assert m["n_docs"] == 5 and m["total_tokens"] > 0
    back = spark.read.parquet(out)
    assert sorted(r["doc_id"] for r in back.collect()) == [1, 2, 3, 4, 5]
    per_shard = {
        r["shard"]: sorted(rr["pos"] for rr in back.where(F.col("shard") == r["shard"]).collect())
        for r in back.select("shard").distinct().collect()
    }
    for shard, poss in per_shard.items():
        assert poss == list(range(1, len(poss) + 1)), f"shard {shard} pos not contiguous"
    # within-file storage order follows pos (sortWithinPartitions)
    import glob

    for d in glob.glob(out + "/shard=*"):
        rows = spark.read.parquet(d).select("pos").collect()
        poss = [r["pos"] for r in rows]
        assert poss == sorted(poss), f"{d} not stored in pos order"

    # reproducibility: same seed -> identical mapping; new seed -> reshuffle
    out2 = str(tmp_path / "shards2")
    run_task(spark, "llm-export-training-shards", base_dir=lake,
             vocab_size=10, n_shards=4, seed="ep0", out_dir=out2)
    a = sorted(map(tuple, spark.read.parquet(out).select("doc_id", "shard", "pos").collect()))
    b = sorted(map(tuple, spark.read.parquet(out2).select("doc_id", "shard", "pos").collect()))
    assert a == b
    out3 = str(tmp_path / "shards3")
    run_task(spark, "llm-export-training-shards", base_dir=lake,
             vocab_size=10, n_shards=4, seed="ep1", out_dir=out3)
    c = sorted(map(tuple, spark.read.parquet(out3).select("doc_id", "shard", "pos").collect()))
    assert c != a  # different epoch seed permutes shard/pos assignment


def test_stream_ingest_dedup_appends_index(spark, tmp_path):
    """The production ingest loop: batch 2's near-dup of a doc admitted
    in batch 1 is suppressed BECAUSE the index grew (the static-index
    query can't do this); a rerun of the task is a no-op (checkpoint
    resume, no re-admission); replay-idempotent batch=<id> sinks."""
    import os

    base = str(tmp_path / "base")
    src = f"{base}/ingest"
    os.makedirs(src)
    b1 = [Row(doc_id=10, text=GOOD)]
    b2 = [
        Row(doc_id=20, text=GOOD + " one extra tail"),  # near-dup of 10 -> suppressed
        Row(doc_id=21, text="completely different essay about arctic tern "
                            "migration across hemispheres during equinox and "
                            "solstice seasons every single year")
    ]
    for i, rows in enumerate([b1, b2]):
        staged = str(tmp_path / f"s{i}")
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(staged)
        part = [f for f in os.listdir(staged) if f.startswith("part-")][0]
        dstf = f"{src}/{i:02d}.parquet"
        os.rename(os.path.join(staged, part), dstf)
        os.utime(dstf, (1700000000 + i * 100, 1700000000 + i * 100))

    m = run_task(spark, "llm-stream-ingest-dedup", base_dir=base, max_files_per_trigger=1)
    assert m["n_batches"] == 2
    assert m["n_ingested"] == 3
    assert m["n_novel"] == 2 and m["n_suppressed"] == 1
    out = spark.read.parquet(m["out_dir"])
    assert sorted(r["doc_id"] for r in out.collect()) == [10, 21]
    # index holds both admitted docs' buckets (4 bands each, distinct)
    idx = spark.read.parquet(f"{m['index_dir']}/batch=*")
    assert idx.select("bucket").distinct().count() == 8

    # rerun: checkpoint says everything is processed -> zero new batches
    m2 = run_task(spark, "llm-stream-ingest-dedup", base_dir=base, max_files_per_trigger=1)
    assert m2["n_batches"] == 0 and m2["n_ingested"] == 0
    assert sorted(r["doc_id"] for r in spark.read.parquet(m["out_dir"]).collect()) == [10, 21]


def test_stream_ingest_dedup_replay_excludes_own_partition(spark, tmp_path):
    """Crash-replay: foreachBatch re-delivers batch 0 after its own
    batch=0 index partition was already written by the crashed attempt.
    The probe must EXCLUDE the in-flight batch's partition — otherwise
    the batch's docs hit their own buckets, novel goes empty, and the
    overwrite erases the previously-admitted output rows."""
    import os

    from open_bus_stride_etl_spark.operators import dedup as dd

    base = str(tmp_path / "base")
    src = f"{base}/ingest"
    os.makedirs(src)
    rows = [Row(doc_id=10, text=GOOD)]
    staged = str(tmp_path / "s0")
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(staged)
    part = [f for f in os.listdir(staged) if f.startswith("part-")][0]
    os.rename(os.path.join(staged, part), f"{src}/00.parquet")

    # the crashed attempt's leftover: batch 0's OWN buckets in the index
    batch_df = spark.read.parquet(src)
    (
        dd.band_buckets(dd.minhash_signatures(batch_df))
        .select("bucket").distinct()
        .write.mode("overwrite")
        .parquet(f"{base}/lsh_band_index/batch=0")
    )

    # fresh checkpoint -> batch 0 is (re)delivered with its partition present
    m = run_task(spark, "llm-stream-ingest-dedup", base_dir=base)
    assert m["n_novel"] == 1, "replayed batch suppressed by its own index partition"
    out = spark.read.parquet(m["out_dir"])
    assert [r["doc_id"] for r in out.collect()] == [10]


def test_curate_band_index_matches_recompute_path(spark, lake, tmp_path):
    """The amortized persisted band-bucket index (r10, VERDICT r9 #1)
    yields bit-identical metrics and artifacts to the r9
    recompute-per-run path across incremental generations that ADD,
    REMOVE and REWRITE documents — the mutation cases the index's
    fingerprint validity filter exists for. Also pins the amortization
    contract: once a doc is validly indexed its signature is never
    recomputed (the index is topped up, not rebuilt)."""
    import shutil

    from pyspark.sql import Row as R

    def snap(src, dst):
        shutil.copytree(src, dst)
        return dst

    hist = str(tmp_path / "hist")
    m1 = run_task(
        spark, "llm-curate-corpus", base_dir=lake,
        out_dir=str(tmp_path / "o1"), history_dir=hist,
    )
    assert m1["n_final"] > 0
    import os

    # run 1 (seen empty) keeps the in-plan pipeline: no index yet
    assert not os.path.isdir(f"{hist}/lsh_band_index.parquet")
    hist_b = snap(hist, str(tmp_path / "hist_b"))  # recompute-path twin

    # generation 2: new docs (one near-dup of doc 1, one fresh), doc 3
    # removed, doc 5 rewritten in place (same id, new text)
    base2 = str(tmp_path / "lake2")
    d1 = spark.read.parquet(f"{lake}/documents.parquet")
    g2 = (
        d1.where(~F.col("doc_id").isin(3))
        .where(F.col("doc_id") != 5)
        .unionByName(
            spark.createDataFrame(
                [
                    R(doc_id=5, source="web", lang="en",
                      text="rewritten body about harbors and lighthouses guiding "
                           "ships safely home through the foggy night waters"),
                    R(doc_id=6, source="web", lang="en",
                      text=GOOD + " with a small appended tail"),
                    R(doc_id=7, source="web", lang="en",
                      text="completely fresh sentence about rivers and mountains "
                           "flowing under the bright morning sun while travelers "
                           "walk the long road"),
                ]
            )
        )
    )
    g2.write.parquet(f"{base2}/documents.parquet")

    m2a = run_task(
        spark, "llm-curate-corpus", base_dir=base2,
        out_dir=str(tmp_path / "o2a"), history_dir=hist,  # index path (bootstrap)
    )
    m2b = run_task(
        spark, "llm-curate-corpus", base_dir=base2,
        out_dir=str(tmp_path / "o2b"), history_dir=hist_b, band_index=False,
    )
    drop = ("elapsed_sec", "out_dir")

    def core(m):
        return {k: v for k, v in m.items() if k not in drop}

    assert core(m2a) == core(m2b)
    assert sorted(map(tuple, spark.read.parquet(str(tmp_path / "o2a")).collect())) == \
           sorted(map(tuple, spark.read.parquet(str(tmp_path / "o2b")).collect()))
    idx_path = f"{hist}/lsh_band_index.parquet"
    assert os.path.isdir(idx_path)
    idx_g2 = spark.read.parquet(idx_path)
    n_idx_g2 = idx_g2.count()
    # bootstrap signed the whole generation-2 corpus (4 bands per doc)
    assert n_idx_g2 == g2.count() * 4

    # generation 3: one more near-dup arrives; doc 7 is removed again
    base3 = str(tmp_path / "lake3")
    g3 = g2.where(F.col("doc_id") != 7).unionByName(
        spark.createDataFrame(
            [R(doc_id=8, source="web", lang="en",
               text=GOOD + " with a different appended tail")]
        )
    )
    g3.write.parquet(f"{base3}/documents.parquet")
    m3a = run_task(
        spark, "llm-curate-corpus", base_dir=base3,
        out_dir=str(tmp_path / "o3a"), history_dir=hist,  # steady-state probe
    )
    m3b = run_task(
        spark, "llm-curate-corpus", base_dir=base3,
        out_dir=str(tmp_path / "o3b"), history_dir=hist_b, band_index=False,
    )
    assert core(m3a) == core(m3b)
    assert sorted(map(tuple, spark.read.parquet(str(tmp_path / "o3a")).collect())) == \
           sorted(map(tuple, spark.read.parquet(str(tmp_path / "o3b")).collect()))
    # amortization: only the ONE genuinely new doc was signed this run
    # (doc 7's stale rows remain on disk, invisible behind the validity
    # filter; nothing was re-signed)
    assert spark.read.parquet(idx_path).count() == n_idx_g2 + 4
