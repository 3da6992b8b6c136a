"""LLM training-data pipeline tasks: the operator families composed
into schedulable stages with written artifacts, driven through the same
task registry/CLI as the transit ETL tasks (SURVEY.md §3; no
reference-repo analog — BASELINE.json extension). Four stages:
llm-curate-corpus (ingest -> score -> dedup -> write, optionally
incremental against a Bloom-pre-filtered history index),
llm-build-ann-index / llm-ann-query (the persisted IVF lifecycle), and
llm-export-training-shards (tokenize -> seeded shuffle -> sharded
replay-ordered write — the artifact a training loader consumes).

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


def _indexed_lsh_pairs(
    spark: SparkSession,
    docs: DataFrame,
    history_dir: str,
    b_ids: DataFrame,
    cur: DataFrame,
    probe_rows: int | None = None,
) -> DataFrame:
    """Incremental LSH pairs via the AMORTIZED persisted band-bucket
    index (r10, VERDICT r9 #1): ``{history_dir}/lsh_band_index.parquet``
    holds one ``(doc_id, fp, bucket)`` row per band per ever-indexed
    doc. Each incremental run tops the index up with the docs it does
    not validly cover (one signature aggregation over THOSE docs only —
    the full corpus is signed exactly once across the task's lifetime,
    never rebuilt) and probes batch-vs-index, so the steady-state run's
    only full-corpus work is one slim columnar scan of the index.

    Exactness: an index row is USED only when its ``fp`` (the task's
    md5 content fingerprint — the same text-identity the seen-index and
    exact-dup keeper already rely on) matches the doc's CURRENT
    fingerprint in ``cur``, so removed docs, changed text, and stale
    rows are invisible; after the top-up every current doc has a valid
    row, making the validity-filtered index row-set-equal to
    ``minhash_band_buckets(docs)`` — the precondition under which
    ``minhash_lsh_pairs_from_buckets`` returns exactly
    ``minhash_lsh_pairs(docs, b_ids=b_ids)``'s rows (pinned by
    tests/test_llm_ops.py::test_lsh_pairs_from_buckets_*). The index is
    append-only (a crash-replayed append at worst duplicates rows,
    which the candidate ``distinct()`` absorbs); compaction of stale
    rows is the deployment's lake-compaction concern, like every other
    append artifact here."""
    import os  # noqa: PLC0415

    from ..operators.util import track_persist  # noqa: PLC0415

    idx_path = f"{history_dir}/lsh_band_index.parquet"
    if os.path.isdir(idx_path):
        existing = spark.read.parquet(idx_path)
        # ONE corpus-scale validity join per run (the first cut ran it
        # per consumer — three corpus-sized joins; measured the whole
        # win away at sf10): the valid row set is persisted, and the
        # top-up anti-join, the candidate a-side and the probe b-side
        # all read the cache.
        valid = track_persist(
            existing.select("doc_id", F.col("fp").alias("_fp"), "bucket")
            .join(cur, on=["doc_id", "_fp"], how="left_semi")
            .select("doc_id", "bucket")
        )
        new_docs = docs.join(
            valid.select("doc_id").distinct(), on="doc_id", how="left_anti"
        )
    else:
        valid = None
        new_docs = docs  # bootstrap: first incremental run signs everything once
    os.makedirs(history_dir, exist_ok=True)
    # The batch's new buckets are computed ONCE (eager localCheckpoint):
    # the index append writes from the checkpoint and the probe union
    # reads it — no re-read of the just-written files, no second
    # signature pass over the batch.
    new_buckets = (
        dd.minhash_band_buckets(new_docs)
        .join(cur, on="doc_id")
        .select("doc_id", F.col("_fp").alias("fp"), "bucket")
        .localCheckpoint(eager=True)
    )
    new_buckets.write.mode("append").parquet(idx_path)
    nb = new_buckets.select("doc_id", "bucket")
    buckets_now = nb if valid is None else valid.unionByName(nb)
    return dd.minhash_lsh_pairs_from_buckets(
        docs, buckets_now, b_ids=b_ids, probe_rows=probe_rows
    )


_PERSIST_SCORED = False


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
    band_index=True,
)
def llm_curate_corpus(
    spark: SparkSession,
    base_dir: str,
    quality_min_bp: int = 2000,
    jaccard_min_bp: int = 5000,
    langs: str = "en,und",
    input_format: str = "parquet",
    out_dir: str | None = None,
    history_dir: str | None = None,
    band_index: bool = True,
) -> dict:
    """Curate ``{base_dir}/documents.parquet`` (or ``documents_jsonl/``)
    into ``{out_dir or base_dir/curated_documents}``: quality floor,
    language allow-list, exact-dedup min-id keeper, LSH near-dup loser
    pruning — then write the surviving documents WITH their text as
    parquet and report per-stage counts.

    Scale notes: the flag aggregation is one map-combined pass over the
    scored scan; the only full-corpus shuffles are the exact-dup
    fingerprint window and the LSH pipeline's signature aggregate (the
    flattened `minhash_lsh_pairs` plan) — and on INCREMENTAL runs with
    ``band_index`` (the default) even that disappears: signatures are
    read from the amortized persisted band-bucket index in
    ``history_dir`` (see ``_indexed_lsh_pairs``; each doc is signed
    exactly once across the task's lifetime). The final write streams
    the survivor rows — nothing collects to the driver but the metric
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

    # Incremental mode (the daily-crawl shape, same contract as the
    # dedup_incremental query): drop any document whose fingerprint is
    # already in the history index — an anti-join against an 8-byte-key
    # table — and, after the write, append the NEW survivors'
    # fingerprints so the next run sees them. The index append is
    # distinct fingerprints only: it grows with unique content, not
    # crawl volume. A Bloom-pre-filtered variant (operators/bloom.py)
    # was tried here in r5 and REVERTED on measurement: at a 20M-key
    # materialized index x 5M-row batch the per-run bitset build made
    # it 12x slower than Spark's native AQE anti-join (2.4 s vs 29 s,
    # interleaved A/B x3) — see bloom.py's docstring for the full
    # verdict and the narrow amortized-bitset niche where it can win.
    seen = None
    if history_dir is not None:
        import os  # noqa: PLC0415

        seen_path = f"{history_dir}/seen_fingerprints.parquet"
        if os.path.isdir(seen_path):
            seen = spark.read.parquet(seen_path)

    # ONE aggregation pass computes every pre-LSH metric (r9; the
    # pre-change shape ran the scoring scan + fingerprint window once
    # for the counters and AGAIN for the seen-survivor count). The seen
    # verdict joins as a nullable flag (left join on DISTINCT index
    # fingerprints — distinct because appends may repeat a fingerprint
    # across runs, and a duplicate-key left join would duplicate rows;
    # a whole fp-group drops together, so keeper semantics stay
    # consistent either way).
    from pyspark.sql import Observation  # noqa: PLC0415

    flag_aggs = [
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(ok_quality & ok_lang, 1)).alias("n_quality_lang"),
        F.count(F.when(ok_quality & ok_lang & keeper, 1)).alias("n_after_exact"),
    ]
    obs_flags = None
    if seen is not None:
        if _PERSIST_SCORED:
            # measure-only toggle (VERDICT r9 #2): cache the scored
            # full-text corpus so the flags aggregation and the write
            # derivation share one scoring pass — flipped by
            # tools/probe_scored.py's paired A/B; see the probe verdict
            # in OPTIMIZATION_r10.md before trusting either default.
            from ..operators.util import track_persist  # noqa: PLC0415

            scored = track_persist(scored)
        fl = scored.join(
            seen.select(F.col("fingerprint").alias("_fp")).distinct().withColumn(
                "_seen", F.lit(1)
            ),
            on="_fp",
            how="left",
        )
        seen_flag = F.col("_seen").isNotNull()
        # The counts must be known BEFORE the no-op branch decision, so
        # incremental mode keeps the standalone aggregation pass.
        flags = fl.agg(
            *flag_aggs,
            F.count(F.when(ok_quality & ok_lang & keeper & ~seen_flag, 1)).alias(
                "n_remaining"
            ),
            # unseen-doc count rides the same pass: it sizes the band
            # index probe's broadcast decision (4 band rows per unseen
            # doc), sparing _indexed_lsh_pairs its own count job (r10)
            F.count(F.when(~seen_flag, 1)).alias("n_unseen"),
        ).collect()[0]
        n_remaining = flags["n_remaining"]
        n_unseen = flags["n_unseen"]
        n_seen_dropped = flags["n_after_exact"] - n_remaining
        scored = scored.join(
            seen.select(F.col("fingerprint").alias("_fp")), on="_fp", how="left_anti"
        )
    else:
        # Non-incremental mode never branches on the counts, so they
        # ride the artifact write as observed metrics (guide §1.4 /
        # write_package's pattern) — ONE scoring pass instead of two.
        obs_flags = Observation()
        scored = scored.observe(obs_flags, *flag_aggs)
        n_remaining = None
        n_seen_dropped = 0

    kept = scored.where(ok_quality & ok_lang & keeper)
    if n_remaining == 0:
        # Incremental no-op fast path (r9): the seen-index anti-join left
        # ZERO would-be survivors, so near-dup loser pruning — the whole
        # MinHash-LSH pipeline, the task's most expensive stage — cannot
        # change the (empty) result: an anti-join FROM an empty left side
        # is empty by definition. Skip building it — and write the empty
        # artifact as a LITERAL empty frame (the emptiness is already
        # proven by the aggregation above; re-executing the scoring scan
        # + window + anti-join just to produce 0 rows was the pre-change
        # cost). The steady-state daily re-crawl run costs ONE scoring
        # pass instead of three-plus-LSH.
        survivors = spark.createDataFrame(
            [], kept.drop("_quality_bp", "_lang", "_fp", "_min_id").schema
        )
    else:
        # Incremental runs only need to know whether a REMAINING doc
        # loses an LSH pair — restrict the pair b-side to the
        # new-content docs (guide §3.2 selective semi-join; the a-side
        # stays the full corpus): candidates, the member re-shingle and
        # the Jaccard verify shrink to the batch's bucket-mates instead
        # of re-pairing the whole corpus to re-drop the same losers
        # every run. The set is the fingerprint-only anti-join (NOT the
        # scored `kept` frame): a strict superset of every possible
        # survivor — kept ⊆ {fp ∉ seen} by construction — whose build
        # costs one md5 pass, not the quality/lang regex kernels plus
        # the fingerprint window. Losers outside the kept set never
        # survive the anti-join below anyway, so survivors are
        # identical either way.
        #
        # With ``band_index`` (r10, the default) the candidate a-side
        # comes from the persisted band-bucket index in history_dir
        # (_indexed_lsh_pairs) instead of a fresh full-corpus signature
        # aggregation — the amortized O(batch)-signing shape. The first
        # run (seen is None) keeps the in-plan minhash_lsh_pairs
        # pipeline unchanged (bootstrap happens on the FIRST incremental
        # LSH run, which must sign the backlog once either way);
        # band_index=False keeps the r9 recompute-per-run path for
        # callers that don't want index storage.
        pairs_src = None
        b_ids = None
        if seen is not None:
            if band_index:
                from ..operators.util import track_persist  # noqa: PLC0415

                cur = track_persist(
                    docs.select(
                        "doc_id", tx.doc_fingerprint(F.col("text")).alias("_fp")
                    )
                )
                b_ids = cur.join(
                    seen.select(F.col("fingerprint").alias("_fp")),
                    on="_fp",
                    how="left_anti",
                ).select("doc_id")
                pairs_src = _indexed_lsh_pairs(
                    spark, docs, history_dir, b_ids, cur, probe_rows=4 * n_unseen
                )
            else:
                b_ids = (
                    docs.select(
                        "doc_id", tx.doc_fingerprint(F.col("text")).alias("_fp")
                    )
                    .join(
                        seen.select(F.col("fingerprint").alias("_fp")),
                        on="_fp",
                        how="left_anti",
                    )
                    .select("doc_id")
                )
        if pairs_src is None:
            pairs_src = dd.minhash_lsh_pairs(docs, b_ids=b_ids)
        near_dup_losers = (
            pairs_src.where(F.col("jaccard_bp") >= jaccard_min_bp)
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
        survivors = kept.join(near_dup_losers, on="doc_id", how="left_anti").drop(
            "_quality_bp", "_lang", "_fp", "_min_id"
        )
    out = out_dir or f"{base_dir}/curated_documents"
    # n_final rides the write job via the Observation API (the
    # csv_package.write_package pattern) instead of a read-back count.
    obs = Observation()
    survivors.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
        "overwrite"
    ).parquet(out)
    n_final = obs.get["n"]
    if history_dir is not None and n_final > 0:
        # (an empty run appends nothing — skip the no-op job; the index
        # CONTENT is identical either way)
        import os  # noqa: PLC0415

        os.makedirs(history_dir, exist_ok=True)
        seen_path = f"{history_dir}/seen_fingerprints.parquet"
        (
            spark.read.parquet(out)
            .select(tx.doc_fingerprint(F.col("text")).alias("fingerprint"))
            .distinct()
            .write.mode("append")
            .parquet(seen_path)
        )
    fv = obs_flags.get if obs_flags is not None else flags  # post-write either way
    return {
        "n_total": fv["n_total"],
        "n_quality_lang": fv["n_quality_lang"],
        "n_after_exact": fv["n_after_exact"],
        "n_seen_dropped": n_seen_dropped,
        "n_near_dup_dropped": fv["n_after_exact"] - n_final - n_seen_dropped,
        "n_final": n_final,
        "out_dir": out,
    }


@task("llm-build-ann-index", cadence="daily", k=8, iters=3)
def llm_build_ann_index(
    spark: SparkSession,
    base_dir: str,
    k: int = 8,
    iters: int = 3,
    out_dir: str | None = None,
) -> dict:
    """Train and PERSIST the IVF index over ``{base_dir}/
    embeddings.parquet``: k-means centroids (the coarse quantizer) and
    the full assignment (the inverted lists), each written as parquet —
    the offline index-build stage every production ANN deployment runs
    (ann_ivf_topk's deterministic pivots are the oracle-checkable
    stand-in; THIS is the trained path). Reported occupancy stats are
    the index-health metrics that drive the scale-k-with-corpus rule
    (similarity.py:clustered_near_dup_pairs's enforced precondition).

    Scale shape: training is operators/clustering.py:kmeans_fit (each
    Lloyd round = one scan of the persisted long-format points; only
    k x dim ints ever reach the driver); the index write shuffles
    (id, cluster) pairs, never vectors."""
    configure(spark)
    from ..operators.clustering import kmeans_fit  # noqa: PLC0415

    emb = spark.read.parquet(f"{base_dir}/embeddings.parquet")
    assign, cents = kmeans_fit(emb, k=k, iters=iters)
    out = out_dir or f"{base_dir}/ann_index"
    cents.write.mode("overwrite").parquet(f"{out}/centroids.parquet")
    assign.write.mode("overwrite").parquet(f"{out}/assignments.parquet")
    occ = (
        spark.read.parquet(f"{out}/assignments.parquet")
        .groupBy("cluster")
        .count()
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("count").alias("n_vectors"),
            F.min("count").alias("occ_min"),
            F.max("count").alias("occ_max"),
        )
        .collect()[0]
    )
    return {
        "k": k,
        "iters": iters,
        "n_vectors": occ["n_vectors"],
        "n_cells_nonempty": occ["n_cells"],
        "occupancy_min": occ["occ_min"],
        "occupancy_max": occ["occ_max"],
        "out_dir": out,
    }


def ivf_probe_persisted(
    spark: SparkSession,
    emb,
    idx_dir: str,
    n_queries: int = 16,
    k_top: int = 5,
    n_probe: int = 2,
):
    """The load-and-probe core of llm_ann_query, reusable as a plain
    DataFrame transform: read a PERSISTED IVF index (``centroids.parquet``
    + ``assignments.parquet`` under ``idx_dir``), coarse-quantize the
    ``n_queries`` lowest-id vectors against the loaded centroids
    driver-side (k x dim ints), pick each query's ``n_probe`` nearest
    cells by cosine (ties to the lowest cluster id — stable argsort ==
    row_number ORDER BY cos DESC, cluster ASC), and score the corpus in
    ONE mapInPandas pass keyed by its STORED cell assignment
    (similarity.py:_partitioned_probe). Also exercised under the oracle
    by plans/q_llm.py:ann_ivf_persisted_topk.

    Returns ``(result_df, meta)`` with ``meta = {"n_queries",
    "n_probed_cells"}`` (the actual sample/probe sizes, for task
    metrics)."""
    import numpy as np  # noqa: PLC0415

    from ..operators.similarity import _partitioned_probe, quantized_vec  # noqa: PLC0415

    cent_rows = spark.read.parquet(f"{idx_dir}/centroids.parquet").collect()
    k = 1 + max(r["cluster"] for r in cent_rows)
    dim = max(r["pos"] for r in cent_rows)
    c_mat = np.zeros((k, dim), dtype=np.float64)
    for r in cent_rows:
        c_mat[r["cluster"], r["pos"] - 1] = r["cq"]
    c_norm = np.sqrt((c_mat * c_mat).sum(axis=1))
    c_norm[c_norm == 0] = 1.0

    q_rows = (
        emb.orderBy("vec_id")
        .limit(n_queries)
        .select(F.col("vec_id").alias("query_id"), quantized_vec("embedding").alias("_qq"))
        .collect()
    )
    q_ids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r["_qq"] for r in q_rows], dtype=np.float64)
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1))
    # same zero-norm guard as c_norm: a zero query embedding would make
    # cos_qc a NaN row and the argsort probe-cell selection arbitrary;
    # with norm pinned to 1 the row is all-zero cos -> deterministic
    # lowest-cluster-id probes (stable argsort)
    q_norm[q_norm == 0] = 1.0
    cos_qc = (q_mat @ c_mat.T) / (q_norm[:, None] * c_norm[None, :])
    # n_probe nearest cells per query, ties to the lowest cluster id
    probe = np.argsort(-cos_qc, axis=1, kind="stable")[:, :n_probe]
    by_cell: dict[int, tuple] = {}
    for cell in np.unique(probe):
        sel = (probe == cell).any(axis=1)
        by_cell[int(cell)] = (q_ids[sel], q_mat[sel], q_norm[sel])

    assign = spark.read.parquet(f"{idx_dir}/assignments.parquet")
    cv = (
        emb.select(F.col("vec_id").alias("cand_id"), quantized_vec("embedding").alias("_cq"))
        .join(
            assign.select(F.col("vec_id").alias("cand_id"), F.col("cluster").alias("_key")),
            on="cand_id",
        )
        .where(F.col("_key").isin([int(c) for c in by_cell]))
    )
    meta = {"n_queries": len(q_rows), "n_probed_cells": len(by_cell)}
    return _partitioned_probe(cv, by_cell, k_top), meta


@task("llm-ann-query", cadence="daily", k_top=5, n_probe=2, n_queries=16)
def llm_ann_query(
    spark: SparkSession,
    base_dir: str,
    index_dir: str | None = None,
    k_top: int = 5,
    n_probe: int = 2,
    n_queries: int = 16,
    out_dir: str | None = None,
    eval_recall: bool = False,
) -> dict:
    """Answer a query set against the PERSISTED IVF index (built by
    llm-build-ann-index) without retraining: queries are coarse-
    quantized against the loaded centroids driver-side (k x dim ints),
    each probing its ``n_probe`` nearest cells; the corpus makes ONE
    mapInPandas pass keyed by its stored cell assignment, scoring each
    Arrow batch's cell-groups against the probing queries' blocks
    (similarity.py:_partitioned_probe — only per-batch top-k rows leave
    the workers). The query set is the ``n_queries`` lowest-id vectors
    (deterministic, like the oracle-checked ANN queries).

    Scale shape: the assignment join is an equi-join on the 8-byte id;
    nothing shuffles vectors except the one corpus scan's Arrow
    batches; raising n_probe trades recall for the number of cell
    blocks each batch matmuls against."""
    configure(spark)
    idx = index_dir or f"{base_dir}/ann_index"
    emb = spark.read.parquet(f"{base_dir}/embeddings.parquet")
    result, probe_meta = ivf_probe_persisted(
        spark, emb, idx, n_queries=n_queries, k_top=k_top, n_probe=n_probe
    )
    out = out_dir or f"{base_dir}/ann_results"
    # n_result_rows rides the write job (Observation API — the
    # overwrite_table_observed pattern; was a read-back count job, r9)
    from pyspark.sql import Observation  # noqa: PLC0415

    obs = Observation()
    result.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
        "overwrite"
    ).parquet(out)
    n_rows = obs.get["n"]
    metrics = {
        "n_queries": probe_meta["n_queries"],
        "k_top": k_top,
        "n_probe": n_probe,
        "n_result_rows": n_rows,
        "n_probed_cells": probe_meta["n_probed_cells"],
        "out_dir": out,
    }
    if eval_recall:
        # The quality gate before an index replaces the exact path:
        # mean recall@k of the probed result against the brute-force
        # baseline over the SAME query set (bounded by cosine_topk's
        # max_query_rows broadcast contract — query sets are small by
        # construction here).
        from ..operators.similarity import ann_recall_at_k, cosine_topk  # noqa: PLC0415

        queries_df = emb.orderBy("vec_id").limit(n_queries)
        exact = cosine_topk(emb, queries_df, k=k_top)
        rec = (
            ann_recall_at_k(exact, spark.read.parquet(out))
            .agg(
                F.sum("n_true").alias("t"),
                F.sum("n_hit").alias("h"),
            )
            .collect()[0]
        )
        metrics["recall_bp"] = int(round(10000.0 * rec["h"] / rec["t"])) if rec["t"] else None
    return metrics


def build_training_shards(
    docs: DataFrame, vocab_size: int = 100, n_shards: int = 8, seed: str = "ep0"
) -> DataFrame:
    """The export task's logical plan, pre-write (factored out r8 so
    tests/test_partitioning.py can canary the plan shape): corpus-derived
    top-``vocab_size`` DF vocabulary (distributed top-k then a
    vocab_size-row window — bounded, never a global rank of the term
    table), tokenize_with_vocab, seeded shard_shuffle (bucket-then-rank:
    n_shards window partitions, NEVER one global sort), one repartition
    by shard with partition-local ordering by pos."""
    from ..operators import corpus_stats as cs  # noqa: PLC0415
    from ..operators import sampling as sp  # noqa: PLC0415

    order = [F.col("df").desc(), F.col("term").asc()]
    head = cs.term_document_frequency(docs).orderBy(*order).limit(vocab_size)
    vocab = head.select(
        "term", F.row_number().over(Window.orderBy(*order)).cast("long").alias("token_id")
    )
    toks = cs.tokenize_with_vocab(docs, vocab)
    order_df = sp.shard_shuffle(docs, n_shards=n_shards, seed=seed)
    return (
        toks.join(order_df, on="doc_id")
        .select("doc_id", "shard", "pos", "n_tokens", "n_oov", "ids_csv")
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
    )



@task(
    "llm-export-training-shards",
    cadence="daily",
    vocab_size=100,
    n_shards=8,
    seed="ep0",
)
def llm_export_training_shards(
    spark: SparkSession,
    base_dir: str,
    vocab_size: int = 100,
    n_shards: int = 8,
    seed: str = "ep0",
    in_dir: str | None = None,
    out_dir: str | None = None,
) -> dict:
    """The LAST MILE of the training-data pipeline: turn a curated
    corpus into the sharded, shuffled, tokenized artifact a training
    loader consumes. Chains the already-oracle-checked operators:

    1. vocabulary = the corpus's top-``vocab_size`` document-frequency
       terms (rank = token id, ties by term — the tokenize_vocab_ids
       contract; a production run passes a fixed external vocab
       instead),
    2. ``tokenize_with_vocab`` — token-id sequences, OOV = 0,
    3. ``shard_shuffle(seed)`` — the reproducible hash-random global
       order (bucket-then-rank; NEVER a single global sort), one seed
       per epoch,
    4. write parquet PARTITIONED BY shard, rows sorted by ``pos``
       within each shard file — a loader streams shards in any
       interleaving and replays the identical order on every engine.

    Scale shape: the vocab is a broadcast; tokenization is one
    posexplode + broadcast join + doc-keyed reassembly; the shuffle
    order is n_shards independent window partitions (each bounded at
    |corpus|/n_shards); the final exchange is one repartition by shard
    (one output file per shard partition at real scale). Reads
    ``in_dir`` (default: the llm-curate-corpus output if present, else
    the raw documents table)."""
    import os  # noqa: PLC0415

    configure(spark)

    src = in_dir
    if src is None:
        cur = f"{base_dir}/curated_documents"
        src = cur if os.path.isdir(cur) else f"{base_dir}/documents.parquet"
    docs = spark.read.parquet(src)
    sharded = build_training_shards(docs, vocab_size=vocab_size, n_shards=n_shards, seed=seed)
    out = out_dir or f"{base_dir}/training_shards/{seed}"
    sharded.write.mode("overwrite").partitionBy("shard").parquet(out)
    stats = spark.read.parquet(out).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("shard").alias("n_shards_written"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_oov").alias("total_oov"),
    ).collect()[0]
    return {
        "n_docs": stats["n_docs"],
        "n_shards_written": stats["n_shards_written"],
        "total_tokens": stats["total_tokens"],
        "oov_bp": int(round(10000.0 * stats["total_oov"] / stats["total_tokens"]))
        if stats["total_tokens"]
        else 0,
        "vocab_size": vocab_size,
        "seed": seed,
        "out_dir": out,
    }


@task("llm-stream-ingest-dedup", cadence="hourly", max_files_per_trigger=0)
def llm_stream_ingest_dedup(
    spark: SparkSession,
    base_dir: str,
    in_dir: str | None = None,
    index_dir: str | None = None,
    out_dir: str | None = None,
    max_files_per_trigger: int = 0,
) -> dict:
    """CONTINUOUS-INGEST near-dup suppression with index append-back —
    the production (order-dependent) variant of the oracle-checked
    streaming_dedup_lsh query (plans/q_streaming.py), which keeps its
    index static for batching-invariant determinism. Here each
    micro-batch (a) probes the persisted LSH band index, (b) admits
    only docs with ZERO band collisions, and (c) appends the admitted
    docs' buckets back to the index — so a near-dup arriving in a LATER
    batch is suppressed by an EARLIER batch's novel doc, which a static
    index cannot do. Within one batch, near-dup siblings are both
    admitted (and both indexed); the batch is the admission quantum —
    the crawler controls the trade by sizing triggers.

    Replay idempotence: ``foreachBatch`` re-delivers the in-flight
    batch after a crash, so both sinks write to ``batch=<id>``
    subdirectories with overwrite — a replayed batch rewrites its own
    files instead of duplicating rows (the same contract as the keyed
    upsert sink's staging swap). Duplicate BUCKET rows would be
    harmless (the probe is a semi-join) but get the same treatment for
    free. The checkpoint lives under ``base_dir`` so a restarted task
    resumes from the unprocessed files.

    Scale shape: per batch, one shuffle over the batch's shingles
    (MinHash aggregation) and one equi-join against the index on the
    band-bucket key — never an all-pairs comparison; the index is a
    bucket SET (one slim column), read fresh each batch so the
    append-back is visible. Admitted docs land as parquet (text and
    all); the lake-compaction task owns the small-file debt both sinks
    accrue."""
    import os  # noqa: PLC0415

    configure(spark)

    src = in_dir or f"{base_dir}/ingest"
    idx_dir = index_dir or f"{base_dir}/lsh_band_index"
    dst = out_dir or f"{base_dir}/ingested_documents"
    ckpt = f"{base_dir}/ingest_ckpt"

    schema = spark.read.parquet(src).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(src)

    totals = {"n_ingested": 0, "n_novel": 0, "n_batches": 0}

    def _admit(batch: DataFrame, batch_id: int) -> None:
        # Ingest batches are typically crawler-staged coalesced files
        # whose ~128MB parquet row groups gate the batch scan to ~1
        # WORKING task per file (the batch plan shows 32 split
        # partitions, but parquet parallelism is row-group-bound — r9
        # audit), and the shingle/MinHash map work happens BEFORE any
        # exchange — left alone it runs single-threaded over the whole
        # batch (measured r8: 35 s/batch at 250k docs vs ~7 s spread).
        # Re-spread to the session's parallelism before materializing;
        # hash-membership semantics are partitioning-invariant. Sources
        # with small row groups don't need this (streaming_dedup_lsh's
        # respread A/B at sf30 was sign-mixed noise — left alone).
        batch = batch.repartition(
            batch.sparkSession.sparkContext.defaultParallelism
        ).localCheckpoint(eager=True)  # two consumers below
        buckets = dd.band_buckets(dd.minhash_signatures(batch))
        have_index = any(
            f.startswith("batch=") for f in os.listdir(idx_dir)
        ) if os.path.isdir(idx_dir) else False
        if have_index:
            # Crash-replay guard: foreachBatch re-delivers the in-flight
            # batch, whose OWN batch=<id> index partition may already
            # exist from the crashed attempt. Probing it would make the
            # batch's docs hit their own buckets — novel goes empty and
            # the overwrite erases the previously-admitted rows. The
            # basePath read surfaces the `batch` partition column, so
            # exclude the in-flight id before the semi-join.
            idx = (
                spark.read.option("basePath", idx_dir)
                .parquet(f"{idx_dir}/batch=*")
                .where(F.col("batch") != F.lit(int(batch_id)))
            )
            hit_docs = buckets.join(idx, on="bucket", how="left_semi").select("doc_id").distinct()
            novel = batch.join(hit_docs, on="doc_id", how="left_anti").localCheckpoint(eager=True)
        else:
            novel = batch
        novel.write.mode("overwrite").parquet(f"{dst}/batch={batch_id}")
        (
            buckets.join(novel.select("doc_id"), on="doc_id", how="left_semi")
            .select("bucket")
            .distinct()
            .write.mode("overwrite")
            .parquet(f"{idx_dir}/batch={batch_id}")
        )
        totals["n_ingested"] += batch.count()
        totals["n_novel"] += novel.count()
        totals["n_batches"] += 1

    q = (
        stream.writeStream.foreachBatch(_admit)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("llm-stream-ingest-dedup did not finish within 600s")
    finally:
        from .q_streaming import _unload_state_stores  # noqa: PLC0415

        _unload_state_stores(spark)

    return {
        "n_batches": totals["n_batches"],
        "n_ingested": totals["n_ingested"],
        "n_novel": totals["n_novel"],
        "n_suppressed": totals["n_ingested"] - totals["n_novel"],
        "out_dir": dst,
        "index_dir": idx_dir,
    }
