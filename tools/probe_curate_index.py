"""Band-index incremental-curate probe (r10, VERDICT r9 #1).

Builds a staged corpus + history at a chosen scale, then measures the
incremental llm-curate-corpus run (the daily-crawl shape: history seeded
from a 90% subset, the run sees 100%) under both LSH strategies:

- band_index=True  — the amortized persisted band-bucket index
- band_index=False — the r9 recompute-per-run restricted pipeline

Usage:
    python tools/probe_curate_index.py SF_DIR [rounds] [--plans OUT_DIR]

With --plans it additionally dumps the incremental pairs frame's
``explain("formatted")`` for both strategies (the VERDICT done-criterion:
the indexed plan must show an index scan probe join and NO full-corpus
shingle/MinHash signature aggregation).

Per round the history dirs are restored from pristine snapshots (the
task APPENDS to seen/index), the two variants run interleaved
(ab_probe doctrine), and metrics + artifact hashes are asserted
identical. Bracket externally with tools/box_canary.py.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from open_bus_stride_etl_spark.operators.util import release_cached  # noqa: E402
from open_bus_stride_etl_spark.plans import llm_tasks  # noqa: E402,F401
from open_bus_stride_etl_spark.plans.tasks import run_task  # noqa: E402
from open_bus_stride_etl_spark.session import build_session  # noqa: E402


def artifact_hash(spark, path: str) -> tuple[int, int]:
    from open_bus_stride_etl_spark.functions.hashing import hex_to_long, row_md5  # noqa: PLC0415

    df = spark.read.parquet(path)
    h = hex_to_long(F.substring(row_md5(F.col("doc_id"), F.col("text")), 1, 10))
    r = df.agg(F.count(F.lit(1)).alias("n"), F.sum(h).alias("h")).collect()[0]
    return (r["n"], r["h"] or 0)


def main() -> None:
    sf_dir = sys.argv[1]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else 4
    delta_mod = 10  # seed = docs where id % delta_mod != 0 (10 -> 10% delta)
    if "--delta-mod" in sys.argv:
        delta_mod = int(sys.argv[sys.argv.index("--delta-mod") + 1])
    # --seed-losers: after the seed run, append EVERY seed doc's
    # fingerprint to the seen index (not just survivors'). The synthetic
    # corpus is adversarially loser-heavy (~1.5% of docs pass quality at
    # sf10), so the task's survivor-only seen index leaves b_ids ≈ the
    # whole corpus every run and the incremental restriction is nearly
    # vacuous — the loser-heavy regime. Pre-seeding loser fps is
    # semantics-preserving (quality/lang verdicts are content-
    # deterministic, so a seen quality-loser was never a survivor
    # candidate) and reproduces the survivor-heavy production regime
    # where b_ids is the true crawl delta. Both variants see the same
    # seen index, so the A/B stays fair.
    seed_losers = "--seed-losers" in sys.argv
    plans_dir = None
    if "--plans" in sys.argv:
        plans_dir = sys.argv[sys.argv.index("--plans") + 1]
        os.makedirs(plans_dir, exist_ok=True)

    spark = build_session("probe_curate_index")
    base = tempfile.mkdtemp(prefix="curidx_")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
        n_total = docs.count()
        # seed = all but every delta_mod-th doc; full corpus = the
        # incremental run (delta fraction = 1/delta_mod)
        seed_dir = f"{base}/seed"
        full_dir = f"{base}/full"
        docs.where(F.col("doc_id") % delta_mod != 0).write.parquet(
            f"{seed_dir}/documents.parquet"
        )
        docs.write.parquet(f"{full_dir}/documents.parquet")
        print(f"corpus: {n_total} docs, delta 1/{delta_mod}", flush=True)

        # pristine histories: seed run 1 (identical under both variants —
        # seen is None, the in-plan pipeline runs, no index is written)
        hist0 = f"{base}/hist0"
        t0 = time.time()
        m_seed = run_task(
            spark, "llm-curate-corpus", base_dir=seed_dir,
            out_dir=f"{base}/seed_out", history_dir=hist0,
        )
        release_cached()
        print(f"seed run: {time.time()-t0:.2f}s n_final={m_seed['n_final']}", flush=True)
        if seed_losers:
            from open_bus_stride_etl_spark.operators import text as _tx  # noqa: PLC0415

            (
                spark.read.parquet(f"{seed_dir}/documents.parquet")
                .select(_tx.doc_fingerprint(F.col("text")).alias("fingerprint"))
                .distinct()
                .write.mode("append")
                .parquet(f"{hist0}/seen_fingerprints.parquet")
            )
            print("seeded ALL processed fps into the seen index", flush=True)

        if plans_dir:
            # dump the incremental pairs frame's plan for both variants
            from open_bus_stride_etl_spark.operators import dedup as dd  # noqa: PLC0415
            from open_bus_stride_etl_spark.operators import text as tx  # noqa: PLC0415
            from open_bus_stride_etl_spark.plans.llm_tasks import _indexed_lsh_pairs  # noqa: PLC0415

            fdocs = spark.read.parquet(f"{full_dir}/documents.parquet")
            seen = spark.read.parquet(f"{hist0}/seen_fingerprints.parquet")
            cur = fdocs.select("doc_id", tx.doc_fingerprint(F.col("text")).alias("_fp"))
            b_ids = cur.join(
                seen.select(F.col("fingerprint").alias("_fp")), on="_fp", how="left_anti"
            ).select("doc_id")
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from dump_plans import plan_string  # noqa: PLC0415

            before = dd.minhash_lsh_pairs(fdocs, b_ids=b_ids)
            with open(f"{plans_dir}/curate_incremental_lsh_before.txt", "w") as fh:
                fh.write(plan_string(before))
            hist_p = f"{base}/hist_plan"
            shutil.copytree(hist0, hist_p)
            after = _indexed_lsh_pairs(spark, fdocs, hist_p, b_ids, cur)
            with open(f"{plans_dir}/curate_incremental_lsh_after.txt", "w") as fh:
                fh.write(plan_string(after))
            release_cached()
            print("plans dumped", flush=True)

        # bootstrap cost (index path, first incremental run) — reported
        # once, separately from the steady-state rounds
        hist_bs = f"{base}/hist_bs"
        shutil.copytree(hist0, hist_bs)
        t0 = time.time()
        run_task(spark, "llm-curate-corpus", base_dir=full_dir,
                 out_dir=f"{base}/bs_out", history_dir=hist_bs)
        release_cached()
        print(f"bootstrap incremental (index build rides the run): {time.time()-t0:.2f}s",
              flush=True)

        # steady-state A/B: both variants probe the SAME delta (full vs
        # seed) per round. The index snapshot must cover EXACTLY the
        # seed corpus — the timed run has to pay the honest O(batch)
        # top-up signing of the delta — so prime it with an incremental
        # run over seed + ONE fresh dummy doc (forcing the LSH branch;
        # a pure seed re-run hits the n_remaining==0 fast path and
        # builds no index). The dummy's fp lands in the primed seen
        # index but matches no full-corpus doc, so both variants'
        # anti-joins and metrics stay identical.
        hist_idx = f"{base}/hist_idx"
        shutil.copytree(hist0, hist_idx)
        prime_dir = f"{base}/prime"
        max_id = docs.agg(F.max("doc_id")).collect()[0][0]
        dummy = spark.createDataFrame(
            [(int(max_id) + 1,
              "priming dummy document about glaciers carving valleys slowly "
              "over millennia while the patient mountains watch in silence")],
            "doc_id long, text string",
        )
        spark.read.parquet(f"{seed_dir}/documents.parquet").unionByName(
            dummy
        ).write.parquet(f"{prime_dir}/documents.parquet")
        t0 = time.time()
        run_task(spark, "llm-curate-corpus", base_dir=prime_dir,
                 out_dir=f"{base}/prime_out", history_dir=hist_idx)
        release_cached()
        assert os.path.isdir(f"{hist_idx}/lsh_band_index.parquet"), (
            "priming run built no index — dummy doc failed the gates?"
        )
        print(f"priming incremental run (indexes the seed corpus): "
              f"{time.time()-t0:.2f}s", flush=True)

        deltas = {"idx": [], "recomp": []}
        ref = None
        for r in range(rounds):
            times = {}
            for variant in ("idx", "recomp") if r % 2 == 0 else ("recomp", "idx"):
                hsrc = hist_idx if variant == "idx" else hist0
                h = f"{base}/h_run"
                if os.path.isdir(h):
                    shutil.rmtree(h)
                shutil.copytree(hsrc, h)
                out = f"{base}/out_{variant}"
                t0 = time.time()
                m = run_task(
                    spark, "llm-curate-corpus", base_dir=full_dir, out_dir=out,
                    history_dir=h, band_index=(variant == "idx"),
                )
                dt = time.time() - t0
                release_cached()
                times[variant] = dt
                key = (tuple(sorted((k, v) for k, v in m.items()
                                    if k not in ("elapsed_sec", "out_dir"))),
                       artifact_hash(spark, out))
                if ref is None:
                    ref = key
                assert key == ref, f"variant {variant} diverged: {key} vs {ref}"
            deltas["idx"].append(times["idx"])
            deltas["recomp"].append(times["recomp"])
            print(f"round {r}: idx={times['idx']:.2f}s recomp={times['recomp']:.2f}s "
                  f"paired_delta={times['recomp']-times['idx']:+.2f}s", flush=True)
        paired = [b - a for a, b in zip(deltas["idx"], deltas["recomp"])]
        paired.sort()
        if paired:
            n_pos = sum(1 for d in paired if d > 0)
            print(f"median paired delta (recomp - idx): "
                  f"{paired[len(paired)//2]:+.2f}s, signs {n_pos}/{len(paired)} positive",
                  flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
