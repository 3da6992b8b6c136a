"""Paired A/B for persisting curate's `scored` frame (VERDICT r9 #2).

When an incremental run has n_remaining > 0, the task runs the scoring
scan (quality/lang regex kernels + fingerprint) once for the flags
aggregation and AGAIN for the write derivation. Persisting `scored`
fuses them — at the price of caching the full-text corpus. The repo's
persist history says such flips lose as often as they win, so: measure.

Usage: python tools/probe_scored.py SF_DIR [rounds] [--delta-mod N]

Same staging as probe_curate_index (seed run + loser-fp seeding so the
incremental run is the survivor-heavy daily-crawl shape, priming run to
build the band index); per round both variants (_PERSIST_SCORED
True/False) run interleaved from restored history snapshots, metrics +
artifact hashes asserted identical. Bracket with tools/box_canary.py.
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
from open_bus_stride_etl_spark.plans import llm_tasks  # noqa: E402
from open_bus_stride_etl_spark.plans.tasks import run_task  # noqa: E402
from open_bus_stride_etl_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else 4
    delta_mod = 100
    if "--delta-mod" in sys.argv:
        delta_mod = int(sys.argv[sys.argv.index("--delta-mod") + 1])

    spark = build_session("probe_scored")
    base = tempfile.mkdtemp(prefix="scored_")
    try:
        from open_bus_stride_etl_spark.operators import text as tx  # noqa: PLC0415

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
        seed_dir, full_dir = f"{base}/seed", f"{base}/full"
        docs.where(F.col("doc_id") % delta_mod != 0).write.parquet(
            f"{seed_dir}/documents.parquet"
        )
        docs.write.parquet(f"{full_dir}/documents.parquet")
        hist0 = f"{base}/hist0"
        run_task(spark, "llm-curate-corpus", base_dir=seed_dir,
                 out_dir=f"{base}/so", history_dir=hist0)
        release_cached()
        (
            spark.read.parquet(f"{seed_dir}/documents.parquet")
            .select(tx.doc_fingerprint(F.col("text")).alias("fingerprint"))
            .distinct()
            .write.mode("append")
            .parquet(f"{hist0}/seen_fingerprints.parquet")
        )
        mx = docs.agg(F.max("doc_id")).collect()[0][0]
        dummy = spark.createDataFrame(
            [(int(mx) + 1,
              "priming dummy document about glaciers carving valleys slowly "
              "over millennia while the patient mountains watch in silence")],
            "doc_id long, text string",
        )
        spark.read.parquet(f"{seed_dir}/documents.parquet").unionByName(dummy).write.parquet(
            f"{base}/prime/documents.parquet"
        )
        run_task(spark, "llm-curate-corpus", base_dir=f"{base}/prime",
                 out_dir=f"{base}/po", history_dir=hist0)
        release_cached()
        assert os.path.isdir(f"{hist0}/lsh_band_index.parquet")
        print("staged", flush=True)

        deltas = []
        ref = None
        for r in range(rounds):
            times = {}
            order = (True, False) if r % 2 == 0 else (False, True)
            for persist_scored in order:
                h = f"{base}/h_run"
                if os.path.isdir(h):
                    shutil.rmtree(h)
                shutil.copytree(hist0, h)
                llm_tasks._PERSIST_SCORED = persist_scored
                out = f"{base}/out_{persist_scored}"
                t0 = time.time()
                m = run_task(spark, "llm-curate-corpus", base_dir=full_dir,
                             out_dir=out, history_dir=h)
                times[persist_scored] = time.time() - t0
                release_cached()
                key = tuple(sorted((k, v) for k, v in m.items()
                                   if k not in ("elapsed_sec", "out_dir")))
                if ref is None:
                    ref = key
                assert key == ref, f"persist_scored={persist_scored} diverged"
            d = times[False] - times[True]  # + => persist wins
            deltas.append(d)
            print(f"round {r}: persist={times[True]:.2f}s nopersist={times[False]:.2f}s "
                  f"paired_delta={d:+.2f}s", flush=True)
        llm_tasks._PERSIST_SCORED = False
        deltas.sort()
        n_pos = sum(1 for d in deltas if d > 0)
        print(f"median paired delta (nopersist - persist): "
              f"{deltas[len(deltas)//2]:+.2f}s, signs {n_pos}/{len(deltas)} positive",
              flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
