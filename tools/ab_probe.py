"""Interleaved paired A/B measurement harness — the protocol for
performance claims on this box, which sees multi-minute EXTERNAL load
spikes (load avg >10 with zero local processes; see CLAUDE.md). A
sequential A...A B...B comparison straddling one spike is garbage; an
interleaved A B A B ... design cancels slow drift because each pair
shares its neighborhood's load, and the PAIRED deltas (not the means)
are the statistic.

Usage:
    python tools/ab_probe.py QUERY_A QUERY_B [rounds] [sf_dir]
        # paired per-round deltas of two registered queries
    AB_CONF="spark.sql.shuffle.partitions=64" python tools/ab_probe.py QUERY QUERY [rounds]
        # same query, variant B runs under the given session conf(s) —
        # a config A/B (conf restored between runs)

Each round times A then B (cold operator caches: release_cached after
every run, the bench.py convention), prints the pair, and at the end
reports median paired delta and the sign counts — if the deltas don't
agree in sign across most rounds, the difference is inside this box's
noise and should be reported as such.

This is the harness the r5 BLAS-thread-pinning decision used (killed:
2-4% paired delta, structurally capped by the MAX_THREADS=2 OpenBLAS
build) — kept as a tool so future keep-or-kill perf calls follow the
same protocol instead of eyeballing two bench runs.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    qa, qb = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    confs = [
        kv.split("=", 1)
        for kv in os.environ.get("AB_CONF", "").split(",")
        if "=" in kv
    ]

    from open_bus_stride_etl_spark.operators.util import release_cached
    from open_bus_stride_etl_spark.session import build_session

    import __spark_entry__ as entry

    spark = build_session("ab-probe")
    qs = entry.queries()
    for name in (qa, qb):
        if name not in qs:
            raise SystemExit(f"unknown query: {name}")

    def timed(name: str, with_conf: bool) -> float:
        saved = {}
        if with_conf:
            for k, v in confs:
                saved[k] = spark.conf.get(k, None)
                spark.conf.set(k, v)
        try:
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            return time.time() - t0
        finally:
            release_cached()
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    # warm both variants once (codegen/JIT, file cache)
    timed(qa, False)
    timed(qb, bool(confs))
    deltas = []
    for i in range(rounds):
        ta = timed(qa, False)
        tb = timed(qb, bool(confs))
        deltas.append(tb - ta)
        print(f"round {i + 1}: A={ta:.3f}s B={tb:.3f}s delta={tb - ta:+.3f}s", flush=True)
    med = statistics.median(deltas)
    pos = sum(1 for d in deltas if d > 0)
    print(
        f"median paired delta (B - A): {med:+.3f}s; "
        f"B slower in {pos}/{rounds} rounds"
        + ("" if pos in (0, rounds) else "  [mixed signs: treat as noise]")
    )


if __name__ == "__main__":
    main()
