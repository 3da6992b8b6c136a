"""Scale probe: production dedup pipeline end-to-end — simhash
(sim_bits=60) signature + 15-bit banding + connected components over
the resulting pair graph. Backs the SCALE30.md 'production CC' note
(the registered dedup_groups_cc consumes the 32-bit oracle-chain pair
graph instead; this measures the config production callers use). Warm
+ min-of-2, same convention as scale_probe.py; bracket with
tools/box_canary.py like every timing run (BENCHNOTES.md).

Usage: python tools/probe_prod_cc.py [SF_DIR]   # default /tmp/sf100
(generate the corpus first: tools/gen_testdata.py /tmp/sf100 100 documents)"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from open_bus_stride_etl_spark.operators import dedup as dd
from open_bus_stride_etl_spark.operators.util import release_cached
from open_bus_stride_etl_spark.session import build_session
from open_bus_stride_etl_spark.sources.lake import load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100"
spark = build_session("probe-prod-cc")


def run(count_pairs: bool) -> tuple[float, int, object]:
    t0 = time.time()
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    pairs = dd.simhash_hamming_pairs(docs, threshold=3, n_bands=4, sim_bits=60)
    comp = dd.connected_components(pairs)
    n_rows = comp.count()
    dt = time.time() - t0
    # Diagnostic pair count only on the warm run: after dt is taken the
    # pair graph may no longer be persisted, so counting it re-executes
    # the full simhash+banding subtree and would double timed runs.
    n_pairs = pairs.count() if count_pairs else "-"
    release_cached()
    return dt, n_rows, n_pairs


for i in range(3):  # run 0 = warm, min of runs 1-2 is the row
    dt, n_rows, n_pairs = run(count_pairs=(i == 0))
    print(f"run{i}: {dt:.2f}s  component_rows={n_rows}  pairs={n_pairs}", flush=True)
spark.stop()
