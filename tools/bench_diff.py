"""Per-query diff of two bench artifacts — the cause-note generator for
round-over-round comparisons (BENCHNOTES.md protocol).

Accepts either format per side:
  - a raw bench.py log/line (the full-map JSON line), or
  - a driver BENCH_r{N}.json ({"parsed": ..., "tail": ...} — the tail
    is scraped for per-query pairs the truncated parse dropped).

Usage:
    python tools/bench_diff.py BENCH_r04.json BENCH_r06.json [threshold]

Prints the common-query sums, then every query whose ratio exceeds the
threshold (default 1.2x either way) — the "needs a cause note" list.
"""

from __future__ import annotations

import json
import re
import sys


def per_query(path: str) -> dict[str, float]:
    text = open(path).read()
    q: dict[str, float] = {}
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        # raw bench log: bench prints the FULL map line then a short
        # summary line (CLAUDE.md) — keep whichever line carries more
        for line in text.splitlines():
            if '"queries"' in line:
                cand = json.loads(line[line.index("{"):]).get("queries") or {}
                if len(cand) > len(q):
                    q = cand
        return q
    if isinstance(d, dict):
        parsed = d.get("parsed") or d
        q.update((parsed.get("queries") or {}))
        for m in re.finditer(r'"([a-z_0-9]+)":([0-9.]+)', d.get("tail", "")):
            if m.group(1) not in ("value", "sf", "n_queries"):
                q.setdefault(m.group(1), float(m.group(2)))
    return q


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    a, b = per_query(sys.argv[1]), per_query(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.2
    common = sorted(set(a) & set(b))
    sa, sb = sum(a[k] for k in common), sum(b[k] for k in common)
    print(f"common queries: {len(common)}; sum A={sa:.1f}s B={sb:.1f}s ({sb / sa:.2f}x)")
    only_a, only_b = sorted(set(a) - set(b)), sorted(set(b) - set(a))
    if only_a:
        print(f"only in A: {only_a}")
    if only_b:
        print(f"only in B: {only_b}")
    flagged = [k for k in common if max(b[k] / a[k], a[k] / b[k]) > thr]
    flagged.sort(key=lambda k: b[k] - a[k], reverse=True)
    print(f"\nqueries beyond {thr}x (cause-note candidates):")
    for k in flagged:
        print(f"  {k:38s} A={a[k]:7.2f}  B={b[k]:7.2f}  ({b[k] / a[k]:.2f}x)")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # |head closed the pipe — not an error
        pass
