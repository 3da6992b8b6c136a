#!/bin/bash
# Canary-bracketed scale-probe runner — the BENCHNOTES.md protocol as a
# script. Splits a query list into chunks, and for each chunk: waits for
# a fast box window (tools/box_canary.py --wait), records a pre-canary
# reading, runs the SCALE_QUERIES subset probe, records a post-canary
# reading, and re-queues the chunk (up to MAX_ATTEMPTS) if either
# bracket came back contended. Chunking bounds the exposure: a
# mid-probe contention spike invalidates one chunk's rows, not the
# whole sweep (a full 19-query sf30 sweep is ~15 min — longer than many
# of this box's clean windows).
#
# Usage:
#   tools/bracketed_probe.sh OUT_MD BRACKET_LOG SF_DIR... -- CHUNK [CHUNK...]
# where each CHUNK is a comma-separated SCALE_QUERIES list. Example:
#   tools/bracketed_probe.sh /tmp/probe.md /tmp/brackets.log \
#     /root/testdata/sf0.1 /tmp/sf30 -- "flat_export,pricing_summary" \
#     "dedup_minhash_lsh,dedup_groups_cc"
# The brackets log carries one line per attempt:
#   chunk0 attempt=1 pre=[canary: 4.31s (FAST; ...)] post=[...] :: <queries>
# Keep rows only from attempts whose pre AND post say FAST.
set -u
cd "$(dirname "$0")/.."
OUT=$1; BR=$2; shift 2
SF_DIRS=()
while [[ "$1" != "--" ]]; do SF_DIRS+=("$1"); shift; done
shift
MAX_ATTEMPTS=${MAX_ATTEMPTS:-3}
i=0
for chunk in "$@"; do
  for ((attempt = 1; attempt <= MAX_ATTEMPTS; attempt++)); do
    python tools/box_canary.py --wait >> "$BR.wait" 2>&1
    pre=$(python tools/box_canary.py 2>&1 | tail -1)
    SCALE_QUERIES="$chunk" python tools/scale_probe.py "$OUT" "${SF_DIRS[@]}" \
      >> "$BR.probe" 2>&1
    post=$(python tools/box_canary.py 2>&1 | tail -1)
    echo "chunk$i attempt=$attempt pre=[$pre] post=[$post] :: $chunk" >> "$BR"
    [[ "$post" != *CONTENDED* && "$pre" != *CONTENDED* ]] && break
  done
  i=$((i + 1))
done
echo "DONE" >> "$BR"
