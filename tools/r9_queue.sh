#!/bin/bash
# r9 detached clean-window re-measure queue (VERDICT r8 ask #3).
# Fired at round START per the BENCHNOTES protocol: clean windows are
# opportunistic across rounds, not schedulable within one — any row this
# lands is a bonus; existing SCALE30 values stand as honest upper bounds
# otherwise.
#
# ADVICE r8 fix: the mild-window override is now baked in. The queue
# runs at BOX_CANARY_FAST=5.6 by default (~1.2x accepted deficit —
# after r7-late ~5h + r8 ~4.5h with ZERO strict 4.6s windows, a queue
# pinned to 4.6 reproduces the stall instead of landing honest
# tighter upper bounds). Every bracket records the EXACT reading, so
# a row whose pre/post both read <= 4.6 is still a strict-clean row;
# rows in (4.6, 5.6] are mild-window upper bounds and must be
# annotated as such when transcribed into SCALE30.md. Run with
# BOX_CANARY_FAST=4.6 to restore the strict protocol.
set -u
cd "$(dirname "$0")/.."

export BOX_CANARY_FAST=${BOX_CANARY_FAST:-5.6}

SF01=/root/testdata/sf0.1
BR=/tmp/r9_brackets.log

# --- sf30: the 15 waived-threshold rows + the near-clean minhash chunk ---
MAX_ATTEMPTS=2 tools/bracketed_probe.sh /tmp/probe_sf30_r9.md $BR \
  $SF01 /tmp/sf30 -- \
  "dedup_minhash_lsh" \
  "text_repetition,tokenize_vocab_ids,balanced_corpus,pricing_summary" \
  "ann_ivf_persisted_topk,ann_lsh_multiprobe_topk,kmeans_assign,split_leakage_check" \
  "quantile_quality_keep,streaming_upsert_snapshot" \
  "flat_export,shared_span_pairs" \
  "corpus_clean_keep" \
  "streaming_dedup_lsh" \
  "streaming_click_purchase_join"

# --- sf100: the two contended upper-bound rows (single-query chunks) ---
MAX_ATTEMPTS=2 tools/bracketed_probe.sh /tmp/probe_sf100_r9.md $BR \
  $SF01 /tmp/sf100 -- \
  "corpus_clean_keep" \
  "dedup_groups_cc"

# --- production-width CC pipeline, bracketed by hand (not a registered
# query name scale_probe knows; tools/probe_prod_cc.py) ---
python tools/box_canary.py --wait >> "$BR.wait" 2>&1
pre=$(python tools/box_canary.py 2>&1 | tail -1)
python tools/probe_prod_cc.py /tmp/sf100 >> /tmp/r9_prod_cc.log 2>&1
post=$(python tools/box_canary.py 2>&1 | tail -1)
echo "prod_cc attempt=1 pre=[$pre] post=[$post] :: probe_prod_cc sf100" >> "$BR"

echo "QUEUE DONE" >> "$BR"
