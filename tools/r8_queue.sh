#!/bin/bash
# r8 detached clean-window re-measure queue (VERDICT r7 asks #1 + #7).
# Fired at round START per BENCHNOTES r7 finding #4: clean windows are
# opportunistic across rounds, not schedulable within one — any row this
# lands is a bonus; existing SCALE30 values stand as honest upper bounds
# otherwise.
#
# Order: short sf30 chunks first (highest landing probability in a short
# window), then the two long sf100 upper-bound rows, then the bracketed
# production-CC probe. Every chunk is canary-bracketed by
# bracketed_probe.sh; keep only FAST/FAST rows.
set -u
cd "$(dirname "$0")/.."

SF01=/root/testdata/sf0.1
BR=/tmp/r8_brackets.log

# --- sf30: the 15 waived-threshold rows + the near-clean minhash chunk ---
MAX_ATTEMPTS=2 tools/bracketed_probe.sh /tmp/probe_sf30_r8.md $BR \
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
MAX_ATTEMPTS=2 tools/bracketed_probe.sh /tmp/probe_sf100_r8.md $BR \
  $SF01 /tmp/sf100 -- \
  "corpus_clean_keep" \
  "dedup_groups_cc"

# --- production-width CC pipeline, bracketed by hand (not a registered
# query name scale_probe knows; tools/probe_prod_cc.py) ---
python tools/box_canary.py --wait >> "$BR.wait" 2>&1
pre=$(python tools/box_canary.py 2>&1 | tail -1)
python tools/probe_prod_cc.py /tmp/sf100 >> /tmp/r8_prod_cc.log 2>&1
post=$(python tools/box_canary.py 2>&1 | tail -1)
echo "prod_cc attempt=1 pre=[$pre] post=[$post] :: probe_prod_cc sf100" >> "$BR"

echo "QUEUE DONE" >> "$BR"
