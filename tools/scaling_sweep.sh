#!/usr/bin/env bash
# Standing SCALING.md measurement sweep (dev tooling, like sf1_gate.sh).
#
# One graft.Bench run per scale over the 30-query SCALING set (the 20
# original top-cost queries + 5 TPC-H join flagships + 5 LLM-pipeline
# flagships), then the fitted exponent table. All three scales run in
# ONE regime (the GRAFT_HEAP_CAP right-sized heap, regime (c) of
# SCALING.md's caveat), so the absolute seconds are comparable both
# across scales and round-over-round.
#
# Outputs: target/scaling/sf{0.01,0.1,1.0}.json + the markdown table on
# stdout (paste into SCALING.md).
#
# Usage: tools/scaling_sweep.sh   (~25-40 min; requires target/synth/sf1.0
#        — run tools/sf1_gate.sh or `sbt "runMain graft.SynthGen"` first)
set -euo pipefail
cd "$(dirname "$0")/.."

QS='^(a10_f1|an_corr_matrix|g11_pagerank|g12_concomp|g13_label_prop|g16_prob_bsp|g4_bsp_iter3|llm_ann_ivf|llm_ccnet_buckets|llm_dedup_clusters|llm_dedup_minhash|llm_pack_sequences|llm_semdedup|llm_tfidf_topterms|m14_changes_between|m16_cdc_apply|m18_compact_retain|st10_session_window|st12_cdc_stream|st13_cdc_apply_stream|st14_stream_heavy_hitters|st15_stream_left_join|st2_stream_window|st5_stream_join|st8_cluster_ingest|st9_stream_merge_into|tpch_q18|tpch_q21|tpch_q5|tpch_q8|tpch_q9)$'

mkdir -p target/scaling
for sf in 0.01 0.1; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf$sf sbt -batch "runMain graft.Bench $QS"
  cp target/bench.json target/scaling/sf$sf.json
done
SPARK_GRAFT_SF_DIR=target/synth/sf1.0 sbt -batch "runMain graft.Bench $QS"
cp target/bench.json target/scaling/sf1.0.json

python3 tools/fit_scaling.py \
  target/scaling/sf0.01.json target/scaling/sf0.1.json target/scaling/sf1.0.json
