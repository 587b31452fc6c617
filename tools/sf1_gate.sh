#!/usr/bin/env bash
# Standing synthetic-sf1.0 correctness gate (dev tooling, like check.py).
#
# Regenerates the deterministic synthetic sf1.0 (graft.SynthGen: FK-coherent
# 10x replication of the driver's sf0.1), dumps the gate queries via
# graft.Verify, and oracle-checks them in DuckDB -> CORRECTNESS_sf1.json.
# Run once per round on HEAD so the artifact always reflects the current
# engine (the gate caught a real distortion, tpch_q21, on its first run).
#
# Gate surface: the 20 SCALING top-cost queries + the 5 join-heavy TPC-H
# flagships (round 15) + the 5 LLM-pipeline flagships the 100 TB
# north-star names + the 3 remaining top-25-cost LLM queries
# (semdedup / ivf_kmeans / cluster_sample) (round 16).
#
# Usage: tools/sf1_gate.sh            (~30-45 min: SynthGen + Verify + DuckDB)
set -euo pipefail
cd "$(dirname "$0")/.."

SYNTH=target/synth/sf1.0
OUT=target/verify_sf1
GATE='^(a10_f1|an_corr_matrix|g11_pagerank|g12_concomp|g13_label_prop|g16_prob_bsp|g4_bsp_iter3|llm_ann_ivf|llm_ann_ivf_kmeans|llm_ccnet_buckets|llm_cluster_sample|llm_dedup_clusters|llm_dedup_minhash|llm_pack_sequences|llm_semdedup|llm_tfidf_topterms|m14_changes_between|m16_cdc_apply|m18_compact_retain|st10_session_window|st12_cdc_stream|st13_cdc_apply_stream|st14_stream_heavy_hitters|st15_stream_left_join|st2_stream_window|st5_stream_join|st8_cluster_ingest|st9_stream_merge_into|tpch_q18|tpch_q21|tpch_q5|tpch_q8|tpch_q9)$'

sbt -batch "runMain graft.SynthGen"   # no-op if the marker tag matches
sbt -batch "runMain graft.Verify $SYNTH $OUT $GATE"
# eager CTE staging: at sf1.0 DuckDB's CTE re-inlining turns the
# multi-round oracles (BSP supersteps, Lloyd rounds, shingle chains)
# into grinds or OOMs; staging each CTE once is semantics-preserving
GRAFT_STAGE_CTES=1 python3 tools/check.py "$SYNTH" "$OUT" CORRECTNESS_sf1.json
