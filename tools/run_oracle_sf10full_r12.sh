#!/bin/bash
# Round-12 sf10full DuckDB oracle sweep over the Verify dump produced by
# tools/run_verify_sf10full_r12.sh. Staging per the r11 playbook
# (string-heavy CTE chains re-evaluate per reference in DuckDB and spill;
# staged evaluation runs the SAME SQL text checkpointed) + the new d20
# chain; d02/d05/d06 are the capped baselines the ENGINE refuses at this
# scale, so their quadratic oracle SQL is skipped by contract.
set -u
cd /root/repo
echo "=== oracle sf10full: $(date -Is)"
# skips: d02/d05/d06 = engine cap refusals; the six IVF mirrors already
# passed at k=64 in the targeted waves (target/oracle_ivf_wave{1,2}.log)
python3 tools/check_oracle.py --pyuf \
  --skip=d01_exact_dedup,d03_minhash_lsh,d04_simhash,d07_contamination,d02_ngram_jaccard,d05_embedding_neardup,d06_neardup_clusters,s03_ann_ivf,s05_ann_ivf_multiprobe,s07_ivf_cell_stats,s10_ann_recall,s12_semdedup,s13_semantic_apply \
  --stage=d03_minhash_lsh:sh+sig,d08_lsh_clusters:sh+sig,d09_dedup_apply:sh+sig,d14_threshold_sweep:sh+sig,s09_knn_graph:vb,d20_boilerplate_strip:w+grams,d17_containment_sketch:sh+hs,d18_contamination_sketch:sh+hs,d19_decontaminate_sketch:sh+hs \
  target/testdata-local/sf10full target/vout_sf10full \
  2>&1 | tee target/oracle_sf10full_r12.txt
echo "=== oracle sf10full done rc=${PIPESTATUS[0]}: $(date -Is)"
