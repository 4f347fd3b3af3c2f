#!/bin/bash
# Interleaved tracer-mode A/B on bandwidth-bound queries (off/full/duty x2)
set -e
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_ONLY=doc_gopher,doc_corpus_clean,doc_lm_ppl,doc_dedup_minhash
for i in 1 2; do
  for mode in off full duty; do
    out=/root/repo/tools/bench_runs/ab_${mode}_${i}.json
    SPARK_GRAFT_BENCH_OUT=$out GRAFT_TRACER=$mode \
      sbt -batch "runMain graft.Bench" > ${out%.json}.log 2>&1
    echo "done $mode $i"
  done
done
