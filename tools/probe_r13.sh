#!/bin/bash
# r13 probe batch — run SERIALLY on an idle box (VERDICT r12 tasks 1/2/6/7).
# Each stanza: one Bench invocation, one log under target/.
set -u
cd /root/repo
export SPARK_GRAFT_CPUS=32
export SPARK_DRIVER_MEM=64g

run() { # run <log> <sfdir> <runs> <queries...>
  local log=$1 dir=$2 runs=$3; shift 3
  echo "=== $log : $dir runs=$runs $* ===" >> target/probe_r13.log
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_RUNS="$runs" \
    sbt -batch "runMain graft.Bench $*" 2>&1 | grep '"metric"' \
    | tee -a "target/$log" >> target/probe_r13.log
}

: > target/probe_r13.log

# 6: quality classifier spread (sf1/sf10, median-of-3)
run probe_qc.log    target/scale/sf1   3 q_quality_classifier
run probe_qc.log    target/scale/sf10  3 q_quality_classifier

# 2: jaccard + cc_bigstar post-payload-shrink (3 runs for r12 comparability)
run probe_jac.log   target/scale/sf10  3 q_dedup_jaccard q_cc_bigstar
run probe_jac.log   target/scale/sf31  3 q_dedup_jaccard q_cc_bigstar
run probe_jac.log   target/scale/sf100 3 q_dedup_jaccard q_cc_bigstar

# 1/7: label_prop third decade (sf31 median-of-3; sf100 single-shot)
run probe_lp.log    target/scale/sf31  3 q_label_prop
run probe_lp.log    target/scale/sf100 1 q_label_prop

# 7: heavy-tail sf100 (3 runs)
run probe_tail.log  target/scale/sf100 3 q_curate_full q_dedup_incremental

# 5: semdedup depths on the work-measuring (rotation-separated) corpora
run probe_sd.log    target/scale/sep31  3 q_semdedup q_semdedup_deep
run probe_sd.log    target/scale/sep100 1 q_semdedup
run probe_sd.log    target/scale/sep100 1 q_semdedup_deep

# regression guard: the full registry at the driver's bench SF
run probe_full01.log /root/testdata/sf0.1 3

echo "PROBES DONE" >> target/probe_r13.log
