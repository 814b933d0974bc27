#!/bin/bash
# r14 probe batch — run SERIALLY on an idle box, AFTER the registry
# bench (VERDICT r13 task 3: bench first, probe after — probes thrash
# the page cache). Tasks: 1 (label-prop sf31 at the disk-backed edge
# checkpoint), 6 (semdedup depth knob at g=30,000), 7 (harmonic /
# pagerank sf100).
set -u
cd /root/repo
export SPARK_GRAFT_CPUS=32
export SPARK_DRIVER_MEM=64g

run() { # run <log> <sfdir> <runs> <queries...>
  local log=$1 dir=$2 runs=$3; shift 3
  echo "=== $log : $dir runs=$runs $* ===" >> target/probe_r14.log
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_RUNS="$runs" \
    sbt -batch "runMain graft.Bench $*" 2>&1 | grep '"metric"' \
    | tee -a "target/$log" >> target/probe_r14.log
}

gen() { # gen <outdir> <replicas> <tables> [emb_sep]
  local out=$1 reps=$2 tables=$3 sep=${4:-0}
  [ -d "$out" ] && { echo "skip gen $out (exists)" >> target/probe_r14.log; return; }
  echo "=== gen $out reps=$reps tables=$tables sep=$sep ===" >> target/probe_r14.log
  SPARK_GRAFT_EMB_SEP=$sep sbt -batch "runMain graft.GenScale $out $reps $tables" \
    >> target/probe_r14.log 2>&1
}

: > target/probe_r14.log

# ---- corpora (lineitem-only where the probes read nothing else) ----
gen target/scale/sf1    10   lineitem
gen target/scale/sf10   100  lineitem
gen target/scale/sf31   310  lineitem
gen target/scale/sf100  1000 lineitem,orders
gen target/scale/sep31  310  embeddings 1
gen target/scale/sep100 1000 embeddings 1

# 1: label-prop with the DISK_ONLY edge checkpoint — sf1/sf10 regression
# vs r13 (11.44 / 125.8 s), then the sf31 point that OOM'd at r13
run probe_lp.log   target/scale/sf1   3 q_label_prop
run probe_lp.log   target/scale/sf10  3 q_label_prop
run probe_lp.log   target/scale/sf31  3 q_label_prop

# 7: the two most expensive registry queries get their sf100 reading
run probe_tail.log target/scale/sf100 1 q_harmonic_centrality
run probe_tail.log target/scale/sf100 1 q_pagerank

# 6: semdedup depth knob at the fourth decade's g=30,000 (direct-g probe)
probe_sd() { # probe_sd <dir> <g> <levels> <runs>
  echo "=== semdedup probe $1 g=$2 L=$3 runs=$4 ===" >> target/probe_r14.log
  sbt -batch "runMain graft.ProbeSemdedup $1 $2 $3 $4" 2>&1 | grep '"metric"' \
    | tee -a target/probe_sd.log >> target/probe_r14.log
}
probe_sd target/scale/sep31  30000 3 3
probe_sd target/scale/sep31  30000 4 3
probe_sd target/scale/sep100 30000 3 1
probe_sd target/scale/sep100 30000 4 1

echo "PROBES DONE" >> target/probe_r14.log
