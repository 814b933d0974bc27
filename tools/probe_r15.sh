#!/bin/bash
# r15 probe batch — VERDICT r14 tasks:
#  1: MEMORY_AND_DISK_SER A/B on the three |E|-checkpoint queries
#     (q_label_prop, q_harmonic_centrality, q_pagerank) at
#     sf1/sf10/sf31, median-of-3, vs the r14 DISK_ONLY and r12/r13
#     memory-resident readings on record in PLANS.md.
#  4: mechanical pre-flight scratch guard — the sf100 "disk-bound"
#     adjudication becomes arithmetic in the log, not prose.
#  7: q_cc_bigstar / q_dedup_incremental third-decade (sf31) readings
#     for a uniform iterative-query decade table.
# Run SERIALLY on an idle box, AFTER any registry bench (r13 lesson:
# bench first, probe after — probes thrash the page cache).
set -u
cd /root/repo
export SPARK_GRAFT_CPUS=32
export SPARK_DRIVER_MEM=64g

LOG=target/probe_r15.log

run() { # run <log> <sfdir> <runs> <queries...>
  local log=$1 dir=$2 runs=$3; shift 3
  echo "=== $log : $dir runs=$runs $* ===" >> "$LOG"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_RUNS="$runs" \
    sbt -batch "runMain graft.Bench $*" 2>&1 | grep '"metric"' \
    | tee -a "target/$log" >> "$LOG"
}

gen() { # gen <outdir> <replicas> <tables>
  local out=$1 reps=$2 tables=$3
  [ -d "$out" ] && { echo "skip gen $out (exists)" >> "$LOG"; return; }
  echo "=== gen $out reps=$reps tables=$tables ===" >> "$LOG"
  sbt -batch "runMain graft.GenScale $out $reps $tables" >> "$LOG" 2>&1
}

# ---- task 4: pre-flight scratch-estimate guard ----------------------
# The r14 sf100 graph adjudication ("disk-bound, not plan-bound")
# rested on a probe log whose pagerank line was PATH_NOT_FOUND (corpus
# already cleaned up), not an actual disk failure. Make the call
# MECHANICAL instead: an |E|-sized localCheckpoint writes
# BYTES_PER_EDGE x |E| of serialized blocks, and its construction
# shuffle holds roughly 2x that again simultaneously (map-output files
# + fetch-side spill), so the probe needs ~3 x 16 B x |E| of free
# scratch. |E| scales linearly in GenScale replicas (measured anchor:
# ~3.6e9 edge rows at 1000 reps — PLANS.md r14 sf100 table). The guard
# prints the full arithmetic and refuses the run when the estimate
# exceeds 90% of the box's free disk — the refusal line IS the
# adjudication artifact.
guard_scratch() { # guard_scratch <reps> <label>  -> 0 run, 1 refuse
  local reps=$1 label=$2
  local avail_gb
  avail_gb=$(df -BG --output=avail /root | tail -1 | tr -dc '0-9')
  python3 - "$reps" "$avail_gb" "$label" <<'EOF' >> "$LOG" 2>&1
import sys
reps, avail, label = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
EDGES_PER_REP = 3.6e6   # ~3.6e9 edge rows at 1000 reps (PLANS.md r14 sf100 table)
BYTES_PER_EDGE = 16     # two int64 columns, serialized checkpoint payload
SCRATCH_MULT = 3        # checkpoint + construction-shuffle map+fetch, held simultaneously
edges = reps * EDGES_PER_REP
need_gb = edges * BYTES_PER_EDGE * SCRATCH_MULT / 1e9
line = (f"[scratch-guard] {label}: reps={reps} -> |E| ~ {edges:.2e} rows x "
        f"{BYTES_PER_EDGE} B x {SCRATCH_MULT} (ckpt + construction shuffle) = "
        f"{need_gb:.1f} GB scratch vs {avail} GB free")
if need_gb > avail * 0.9:
    print(line + "  -> REFUSED: disk-bound by arithmetic; not attempted")
    sys.exit(1)
print(line + "  -> OK")
EOF
}

: > "$LOG"

# ---- corpora (exist from r14 unless cleaned) ------------------------
gen target/scale/sf1  10  lineitem,orders,documents
gen target/scale/sf10 100 lineitem,orders,documents
gen target/scale/sf31 310 lineitem,orders,documents

# ---- task 1: the SER A/B, all three queries x three SFs -------------
for sf in sf1 sf10 sf31; do
  reps=$(echo "$sf" | tr -dc '0-9'); reps=$((reps * 10))
  if guard_scratch "$reps" "graph A/B $sf"; then
    run probe_ab.log "target/scale/$sf" 3 q_label_prop
    run probe_ab.log "target/scale/$sf" 3 q_harmonic_centrality
    run probe_ab.log "target/scale/$sf" 3 q_pagerank
  fi
done

# ---- task 7: third decade for the two remaining iterative queries ---
run probe_iter31.log target/scale/sf31 3 q_cc_bigstar
run probe_iter31.log target/scale/sf31 3 q_dedup_incremental

# ---- task 4 artifact: the sf100 graph attempt, adjudicated by the
# guard instead of by filling the disk. If the guard ever passes here
# (bigger box), the run proceeds and the claim gets a real timing.
if guard_scratch 1000 "q_pagerank/q_harmonic_centrality sf100"; then
  gen target/scale/sf100 1000 lineitem,orders
  run probe_tail.log target/scale/sf100 1 q_harmonic_centrality
  run probe_tail.log target/scale/sf100 1 q_pagerank
fi

echo "PROBES DONE" >> "$LOG"
