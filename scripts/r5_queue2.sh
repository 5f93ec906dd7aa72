# Round-5 TPU queue 2:
#  1-2. MDM1024 single-chip training retry with the fused FF disabled
#       (its bwd kernel scoped-vmem OOMs at (m=36864,c=640) under remat —
#       q1 result; chunked flash bwd already landed). full remat first
#       (least HBM), then convs.
#  3. gssort_split 5 — attribute the GS build_pairs slope (sort vs expand
#     vs gather) before building the sort replacement.
#  4. sortbench — sort-primitive costs for the replacement design.
set -x
cd /root/repo
LOG=/tmp/r5_tpu.log
run() {
  step=$1; shift
  t=$1; shift
  echo "=== q2 step $step: $* $(date -u +%H:%M:%S) ===" >> $LOG
  timeout "$t" env MUDG_Q="$step" "$@" >> $LOG 2>&1
  echo "=== q2 step $step exit $? ===" >> $LOG
}
run 1 4000 env MUDG_FUSED_FF=0 python scripts/fambwd.py none --latents --preset=mdm1024
run 2 4000 env MUDG_FUSED_FF=0 python scripts/fambwd.py none --latents --preset=mdm1024 --remat=convs
run 3 2400 python scripts/gssort_split.py 5
run 4 2400 python scripts/sortbench.py 2 5 12
echo "QUEUE2 DONE $(date -u)" >> $LOG
