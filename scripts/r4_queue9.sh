# Round-4 TPU queue, part 9 — flashblock retry after the lane-pad fix
# (q8 step 1 crashed the compile helper: manual HBM DMAs need 128-multiple
# lane widths; C=320 k/v now padded to 384 for the DMA'd buffers).
set -x
cd /root/repo
LOG=/tmp/r4_tpu.log
START=${1:-1}
run() {
  step=$1; shift
  t=$1; shift
  [ "$step" -lt "$START" ] && return 0
  echo "=== q9 step $step: $* $(date -u +%H:%M:%S) ===" >> $LOG
  timeout "$t" "$@" >> $LOG 2>&1
  echo "=== q9 step $step exit $? ===" >> $LOG
}

run 1 2400 python scripts/sattn_fb.py
# gsbench 5M with exact budgets (q5 step 1 OOM'd in the eager count pass)
run 4 2400 env GSBENCH_BIG=1 GSBENCH_AUTO=1 python scripts/gsbench.py
run 2 3600 env MUDG_FLASHBLOCK=1 python scripts/mdm1024_smoke.py --steps 5
run 3 3600 env MUDG_FLASHBLOCK=1 python scripts/mdm1024_smoke.py --steps 5 --int8 conv
echo "QUEUE9 DONE $(date -u)" >> $LOG
