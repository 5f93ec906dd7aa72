# Round-5 TPU queue 1 — stage-2 (MDM1024) single-chip training after the
# chunked flash-bwd fix (whole-L lse/delta lane padding OOM'd scoped vmem).
set -x
cd /root/repo
LOG=/tmp/r5_tpu.log
run() {
  step=$1; shift
  t=$1; shift
  echo "=== q1 step $step: $* $(date -u +%H:%M:%S) ===" >> $LOG
  timeout "$t" "$@" >> $LOG 2>&1
  echo "=== q1 step $step exit $? ===" >> $LOG
}
run 1 3600 python scripts/fambwd.py none --latents --preset=mdm1024 --remat=dots_attn
run 2 3600 python scripts/fambwd.py none --latents --preset=mdm1024
echo "QUEUE1 DONE $(date -u)" >> $LOG
