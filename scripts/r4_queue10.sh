# Round-4 TPU queue, part 10 — stage-2 (MDM1024) single-chip TRAINING
# feasibility + throughput (the reference trains stage-2 on 8 GPUs at 4
# clips/GPU; our train path was TPU-measured at 512 only). Unmasked grads
# (no temporal freeze) = conservative upper bound on step cost.
set -x
cd /root/repo
LOG=/tmp/r4_tpu.log
run() {
  step=$1; shift
  t=$1; shift
  echo "=== q10 step $step: $* $(date -u +%H:%M:%S) ===" >> $LOG
  timeout "$t" "$@" >> $LOG 2>&1
  echo "=== q10 step $step exit $? ===" >> $LOG
}
run 1 3600 python scripts/fambwd.py none --latents --preset=mdm1024 --remat=dots_attn
run 2 3600 python scripts/fambwd.py none --latents --preset=mdm1024
echo "QUEUE10 DONE $(date -u)" >> $LOG
