# Round-5 TPU queue 6 (after q5): GS 5M fwd+bwd with the projection remat
# (the (N,3,3) padded-residual OOM fix), then stage-2 freeze re-measure at
# the final kernel state.
set -x
cd /root/repo
LOG=/tmp/r5_tpu.log
run() {
  step=$1; shift
  t=$1; shift
  echo "=== q6 step $step: $* $(date -u +%H:%M:%S) ===" >> $LOG
  timeout "$t" "$@" >> $LOG 2>&1
  echo "=== q6 step $step exit $? ===" >> $LOG
}
run 1 3000 env GSBENCH_AUTO=1 GSBENCH_BIG=1 python scripts/gsbench.py
run 2 4000 python scripts/fambwd.py none --latents --preset=mdm1024 --freeze
echo "QUEUE6 DONE $(date -u)" >> $LOG
