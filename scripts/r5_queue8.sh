# Round-5 TPU queue 8: GS 5M fwd+bwd after the flattened projection (the
# (N,3,3) bwd-padding fix) + small-size spot re-check.
set -x
cd /root/repo
LOG=/tmp/r5_tpu.log
run() {
  step=$1; shift
  t=$1; shift
  echo "=== q8 step $step: $* $(date -u +%H:%M:%S) ===" >> $LOG
  timeout "$t" "$@" >> $LOG 2>&1
  echo "=== q8 step $step exit $? ===" >> $LOG
}
run 1 3000 env GSBENCH_AUTO=1 GSBENCH_BIG=1 python scripts/gsbench.py
run 2 3000 env GSBENCH_AUTO=1 python scripts/gsbench.py
echo "QUEUE8 DONE $(date -u)" >> $LOG
