# Round-5 TPU queue 9: GS TPU parity spot-check after the projection
# rewrite + the driver entry hook compile check.
set -x
cd /root/repo
LOG=/tmp/r5_tpu.log
run() {
  step=$1; shift
  t=$1; shift
  echo "=== q9 step $step: $* $(date -u +%H:%M:%S) ===" >> $LOG
  timeout "$t" "$@" >> $LOG 2>&1
  echo "=== q9 step $step exit $? ===" >> $LOG
}
run 1 2400 python scripts/gs_parity_tpu.py
run 2 1500 python __graft_entry__.py
echo "QUEUE9 DONE $(date -u)" >> $LOG
