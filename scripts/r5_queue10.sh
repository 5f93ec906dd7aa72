# Round-5 TPU queue 10: driver entry() retry + bench after the whole-block
# spatial kernel budget tightening (ds1/ds2 now take the streaming tier).
set -x
cd /root/repo
LOG=/tmp/r5_tpu.log
run() {
  step=$1; shift
  t=$1; shift
  echo "=== q10 step $step: $* $(date -u +%H:%M:%S) ===" >> $LOG
  timeout "$t" "$@" >> $LOG 2>&1
  echo "=== q10 step $step exit $? ===" >> $LOG
}
run 1 1500 python __graft_entry__.py
run 2 1800 python bench.py
echo "QUEUE10 DONE $(date -u)" >> $LOG
