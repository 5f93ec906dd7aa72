# Round-4 part 7 — after all TPU measurement queues: the full test suite
# with --durations (VERDICT round-3 item 8 needs per-test data before the
# fixture work; running it during TPU timing would contaminate the numbers
# on this 1-core host).
set -x
cd /root/repo
LOG=/tmp/r4_tpu.log
echo "=== q7: pytest --durations=60 $(date -u +%H:%M:%S) ===" >> $LOG
timeout 5400 python -m pytest tests/ -q --durations=60 >> $LOG 2>&1
echo "=== q7 exit $? $(date -u) ===" >> $LOG
