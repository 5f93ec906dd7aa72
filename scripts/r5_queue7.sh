# Round-5 TPU queue 7 (after q6): bench with the 150 s int8 gate (expect
# int8_s_per_clip ~4.8 via conv_wide).
set -x
cd /root/repo
LOG=/tmp/r5_tpu.log
echo "=== q7 step 1: bench $(date -u +%H:%M:%S) ===" >> $LOG
timeout 1800 python bench.py >> $LOG 2>&1
echo "=== q7 step 1 exit $? ===" >> $LOG
echo "QUEUE7 DONE $(date -u)" >> $LOG
