# Round-4 TPU queue, part 8 — flashblock spatial kernel (new long-L tier)
# measurements at MDM1024 ds1, then the end-to-end A/B.
set -x
cd /root/repo
LOG=/tmp/r4_tpu.log
START=${1:-1}
run() {
  step=$1; shift
  t=$1; shift
  [ "$step" -lt "$START" ] && return 0
  echo "=== q8 step $step: $* $(date -u +%H:%M:%S) ===" >> $LOG
  timeout "$t" "$@" >> $LOG 2>&1
  echo "=== q8 step $step exit $? ===" >> $LOG
}

# 1. standalone A/B + parity at (32, 9216, 320, h5)
run 1 2400 python scripts/sattn_fb.py
# 2-3. end-to-end MDM1024: flashblock on (default) vs off
run 2 3600 env MUDG_FLASHBLOCK=1 python scripts/mdm1024_smoke.py --steps 5
run 3 3600 python scripts/mdm1024_smoke.py --steps 5
# 4. int8-conv + flashblock (the serving stack)
run 4 3600 env MUDG_FLASHBLOCK=1 python scripts/mdm1024_smoke.py --steps 5 --int8 conv
echo "QUEUE8 DONE $(date -u)" >> $LOG
