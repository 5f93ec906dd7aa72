# Round-4 TPU queue, part 6 — MDM1024 re-measure with the FIXED smoke
# extrapolation (the old one divided the f32/chunk=1 VAE decode across 5
# steps then multiplied by 50: ~9x decode overcount, ~+5 s/clip). The new
# smoke differences a 5-step vs 2-step clip (per-clip constants cancel) and
# decodes bf16/chunk=16 like production.
set -x
cd /root/repo
LOG=/tmp/r4_tpu.log
START=${1:-1}
run() {
  step=$1; shift
  t=$1; shift
  [ "$step" -lt "$START" ] && return 0
  echo "=== q6 step $step: $* $(date -u +%H:%M:%S) ===" >> $LOG
  timeout "$t" "$@" >> $LOG 2>&1
  echo "=== q6 step $step exit $? ===" >> $LOG
}

# 1. bf16 recipe number (expect ~52-53 s/clip from fambench's 1035 ms step)
run 1 3600 python scripts/mdm1024_smoke.py --steps 5
# 2. int8-conv recipe number (expect ~49-50 s — the <=55 target)
run 2 3600 python scripts/mdm1024_smoke.py --steps 5 --int8 conv
echo "QUEUE6 DONE $(date -u)" >> $LOG
