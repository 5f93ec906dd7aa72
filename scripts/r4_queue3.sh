# Round-4 TPU queue, part 3 — run after r4_queue2.sh completes.
set -x
cd /root/repo
LOG=/tmp/r4_tpu.log
START=${1:-1}
run() {
  step=$1; shift
  t=$1; shift
  [ "$step" -lt "$START" ] && return 0
  echo "=== q3 step $step: $* $(date -u +%H:%M:%S) ===" >> $LOG
  timeout "$t" "$@" >> $LOG 2>&1
  echo "=== q3 step $step exit $? ===" >> $LOG
}

# 1. cached-latent training step (expect ~737 - 225 ms; the VERDICT-1 lever)
run 1 3600 python scripts/fambwd.py none --latents --remat=dots_attn
# 2. GS build_pairs phase split + budget sensitivity at 5M
run 2 3600 python scripts/gsbuild_phases.py 5
echo "QUEUE3 DONE $(date -u)" >> $LOG
