# Round-5 TPU queue 5 (after q4): the discriminative DPM A/B (random-valued
# VAE + latent PSNR — the first run's constant-fill VAE compressed every
# sampler to ~64.4 dB), then GS smaller-size re-measures post-refactor.
set -x
cd /root/repo
LOG=/tmp/r5_tpu.log
run() {
  step=$1; shift
  t=$1; shift
  echo "=== q5 step $step: $* $(date -u +%H:%M:%S) ===" >> $LOG
  timeout "$t" "$@" >> $LOG 2>&1
  echo "=== q5 step $step exit $? ===" >> $LOG
}
run 0 3000 env GSBENCH_AUTO=1 GSBENCH_BIG=1 python scripts/gsbench.py
run 1 5400 python scripts/dpm_ab.py
run 2 3000 env GSBENCH_AUTO=1 python scripts/gsbench.py
run 3 1800 python bench.py
echo "QUEUE5 DONE $(date -u)" >> $LOG
