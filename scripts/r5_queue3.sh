# Round-5 TPU queue 3 (after q2):
#  1. MDM1024 full-remat training with the fused FF re-enabled under the
#     recalibrated c=640 bwd block picker — A/B vs q2's 2906 ms (FF off).
#  2. Same at --remat=convs (if activations fit, less recompute).
#  3. flashblock (bq, bkv) sweep at L=9216 (VERDICT item 6).
#  4. DPM-Solver++ full-size quality A/B at MDM512 (VERDICT item 5).
#  5. DPM-20 measured clip time at MDM1024.
#  6. bench.py — headline regression check + the new conv_wide secondary.
set -x
cd /root/repo
LOG=/tmp/r5_tpu.log
run() {
  step=$1; shift
  t=$1; shift
  echo "=== q3 step $step: $* $(date -u +%H:%M:%S) ===" >> $LOG
  timeout "$t" "$@" >> $LOG 2>&1
  echo "=== q3 step $step exit $? ===" >> $LOG
}
run 0 2400 python scripts/gsexpand_probe.py
run 1 4000 python scripts/fambwd.py none --latents --preset=mdm1024
run 1b 4000 python scripts/fambwd.py none --latents --preset=mdm1024 --freeze
run 2 4000 python scripts/fambwd.py none --latents --preset=mdm1024 --freeze --remat=convs
run 3 3000 python scripts/fb_sweep.py
run 4 4800 python scripts/dpm_ab.py
run 5 3000 python scripts/dpm_ab.py --preset=mdm1024
run 6 1800 python bench.py
echo "QUEUE3 DONE $(date -u)" >> $LOG
