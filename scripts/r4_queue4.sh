# Round-4 TPU queue, part 4 — resumes the part-2/3 work that died with the
# previous session (q2 step 3 never finished; q2 4-11 and q3 never started),
# reordered by VERDICT value: the cached-latent training step (VERDICT-1
# lever, expected ~512 ms from the fambwd encode=224.6 ms family) and the GS
# build_pairs phase split (the whole 5M regression lives there) come first.
set -x
cd /root/repo
LOG=/tmp/r4_tpu.log
START=${1:-1}
run() {
  step=$1; shift
  t=$1; shift
  [ "$step" -lt "$START" ] && return 0
  echo "=== q4 step $step: $* $(date -u +%H:%M:%S) ===" >> $LOG
  timeout "$t" "$@" >> $LOG 2>&1
  echo "=== q4 step $step exit $? ===" >> $LOG
}

# 1. cached-latent training step (VERDICT-1: expect ~737-225 ms <= 600 target)
run 1 3600 python scripts/fambwd.py none --latents --remat=dots_attn
# 2. GS build_pairs budget sensitivity + proj/build split at 5M
run 2 3600 python scripts/gsbuild_phases.py 5
# 3. MDM1024 int8 conv_wide (the <=55 s/clip attempt; conv was 58.1)
run 3 2400 python scripts/mdm1024_smoke.py --steps 5 --int8 conv_wide
# 4. MDM1024 per-family inference map (q2 step 3 retry with tractable chain)
run 4 7200 python scripts/fambench.py --preset=mdm1024 --chain=6,2
# 5. conv_wide at MDM512 (bench secondary)
run 5 2400 env MUDG_BENCH_INT8=conv_wide python bench.py
# 6. int8 outlier quality with percentile clipping (policy certification)
run 6 3600 python scripts/int8_quality.py --outliers --clip_pct=99.9
# 7. conv_wide quality (activation-quant error on wide matmuls)
run 7 3600 python scripts/int8_quality.py --which=conv_wide
# 8. conv backward MFU probe (chain-signature fix landed after the q1 crash)
run 8 1800 python scripts/convbwd.py
# 9. fambwd spatial with the unfused-FF pairing (landed after the q1 OOM)
run 9 3600 python scripts/fambwd.py spatial
# 10. fambwd temporal at dots_attn (stub fix landed after the q1 TypeError)
run 10 3600 python scripts/fambwd.py temporal --remat=dots_attn
echo "QUEUE4 DONE $(date -u)" >> $LOG
