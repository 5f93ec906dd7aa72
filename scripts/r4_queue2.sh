# Round-4 TPU queue, part 2 — run after r4_queue.sh completes.
# Follow-ups from part-1 results: the GS 5M regression attribution
# (3.0 s vs round-2's 2.65), the MDM1024 per-family map (where do the
# 1219 ms go), and int8 outlier policy variants (clip_pct).
set -x
cd /root/repo
LOG=/tmp/r4_tpu.log
START=${1:-1}
run() {
  step=$1; shift
  t=$1; shift
  [ "$step" -lt "$START" ] && return 0
  echo "=== q2 step $step: $* $(date -u +%H:%M:%S) ===" >> $LOG
  timeout "$t" "$@" >> $LOG 2>&1
  echo "=== q2 step $step exit $? ===" >> $LOG
}

# 1. GS sort A/B + phase split at 5M (attributes the fwd regression)
run 1 2400 python scripts/gssort_ab.py 5
# 2. same at 2M (the other regressed point)
run 2 2400 python scripts/gssort_ab.py 2
# 3. MDM1024 per-family inference map (pair with flopmap --preset=mdm1024)
run 3 7200 python scripts/fambench.py --preset=mdm1024
# 4. int8-conv quality with percentile clipping under outliers
run 4 3600 python scripts/int8_quality.py --outliers --clip_pct=99.9
# 5-6. re-run the probes that crashed in part 1 (chain-signature bug fixed)
run 5 1800 python scripts/convbwd.py
run 6 2400 python scripts/tconvbwd.py
# 7-8. int8 conv_wide policy (convs + C>=1024 matmuls): MDM1024 + MDM512
run 7 2400 python scripts/mdm1024_smoke.py --steps 5 --int8 conv_wide
run 8 2400 env MUDG_BENCH_INT8=conv_wide python bench.py
# 9. conv_wide quality (activation-quant error on wide attention/FF matmuls)
run 9 3600 python scripts/int8_quality.py --which=conv_wide
# 10. fambwd spatial retry with the unfused-FF pairing (part-1 step 10 OOM'd)
run 10 3600 python scripts/fambwd.py spatial
# 11. fambwd temporal at dots_attn (part-1 step 11 stub crashed on the new
#     positional context arg; stub fixed)
run 11 3600 python scripts/fambwd.py temporal --remat=dots_attn
echo "QUEUE2 DONE $(date -u)" >> $LOG
