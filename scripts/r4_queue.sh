# Round-4 TPU measurement queue — run when the axon tunnel is back up.
# Each step is its own process (fresh compile context, per docs/STATE.md);
# everything appends to /tmp/r4_tpu.log. Ordered by VERDICT round-3 priority:
# measure what round 3 shipped unmeasured first, then the training probes.
#
# Usage: sh scripts/r4_queue.sh [start_step]
set -x
cd /root/repo
LOG=/tmp/r4_tpu.log
START=${1:-1}
run() {  # run <step> <timeout> <cmd...>
  step=$1; shift
  t=$1; shift
  [ "$step" -lt "$START" ] && return 0
  echo "=== step $step: $* $(date -u +%H:%M:%S) ===" >> $LOG
  timeout "$t" "$@" >> $LOG 2>&1
  echo "=== step $step exit $? ===" >> $LOG
}

# 1. headline sanity (also warms the persistent cache)
run 1 1500 python bench.py
# 2. streaming spatial kernel standalone at MDM1024 ds2 (UNMEASURED, default-on)
run 2 1800 python scripts/sattn_stream.py
# 3-4. MDM1024 A/B: stream on (default) vs off
run 3 2400 python scripts/mdm1024_smoke.py --steps 5
run 4 2400 env MUDG_STREAM_SPATIAL=0 python scripts/mdm1024_smoke.py --steps 5
# 5. MDM1024 int8-conv re-measure (round-2 estimate ~58.6 s/clip)
run 5 2400 python scripts/mdm1024_smoke.py --steps 5 --int8 conv
# 6. GS packed-key sort: the round-2 task-6 number (5M fwd target < 2 s)
run 6 2400 env GSBENCH_BIG=1 python scripts/gsbench.py
run 7 2400 python scripts/gsbench.py
# 8. int8 quality under adversarial outlier channels
run 8 3600 python scripts/int8_quality.py --outliers
# 9. conv backward MFU probe (training residual bucket)
run 9 1800 python scripts/convbwd.py
# 10. fambwd spatial stub retry (alone, fresh process)
run 10 3600 python scripts/fambwd.py spatial
# 11. fresh bwd family map at the CURRENT training default (the round-3 map
#     was measured under full remat; dots_attn replays far less)
run 11 7200 python scripts/fambwd.py --remat=dots_attn
# 12. inference per-family map at the current kernels (MFU accounting table)
run 12 7200 python scripts/fambench.py
# 13. tconv stage bwd decomposition (is a fused bwd kernel worth writing?)
run 13 2400 python scripts/tconvbwd.py
echo "QUEUE DONE $(date -u)" >> $LOG
