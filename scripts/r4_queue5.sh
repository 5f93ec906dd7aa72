# Round-4 TPU queue, part 5 — GS right-sizing measurements (true pairs at
# the 5M gsbench scene = 11.88M vs the blind 20M budget) + the re-fixed
# budget-sensitivity/phase probe (first run OOM'd the compile service at
# mult*4n = 80M pairs).
set -x
cd /root/repo
LOG=/tmp/r4_tpu.log
START=${1:-1}
run() {
  step=$1; shift
  t=$1; shift
  [ "$step" -lt "$START" ] && return 0
  echo "=== q5 step $step: $* $(date -u +%H:%M:%S) ===" >> $LOG
  timeout "$t" "$@" >> $LOG 2>&1
  echo "=== q5 step $step exit $? ===" >> $LOG
}

# 1. gsbench 5M with auto (right-sized) budgets — the task-6 number
run 1 2400 env GSBENCH_BIG=1 GSBENCH_AUTO=1 python scripts/gsbench.py
# 2. budget sensitivity relative to TRUE pairs + proj/build phase split
run 2 3600 python scripts/gsbuild_phases.py 5
# 3. gsbench standard sizes with auto budgets (regression check at 200k-2M)
run 3 2400 env GSBENCH_AUTO=1 python scripts/gsbench.py
echo "QUEUE5 DONE $(date -u)" >> $LOG
