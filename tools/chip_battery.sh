#!/bin/bash
# Sequential on-chip measurement battery (single TPU holder at a time).
# Fire after the axon relay is reachable; logs land in /tmp/battery/.
set -u
mkdir -p /tmp/battery
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $*" | tee -a /tmp/battery/driver.log
  timeout 2700 "$@" > "/tmp/battery/$name.log" 2>&1
  echo "=== $name exit=$?" | tee -a /tmp/battery/driver.log
}

run kparity       python benchmarks/kernel_parity.py
run mb_win_xla    python benchmarks/model_bench.py --pallas off --window --dtype bfloat16
run mb_win_fused  python benchmarks/model_bench.py --pallas on  --window --dtype bfloat16
run scale_2cm     python benchmarks/scale_bench.py --mode 2cm   --dtype bfloat16 --window
run scale_large   python benchmarks/scale_bench.py --mode large --dtype bfloat16 --window
run profile_eval  python benchmarks/profile_model.py --window --dtype bfloat16
run bench         python bench.py
echo "battery done" | tee -a /tmp/battery/driver.log
