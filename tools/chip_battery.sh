#!/bin/bash
# Sequential on-chip measurement battery (single TPU holder at a time).
# Fire after the axon relay is reachable; logs land in /tmp/battery/.
set -u
mkdir -p /tmp/battery
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $*" | tee -a /tmp/battery/driver.log
  t0=$SECONDS
  timeout 2700 "$@" > "/tmp/battery/$name.log" 2>&1
  echo "=== $name exit=$? wall=$((SECONDS-t0))s" | tee -a /tmp/battery/driver.log
}

# Bootstrap the gitignored demo artifacts on a fresh machine: the voting /
# bench stages need the synthetic dataset and a trained checkpoint. (A prior
# battery run without these scored a silent "mIoU 0.0000"; the dataset now
# fails loudly, and this regenerates it.)
if ! ls data/synth/val/*.npz >/dev/null 2>&1; then
  run make_data python tools/make_synth_dataset.py --out data/synth
fi
if [ ! -d experiments/synth_demo/model ]; then
  run demo_train python -m pcf_tpu.train.trainer \
      --config pcf_tpu/configs/synth_demo.yaml
fi

run kparity       python benchmarks/kernel_parity.py
run mb_win_xla    python benchmarks/model_bench.py --pallas off --window --dtype bfloat16
run mb_win_fused  python benchmarks/model_bench.py --pallas on  --window --dtype bfloat16
# 2cm/PTF2 and PCF_Large on a 16 GiB v5e need BOTH remat knobs: --remat
# (residual blocks) alone measured 15.93 GiB on chip (OOM by 188 MiB, padding-
# dominated decoder backward stashes); adding --remat-layers lands at
# 11.06 GiB (2cm, 2 scenes) / 3.36 GiB (Large, 1 scene) — RESULTS.md r3.
run scale_2cm     python benchmarks/scale_bench.py --mode 2cm   --dtype bfloat16 --window --pallas --remat --remat-layers
run scale_large   python benchmarks/scale_bench.py --mode large --dtype bfloat16 --window --remat --remat-layers --scenes 1
run profile_eval  python benchmarks/profile_model.py --window --dtype bfloat16
# batched-voting speedup measurement: one covering-set chunk per forward
# (reference behavior, test_ScanNet_voting.py:222-249) vs vote_batch=4.
# Two passes each: the first populates the persistent compile cache, the
# second ("warm") is the steady-state wall the RESULTS.md table reports.
for pass in cold warm; do
  for vb in 1 4; do
    run vote_${pass}_b$vb python -m pcf_tpu.eval.voting \
        --config pcf_tpu/configs/synth_demo.yaml \
        --pretrain_path experiments/synth_demo/model --vote_num 3 \
        --set vote_batch=$vb --set eval_path=/tmp/battery/vote_${pass}_b$vb
  done
done
# ModelNet10-analog accuracy proof: 4 synthetic shape classes to >=90%
# held-out accuracy (reference tests_pointconv/test_modelnet10.py:307-450)
run classify      python benchmarks/classify_proof.py
# 2-process multi-host semantics on the CPU backend (gloo collectives)
run multihost     python tools/multihost_dryrun.py
run bench         python bench.py
echo "battery done" | tee -a /tmp/battery/driver.log
# Persist results into the repo: if no session is alive when the relay
# recovers, the round-end snapshot still captures the measurements.
dest=/root/repo/benchmarks/battery_results
mkdir -p "$dest"
cp /tmp/battery/driver.log "$dest"/
for f in /tmp/battery/*.log; do
  tail -c 16384 "$f" > "$dest/$(basename "$f")"
done
