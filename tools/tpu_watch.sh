#!/bin/bash
# Probe the TPU relay until it answers, then run the queued experiments
# sequentially (never two TPU processes at once).  Results land in
# /tmp/exp_results/.
set -u
mkdir -p /tmp/exp_results
cd /root/repo
probe() {
  timeout 600 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()), jax.devices())
" >/tmp/exp_results/probe.log 2>&1
}
for i in $(seq 1 100); do
  if probe; then
    echo "probe OK at attempt $i: $(date)" | tee -a /tmp/exp_results/status
    break
  fi
  echo "probe $i failed $(date)" >> /tmp/exp_results/status
  sleep 60
done
if ! tail -1 /tmp/exp_results/status | grep -q "probe OK"; then
  echo "TPU never came back" >> /tmp/exp_results/status
  exit 1
fi
stdbuf -oL -eL timeout 3600 python tools/exp_geometry.py \
  > /tmp/exp_results/exp_geometry.log 2>&1
echo "exp_geometry done rc=$? $(date)" >> /tmp/exp_results/status
stdbuf -oL -eL timeout 2400 python tools/exp_pair.py \
  > /tmp/exp_results/exp_pair.log 2>&1
echo "exp_pair done rc=$? $(date)" >> /tmp/exp_results/status
stdbuf -oL -eL timeout 2400 python tools/bench_match.py \
  > /tmp/exp_results/bench_match.log 2>&1
echo "bench_match done rc=$? $(date)" >> /tmp/exp_results/status
stdbuf -oL -eL timeout 2400 python bench.py \
  > /tmp/exp_results/bench.log 2>/tmp/exp_results/bench_stderr.log
echo "bench done rc=$? $(date)" >> /tmp/exp_results/status
stdbuf -oL -eL timeout 2400 python tools/bench_ba.py \
  > /tmp/exp_results/bench_ba.log 2>&1
echo "bench_ba done rc=$? $(date)" >> /tmp/exp_results/status
