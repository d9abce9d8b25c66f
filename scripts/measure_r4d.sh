#!/bin/bash
# Round-4 continuation queue: waits for the axon tunnel, then runs the
# session rituals + the remaining unmeasured arms.
#   1. defaults bench (headline re-confirmation, session ritual)
#   2. full-graph inference throughput (serving surface — no recorded TPU
#      number yet at the round-4 defaults)
#   3. Pallas probe -> combined gather+fanout-mean kernel matrix if a
#      window is open (the one VERDICT #8 arm still unmeasured on-chip)
#   4. CSR exact-val densify cost (Weak #6 tail: what the dense EVAL shard
#      costs when training storage is CSR)
set -u
LOG=${1:-bench_logs}
cd "$(dirname "$0")/.."
echo "=== measure_r4d start $(date -u +%FT%TZ) ===" | tee -a "$LOG/r4_queue.log"

# -- wait for the tunnel (device-level probe, subprocess-isolated) --------
for i in $(seq 1 120); do
  if timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128), jnp.bfloat16)
(x @ x).block_until_ready()
" > /dev/null 2>&1; then
    echo "tunnel UP at poll $i $(date -u +%FT%TZ)" | tee -a "$LOG/r4_queue.log"
    break
  fi
  if [ "$i" = 120 ]; then
    echo "tunnel never returned (120 polls)" | tee -a "$LOG/r4_queue.log"
    exit 1
  fi
  sleep 120
done

timeout 1800 python bench.py > "$LOG/r4d_bench_defaults.log" 2>&1
echo "defaults bench exit=$? $(date -u +%FT%TZ)" | tee -a "$LOG/r4_queue.log"
tail -1 "$LOG/r4d_bench_defaults.log"

timeout 1800 python scripts/bench_infer.py > "$LOG/r4d_infer.log" 2>&1
echo "infer bench exit=$? $(date -u +%FT%TZ)" | tee -a "$LOG/r4_queue.log"
tail -1 "$LOG/r4d_infer.log"

timeout 180 python -c "from tpu_sage import kernels; print('probe:', kernels.probe())" \
  > "$LOG/r4d_probe.log" 2>&1
cat "$LOG/r4d_probe.log"
if grep -q "probe: True" "$LOG/r4d_probe.log"; then
  SKIP_PROBE=1 timeout 2400 python scripts/bench_kernels.py > "$LOG/r4d_kernels.log" 2>&1
  echo "kernels exit=$?" | tee -a "$LOG/r4_queue.log"
else
  echo "pallas window closed (r4d probe)" | tee -a "$LOG/r4_queue.log"
fi

timeout 3000 python scripts/bench_csr_eval.py > "$LOG/r4d_csr_eval.log" 2>&1
echo "csr-eval exit=$? $(date -u +%FT%TZ)" | tee -a "$LOG/r4_queue.log"
tail -2 "$LOG/r4d_csr_eval.log"
echo "=== measure_r4d done $(date -u +%FT%TZ) ===" | tee -a "$LOG/r4_queue.log"
