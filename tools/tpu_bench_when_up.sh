#!/bin/bash
# Probe the axon TPU every 5 min; when it answers, run the round-2 bench
# sequence strictly sequentially (one process at a time — queued long
# dispatches crash the tunnel worker, CLAUDE.md).  Logs to $LOG.
LOG=${LOG:-/tmp/tpu_bench_sequence.log}
cd /root/repo
echo "[watch] start $(date -u +%H:%M:%S)" >> "$LOG"
while true; do
  if timeout 60 python - >> "$LOG" 2>&1 << 'EOF'
import jax, jax.numpy as jnp
print("[probe] devices:", jax.devices())
print("[probe] ok:", float((jnp.ones((8,)) + 1)[0]))
EOF
  then
    echo "[watch] TPU UP at $(date -u +%H:%M:%S)" >> "$LOG"
    break
  fi
  sleep 300
done
set -x
{
  echo "=== bench.py ==="
  timeout 900 python bench.py
  echo "=== dp_scale 1 2 3 ==="
  timeout 1200 python -m fem_elastoplasticity_tpu.benchmarks.dp_scale_bench 1 2 3
  echo "=== p4_tsx_bench (p-multigrid) ==="
  timeout 1200 python -m fem_elastoplasticity_tpu.benchmarks.p4_tsx_bench
  echo "=== ensemble_bench ==="
  timeout 1200 python -m fem_elastoplasticity_tpu.benchmarks.ensemble_bench
  echo "=== dp_scale 4 ==="
  timeout 1800 python -m fem_elastoplasticity_tpu.benchmarks.dp_scale_bench 4
  echo "=== dp_scale 5 ==="
  timeout 3600 python -m fem_elastoplasticity_tpu.benchmarks.dp_scale_bench 5
  echo "=== done $(date -u +%H:%M:%S) ==="
} >> "$LOG" 2>&1
