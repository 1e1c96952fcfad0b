#!/bin/bash
# Wait for the tunnelled TPU uplink to recover, then run bench.py once to
# pre-populate the persistent compile cache (and capture fresh numbers).
# Probe: a 2 MB device_put must round-trip in <60 s (~>0.03 MB/s is still
# dead; recovery looks like seconds).  Re-probe every 10 min.
set -u
cd /root/repo
LOG=/tmp/tunnel_watch.log
echo "[watch] start $(date)" >> "$LOG"
while true; do
  timeout 90 python - <<'EOF' >> "$LOG" 2>&1
import time, numpy as np, jax, jax.numpy as jnp
dev = jax.devices()[0]
x = np.random.rand(512, 1024).astype(np.float32)  # 2 MB
t0 = time.perf_counter()
xd = jax.device_put(x, dev); _ = float(jnp.sum(xd))
up = time.perf_counter() - t0
print(f"probe: 2MB up in {up:.1f}s = {2/up:.2f} MB/s", flush=True)
assert up < 45.0
EOF
  if [ $? -eq 0 ]; then
    echo "[watch] uplink alive $(date) — running bench" >> "$LOG"
    timeout 5400 python bench.py > /tmp/bench_r5_live.json 2> /tmp/bench_r5_live.log
    echo "[watch] bench exit=$? $(date)" >> "$LOG"
    break
  fi
  echo "[watch] uplink still dead $(date)" >> "$LOG"
  sleep 600
done
