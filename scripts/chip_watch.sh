#!/usr/bin/env bash
# Probe the axon TPU until it answers, then fire the round-3 battery.
# Status lines go to /tmp/chip_watch.log. One instance only.
set -u
LOCK=/tmp/chip_watch.pid
if [ -f "$LOCK" ] && kill -0 "$(cat "$LOCK")" 2>/dev/null; then
  echo "chip_watch already running (pid $(cat "$LOCK"))"; exit 0
fi
echo $$ > "$LOCK"
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
while true; do
  echo "$(date +%H:%M:%S) probing" >> /tmp/chip_watch.log
  if timeout 300 python - <<'EOF' >> /tmp/chip_watch.log 2>&1
import jax, jax.numpy as jnp
d = jax.devices()
y = jax.device_get(jnp.dot(jnp.ones((256,256)), jnp.ones((256,256))).sum())
assert float(y) == 256.0**3  # ones-matmul: each entry 256, 256*256 entries
print("CHIP UP", d, flush=True)
EOF
  then
    echo "$(date +%H:%M:%S) CHIP UP — starting battery" >> /tmp/chip_watch.log
    bash scripts/round3_battery.sh >> /tmp/chip_watch.log 2>&1
    echo "$(date +%H:%M:%S) battery finished" >> /tmp/chip_watch.log
    break
  fi
  sleep 120
done
rm -f "$LOCK"
