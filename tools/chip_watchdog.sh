#!/bin/sh
# Poll the TPU tunnel with a tiny exec+fetch canary; when a round trip
# comes back under the healthy threshold, launch the r05 part-d campaign.
# The 2026-08-21 session hit ~4 min/round-trip relay degradation — burning
# 40-min timeouts per arm in that state measures the tunnel, not the
# framework.
L=${CAMPAIGN_LOG:-/root/repo/bench_campaign_r05.log}
echo "=== chip watchdog start $(date -u) ===" >> $L
while true; do
  T=$(timeout 480 python -c "
import time, numpy as np, jax, jax.numpy as jnp
x = jax.device_put(jnp.ones((1024,1024), jnp.bfloat16))
f = jax.jit(lambda a: a@a)
t0 = time.time(); np.asarray(f(x)); print(round(time.time()-t0,1))
" 2>/dev/null | tail -1)
  echo "watchdog: canary round-trip ${T:-timeout}s $(date -u +%H:%M:%S)" >> $L
  case "$T" in
    ''|*[!0-9.]*) ;;  # timeout / garbage: keep waiting
    *) if [ "$(printf '%.0f' "$T")" -lt 15 ] 2>/dev/null; then
         echo "watchdog: chip healthy, launching part d $(date -u)" >> $L
         cd "${CAMPAIGN_TREE:-/root/repo}"
         exec sh tools/chip_campaign_r05d.sh
       fi ;;
  esac
  sleep 180
done
