#!/bin/bash
# Poll until the axon TPU grant succeeds; log timestamped attempts.
# Writes /tmp/tpu_available when the grant lands, then keeps confirming
# every 10 min so a lost grant is visible too.
while true; do
  if timeout 75 python -u -c "import jax; d=jax.devices(); print('OK', d)" >/tmp/tpu_ok.txt 2>&1; then
    echo "$(date +%H:%M:%S) TPU AVAILABLE: $(tail -1 /tmp/tpu_ok.txt)"
    touch /tmp/tpu_available
    sleep 600
  else
    rm -f /tmp/tpu_available
    echo "$(date +%H:%M:%S) no grant"
    sleep 90
  fi
done
