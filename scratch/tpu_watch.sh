#!/bin/bash
# Poll until the axon TPU grant succeeds; log timestamped attempts.
for i in $(seq 1 200); do
  if timeout 75 python -u -c "import jax; d=jax.devices(); print('OK', d)" >/tmp/tpu_ok.txt 2>&1; then
    echo "$(date +%H:%M:%S) TPU AVAILABLE: $(cat /tmp/tpu_ok.txt | tail -1)"
    exit 0
  fi
  echo "$(date +%H:%M:%S) attempt $i: no grant"
  sleep 45
done
exit 1
