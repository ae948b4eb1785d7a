#!/bin/bash
# Poll until the axon TPU grant succeeds; log timestamped attempts.
# Writes /tmp/tpu_available when the grant lands, then AUTO-LAUNCHES the
# prepared measurement campaign (scratch/campaign.sh) exactly once —
# grant windows may be short, so don't wait for a human to react.
cd /root/repo
while true; do
  if timeout 75 python -u -c "import jax; d=jax.devices(); print('OK', d)" >/tmp/tpu_ok.txt 2>&1; then
    echo "$(date +%H:%M:%S) TPU AVAILABLE: $(tail -1 /tmp/tpu_ok.txt)"
    touch /tmp/tpu_available
    if [ ! -f /tmp/campaign_launched ]; then
      touch /tmp/campaign_launched
      echo "$(date +%H:%M:%S) launching campaign"
      bash scratch/campaign.sh >scratch/campaign.log 2>&1
      echo "$(date +%H:%M:%S) campaign exited $?"
    fi
    sleep 600
  else
    rm -f /tmp/tpu_available
    echo "$(date +%H:%M:%S) no grant"
    sleep 90
  fi
done
