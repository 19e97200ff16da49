#!/bin/bash
# Keep the TPU worker alive; retries cover lingering axon claims.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
for attempt in $(seq 1 30); do
  python tools/tpu_worker.py && exit 0
  echo "[worker] attempt $attempt failed; retrying in 60s" >&2
  sleep 150
done
