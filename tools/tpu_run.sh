#!/bin/bash
# Run a python script on the TPU with retries (the axon tunnel holds a
# single-client claim that lingers ~60s after the previous process exits).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
for attempt in 1 2 3 4 5 6 7 8; do
  python "$@"
  code=$?
  if [ $code -eq 0 ]; then exit 0; fi
  echo "[tpu_run] attempt $attempt exited with $code; retrying in 45s" >&2
  sleep 75
done
exit 1
