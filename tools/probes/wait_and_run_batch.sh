#!/bin/bash
# Poll the axon TPU tunnel; when it answers, run the round-3 measurement batch.
# Output: /tmp/tpu_batch.log   Poll status: /tmp/tpu_wait.log
cd /root/repo
MAX_WAIT_S=${1:-28800}   # give up after 8h by default
start=$(date +%s)
while true; do
  if timeout 90 python - <<'EOF' >>/tmp/tpu_wait.log 2>&1
import jax
d = jax.devices()[0]
assert d.platform not in ("cpu",), d.platform
print("TPU up:", d)
EOF
  then
    echo "$(date -u) tunnel up — running batch" | tee -a /tmp/tpu_wait.log
    bash tools/probes/run_tpu_batch.sh >/tmp/tpu_batch.log 2>&1
    echo "batch rc=$?" | tee -a /tmp/tpu_wait.log
    exit 0
  fi
  now=$(date +%s)
  if [ $((now - start)) -gt "$MAX_WAIT_S" ]; then
    echo "$(date -u) gave up waiting for TPU" | tee -a /tmp/tpu_wait.log
    exit 1
  fi
  echo "$(date -u) tunnel still down, sleeping 300s" >>/tmp/tpu_wait.log
  sleep 300
done
