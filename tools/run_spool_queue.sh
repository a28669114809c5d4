#!/bin/bash
# Spool-directory on-chip job runner (round 4).
#
# Only one process may hold the TPU chip, and a killed claim-holder wedges it
# for ~25 min — so all on-chip work runs through this single serial runner.
# Jobs are shell scripts dropped into $SPOOL/jobs/ (named NN_name.sh); the
# runner executes them in lexical order, logging to $SPOOL/logs/NN_name.log,
# and marks completion in $SPOOL/done/. New jobs may be enqueued while the
# runner is live. The runner exits when $SPOOL/STOP exists and no jobs are
# pending. It never kills a job (TPU claim safety) — bound runtimes inside
# the job scripts themselves if needed.
#
# Usage: bash tools/run_spool_queue.sh [spooldir]   (as a background task)
set -u
cd "$(dirname "$0")/.."
SPOOL=${1:-/tmp/q4}
mkdir -p "$SPOOL/jobs" "$SPOOL/logs" "$SPOOL/done"

log() { echo "[spool] $* $(date -u +%H:%M:%S)" | tee -a "$SPOOL/status.log"; }

probe() {
  python - <<'EOF'
import jax, jax.numpy as jnp
x = jax.jit(lambda k: jnp.sum(jax.random.normal(k, (256, 256))))(jax.random.PRNGKey(0))
assert float(x) == float(x)
print("TPU_OK")
EOF
}

log "runner up; waiting for jobs"
while true; do
  job=$(ls "$SPOOL/jobs" 2>/dev/null | sort | head -1)
  if [ -z "$job" ]; then
    if [ -e "$SPOOL/STOP" ]; then log "STOP + empty queue; exiting"; exit 0; fi
    sleep 15
    continue
  fi
  name="${job%.sh}"
  # Relay outages hang backend init ~25 min then fail; probe cheaply first so
  # a down relay parks the queue instead of burning a job attempt.
  until probe > "$SPOOL/logs/probe.log" 2>&1; do
    log "relay DOWN; sleeping 5 min"
    sleep 300
  done
  log "START $name"
  bash "$SPOOL/jobs/$job" > "$SPOOL/logs/$name.log" 2>&1
  rc=$?
  log "DONE  $name rc=$rc"
  mv "$SPOOL/jobs/$job" "$SPOOL/done/$job"
done
