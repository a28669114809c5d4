#!/bin/bash
# One-shot runner for the pending on-chip measurement queue (round 3).
#
# The TPU relay has multi-hour outages; each failed backend init hangs ~25 min
# before reporting UNAVAILABLE. This script probes cheaply in a loop, and once
# a probe succeeds runs the whole queue sequentially (one process at a time —
# only one process can hold the chip). Every step logs to $LOGDIR and the
# script NEVER kills a step (killing a TPU-claim holder wedges the chip).
#
# Usage: bash tools/run_onchip_queue.sh [logdir]   (run as a background task)
set -u
cd "$(dirname "$0")/.."
LOGDIR=${1:-/tmp/onchip_queue}
mkdir -p "$LOGDIR"

probe() {
  python - <<'EOF'
import jax, jax.numpy as jnp
x = jax.jit(lambda k: jnp.sum(jax.random.normal(k, (256, 256))))(jax.random.PRNGKey(0))
assert float(x) == float(x)
print("TPU_OK")
EOF
}

echo "[queue] waiting for relay..." | tee "$LOGDIR/status.log"
ATTEMPT=0
until probe > "$LOGDIR/probe.log" 2>&1; do
  ATTEMPT=$((ATTEMPT + 1))
  echo "[queue] probe $ATTEMPT failed $(date -u +%H:%M:%S); sleeping 5 min" \
    | tee -a "$LOGDIR/status.log"
  sleep 300
done
echo "[queue] relay UP $(date -u +%H:%M:%S); running queue" | tee -a "$LOGDIR/status.log"

run() {  # run <name> <cmd...>
  local name=$1; shift
  echo "[queue] START $name $(date -u +%H:%M:%S)" | tee -a "$LOGDIR/status.log"
  "$@" > "$LOGDIR/$name.log" 2>&1
  echo "[queue] DONE  $name rc=$? $(date -u +%H:%M:%S)" | tee -a "$LOGDIR/status.log"
}

# 1. DMA streaming probe — decides the manual-DMA decoder-rewrite question.
run probe_dma   python tools/probe_dma.py --iters 10 --mb 256
# 2. Layout-flag A/Bs on the full forward (one process, numerical guard inside).
run ab_flags    python tools/ab_flags.py --configs base head_commute split_resize head_commute+split_resize
# 3. Decoder paired-T grid A/B (DEC_PAIRED_T default ON — confirm) + vol-views.
run ab_paired   python tools/ab_decoder.py --paired-ab
run ab_volviews python tools/ab_decoder.py --vol-views
# 4. Train-step re-measure after the composite token-major restructure.
run ab_train    python tools/ab_train.py --configs ABCD
# 5. Headline bench + kernel certificate + per-op profile.
run bench       python bench.py
run certify     python tools/certify_kernels.py
run profile     python tools/profile_forward.py --batch 128 --out "$LOGDIR/PROFILE_r3_final.json"

echo "[queue] ALL DONE $(date -u +%H:%M:%S)" | tee -a "$LOGDIR/status.log"
