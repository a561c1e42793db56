#!/bin/bash
# Prioritized chip-work queue for when the (frequently wedged) tunneled TPU
# comes back. Runs each stage with its own timeout, logs everything, and
# continues past failures — so one launch captures the round's measurements
# even if the operator is busy elsewhere. Keep the host idle of CPU-heavy
# jobs (pytest) while this runs: the TPU host loop has ~1 core.
#
# Usage: nohup scripts/tpu_session.sh > /tmp/tpu_session.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p traces
log() { echo "=== [$(date +%H:%M:%S)] $*"; }

# 0. wait for the backend (subprocess probes, same pattern as bench.py)
log "probing TPU backend"
for i in $(seq 1 60); do
  if timeout 150 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
    log "TPU up (probe $i)"; break
  fi
  [ "$i" = 60 ] && { log "TPU never came up; aborting"; exit 1; }
  sleep 120
done

# 1. flash-forward variant A/B at flagship shapes (+ VJP) — picks the
#    orientation the round ships with
log "stage 1: attention variants"
timeout 2400 python scripts/bench_attention_variants.py --bwd \
  --out traces/attn_variants_r4.json

# 2. committed forward trace summary (the program the rollout runs) + floor
log "stage 2: forward trace + floor recompute"
timeout 1800 python scripts/profile_forward.py --batch 2 --precomputed-cond \
  --summary-out traces/forward_b2_precond.json
timeout 300 python scripts/recompute_floor.py traces/forward_b2_precond.json \
  || true

# 3. train-step trace at the bench config (the un-roofed axis)
log "stage 3: train trace b1 mid"
timeout 2400 python scripts/profile_forward.py --train --batch 1 \
  --train-remat mid --summary-out traces/train_b1_mid.json
timeout 300 python scripts/recompute_train_floor.py traces/train_b1_mid.json \
  || true

# 4. batch/remat sweep for the flagship train step (each new batch size is a
#    fresh ~3-6 min remote compile; order cheapest-information-first)
log "stage 4: train variants sweep"
timeout 5400 python scripts/bench_train_variants.py mid:b2 mid:b4 mid:b8 \
  mid+dots:b8 all:b8

# 5. the full driver bench (window8 + interp + 200f rollout + train +
#    latent-train). Warms the persistent cache for the driver's own run.
log "stage 5: full bench.py"
timeout 3600 python bench.py | tee /tmp/bench_r4_full.jsonl

# 6. serving export verified non-tiny (VERDICT r3 weak #5)
log "stage 6: export_sampler non-tiny verify"
timeout 2400 python scripts/export_sampler.py --verify \
  --out /tmp/dfot_sampler_export || true

log "tpu session complete"
