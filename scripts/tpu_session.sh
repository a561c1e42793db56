#!/bin/bash
# Prioritized chip-work queue for when the (frequently wedged) tunneled TPU
# comes back. Runs each stage with its own timeout, logs everything, and
# continues past failures — so one launch captures the round's measurements
# even if the operator is busy elsewhere. Ordered so a flaky chip still
# yields the highest-value artifacts first: variant decision -> full bench
# (which also re-warms the persistent compile cache for the driver's own
# run — the r4 kernel changes invalidated the r3 cache) -> traces -> sweep.
# Keep the host idle of CPU-heavy jobs (pytest) while this runs: the TPU
# host loop has ~1 core.
#
# Usage: nohup scripts/tpu_session.sh > /tmp/tpu_session.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p traces
log() { echo "=== [$(date +%H:%M:%S)] $*"; }

# 0. wait for the backend (subprocess probes, same pattern as bench.py)
log "probing TPU backend"
# probe all day: the tunnel has wedged for multi-hour stretches (r3/r4);
# one launch must survive that and still capture the session when it ends
for i in $(seq 1 330); do
  if timeout 150 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
    log "TPU up (probe $i)"; break
  fi
  [ "$i" = 330 ] && { log "TPU never came up; aborting"; exit 1; }
  [ $((i % 10)) = 0 ] && log "still down (probe $i)"
  sleep 120
done

# 1. flash-forward variant A/B at flagship shapes (+ VJP) — picks the
#    orientation the rest of the session runs with
log "stage 1: attention variants"
timeout 2400 python scripts/bench_attention_variants.py --bwd \
  --out traces/attn_variants_r4.json
WINNER=$(python - <<'EOF'
import json
try:
    rows = json.load(open("traces/attn_variants_r4.json"))["rows"]
    cand = {}
    for r in rows:
        if r.get("shape") == [2, 9, 8192, 64] and "ms" in r \
           and r["variant"] in ("row", "pvt"):
            cand[r["variant"]] = r["ms"]
    print(min(cand, key=cand.get) if cand else "row")
except Exception:
    print("row")
EOF
)
log "forward variant winner: $WINNER"
export DFOT_ATTN_FWD="$WINNER"

# 2. the full driver bench (window8 + interp + 200f rollout + train +
#    latent-train) with the winning kernel. Warms the persistent cache.
log "stage 2: full bench.py (DFOT_ATTN_FWD=$WINNER)"
timeout 3600 python bench.py | tee /tmp/bench_r4_full.jsonl

# 3. committed forward trace summary (the program the rollout runs) + floor
log "stage 3: forward trace + floor recompute"
timeout 1800 python scripts/profile_forward.py --batch 2 --precomputed-cond \
  --summary-out traces/forward_b2_precond.json
timeout 300 python scripts/recompute_floor.py traces/forward_b2_precond.json \
  || true

# 4. train-step trace at the bench config (the un-roofed axis) + train floor
log "stage 4: train trace b1 mid"
timeout 2400 python scripts/profile_forward.py --train --batch 1 \
  --train-remat mid --summary-out traces/train_b1_mid.json
timeout 300 python scripts/recompute_train_floor.py traces/train_b1_mid.json \
  || true

# 5. batch/remat sweep for the flagship train step (each new batch size is a
#    fresh ~3-6 min remote compile; order cheapest-information-first)
log "stage 5: train variants sweep"
timeout 5400 python scripts/bench_train_variants.py mid:b2 mid:b4 mid:b8 \
  mid+dots:b8 all:b8

# 6. serving export verified non-tiny (VERDICT r3 weak #5)
log "stage 6: export_sampler non-tiny verify"
timeout 2400 python scripts/export_sampler.py --verify \
  --out /tmp/dfot_sampler_export || true

log "tpu session complete"
