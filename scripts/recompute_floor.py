"""Recompute the flagship forward floor from a committed trace summary.

The round-3 roofline (COVERAGE.md "Trace-backed roofline") argued the
200-frame rollout sits at a ~66 ms/eval structural floor; this script makes
that arithmetic independently checkable: it reads the per-op trace summary
that ``scripts/profile_forward.py --summary-out`` writes (committed under
``artifacts/``), classifies device time into attention vs everything else,
recomputes attention's achieved TF/s against its analytic FLOP count, and
re-derives the floor with attention promoted to its structural cap.

    python scripts/recompute_floor.py artifacts/trace_forward_b1.json

Attention FLOPs (flagship UViT3DPose, realestate10k_video_generation.yaml:
channels (128,256,576,1152), updown (3,3,6), 20 mid blocks, patch 2,
256px x 8 frames, num_heads 9):
  level-2: 12 layers x 4*S^2*d_model, S = 8*32*32 = 8192 tokens,
           d_model = 576 -> HEAD dim 64
  mid:     20 layers x 4*S^2*d_model, S = 8*16*16 = 2048 tokens,
           d_model = 1152 -> HEAD dim 128
(4*S^2*d = qk + pv, multiply-add = 2 FLOPs.)

Structural caps are PER HEAD DIM: d=64 heads halve the qk contraction depth
on the 128x128 MXU, and in the row orientation also the pv output width ->
~98 TF/s (the pvt orientation lifts pv to full width -> ~131); d=128 heads
fill the MXU in both dots -> the 197 TF/s peak is the cap.
"""

from __future__ import annotations

import argparse
import json
import re
import sys

V5E_PEAK_TFS = 197.0
ATTN_CAP_TFS = 98.0  # d=64 row-orientation cap (~50% of peak); pvt: ~131

# flagship attention FLOPs per single forward (B=1), see module docstring
LEVEL3 = 12 * 4 * (8 * 32 * 32) ** 2 * 576   # d=64 heads
MID = 20 * 4 * (8 * 16 * 16) ** 2 * 1152     # d=128 heads
ATTN_FLOPS = LEVEL3 + MID  # ~2.24e12

# Trace-op classification: the summary keys are full HLO instruction lines
# ("%up_2_1.1 = (bf16[...]) custom-call(...)"), named after the MODEL SCOPE,
# not the kernel — so match the DEFINING opcode, not a substring (operand
# lists of fusions also contain "custom-call" as text). The only pallas
# kernels in dfot_tpu are the attention kernels (ops/attention.py,
# ops/ring_attention.py), so defining custom-call <=> attention kernel.
_DEF_CUSTOM_CALL = re.compile(r"[)}\]]\s*custom-call\(")


def _is_attention_op(hlo_line: str) -> bool:
    return bool(_DEF_CUSTOM_CALL.search(hlo_line))

# rollout bookkeeping (bench.py 200-frame workload, keyframe_density 0.0625,
# 50 DDIM steps, NFE 2): B=1-equivalent denoiser evals per rollout
ROLLOUT_EVALS = 4800
GEN_FRAMES = 199
BASELINE_FPS = 200.0 / 600.0  # reference: ~10 min on one A100


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("summary", help="trace summary JSON from "
                    "profile_forward.py --summary-out")
    ap.add_argument("--attn-cap-tfs", type=float, default=ATTN_CAP_TFS,
                    help="structural cap for the d=64-head attention "
                    "(level-2): 98 row orientation, ~131 pvt")
    ap.add_argument("--cap-d128-tfs", type=float, default=V5E_PEAK_TFS,
                    help="structural cap for the d=128-head attention (mid)")
    ap.add_argument("--host-overhead-sec", type=float, default=0.7,
                    help="measured host share of one rollout (bench.py "
                    "interp_host_build_sec)")
    args = ap.parse_args()

    with open(args.summary) as f:
        s = json.load(f)
    if s.get("workload") not in (None, "forward"):
        sys.exit(f"expected a forward trace summary, got {s.get('workload')}")

    attn_ms, other_ms = 0.0, 0.0
    attn_ops = []
    for name, ms in s["per_op_ms"].items():
        if _is_attention_op(name):
            attn_ms += ms
            attn_ops.append((name, ms))
        else:
            other_ms += ms
    total_ms = s["traced_device_ms_per_step"]
    if not total_ms:
        raise SystemExit(
            "summary has zero traced device time — empty trace (CPU xplane "
            "has no TPU op plane?); re-trace on the chip"
        )
    unattributed = total_ms - attn_ms - other_ms  # per_op capped at 200 ops
    if unattributed > 0:
        other_ms += unattributed

    batch = s.get("batch", 1)
    attn_tfs = ATTN_FLOPS * batch / (attn_ms * 1e-3) / 1e12 if attn_ms else 0.0
    # per-head-dim caps: level-2 (d=64) at the kernel cap, mid (d=128) at peak
    attn_ms_at_cap = batch * (
        LEVEL3 / (args.attn_cap_tfs * 1e12)
        + MID / (args.cap_d128_tfs * 1e12)
    ) * 1e3
    floor_ms = other_ms + attn_ms_at_cap
    floor_ms_per_eval = floor_ms / batch

    rollout_floor_sec = (
        ROLLOUT_EVALS * floor_ms_per_eval * 1e-3 + args.host_overhead_sec
    )
    floor_fps = GEN_FRAMES / rollout_floor_sec
    measured_rollout_sec = ROLLOUT_EVALS * (total_ms / batch) * 1e-3

    print(json.dumps({
        "trace_wall_ms": s["wall_ms_per_step"],
        "trace_device_ms": total_ms,
        "attention_ms": round(attn_ms, 2),
        "attention_ops_found": len(attn_ops),
        "attention_achieved_tfs": round(attn_tfs, 1),
        "attention_cap_tfs_d64": args.attn_cap_tfs,
        "attention_cap_tfs_d128": args.cap_d128_tfs,
        "attention_ms_at_cap": round(attn_ms_at_cap, 2),
        "other_ms": round(other_ms, 2),
        "forward_floor_ms_per_eval": round(floor_ms_per_eval, 2),
        "implied_rollout_floor_sec": round(rollout_floor_sec, 1),
        "implied_rollout_floor_fps": round(floor_fps, 3),
        "floor_vs_baseline": round(floor_fps / BASELINE_FPS, 2),
        "measured_trace_rollout_sec": round(measured_rollout_sec, 1),
    }, indent=1))

    print("\ntop attention ops:")
    for name, ms in sorted(attn_ops, key=lambda kv: -kv[1])[:8]:
        print(f"  {ms:8.3f} ms  {name[:100]}")

    vs3x = floor_fps / BASELINE_FPS
    print(
        f"\nConclusion: with d=64-head attention promoted to its"
        f" {args.attn_cap_tfs:.0f} TF/s structural cap (d=128-head mid"
        f" attention to {args.cap_d128_tfs:.0f}) and every other op at its"
        f" measured rate,"
        f" the rollout floor is {floor_fps:.3f} fps = {vs3x:.2f}x the A100"
        f" baseline. The >=3x north star is"
        f" {'reachable' if vs3x >= 3.0 else 'NOT reachable'} for exact-parity"
        f" UViT3DPose math on one v5e chip; the gap is the attention"
        f" structural cap plus non-attention op rates, not scheduling"
        f" overhead."
    )


if __name__ == "__main__":
    main()
