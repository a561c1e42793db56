"""Recompute the flagship rollout floor from a committed trace summary.

Round-5 rework of the r4 floor arithmetic, addressing the three holes the
r4 verdict identified in the "structural cap 2.29x" claim:

  (a) the r4 per-op summary truncated at 200 ops, silently folding 16% of
      device time into "other at measured rate" — summaries now carry EVERY
      op (profile_forward.py build_summary) and this script refuses to call
      a floor "structural" when >2% of time is unattributed;
  (b) pure layout copies were kept at their measured rate although they
      carry no FLOPs — ops are now classified by the xplane's own
      hlo_category and each class gets a JUSTIFIED floor rate:
        attention (pallas custom-calls): analytic per-head-dim MXU cap
        mxu (convolution/dot fusions):   measured rate (>=55% of peak
                                         already — credible near-floor)
        copy (data formatting):          HBM-bandwidth time for the bytes
                                         they move, i.e. the cost IF the
                                         layout change is semantically
                                         required; also reported with the
                                         class at zero ("eliminable" view)
        elementwise/reduce/other:        max(bytes/HBM_BW, flops/peak) —
                                         these are memory-bound by shape
  (c) the r4 trace was of the RAW STANDALONE forward (4.53e12 FLOPs incl.
      per-step pose conditioning the rollout hoists out of the scan) — the
      floor is now derived from a ``--window`` trace of the program the
      200-frame rollout actually executes: the jitted 50-step DDIM scan
      with precomputed conditioning, HG compose, and the DDIM update
      (profile_forward.py --window interp).

    python scripts/recompute_floor.py traces/window_interp_b2_r5.json

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
V5E_HBM_GBS = 819.0  # v5e HBM bandwidth
ATTN_CAP_TFS = 98.0  # d=64 row-orientation cap (~50% of peak); pvt: ~131

# flagship attention FLOPs per single forward (B=1), see module docstring
LEVEL3 = 12 * 4 * (8 * 32 * 32) ** 2 * 576   # d=64 heads
MID = 20 * 4 * (8 * 16 * 16) ** 2 * 1152     # d=128 heads
ATTN_FLOPS = LEVEL3 + MID  # ~2.24e12

# Trace-op classification: the summary keys are full HLO instruction lines
# ("%up_2_1.1 = (bf16[...]) custom-call(...)"), named after the MODEL SCOPE,
# not the kernel — so match the DEFINING opcode, not a substring (operand
# lists of fusions also contain "custom-call" as text). Since r5 the repo
# has TWO kinds of pallas kernels: attention-dot kernels (flash fwd/dq/dkv,
# ops/attention.py + ring_attention.py — MXU compute, promoted to the
# per-head-dim cap) and DATA-MOVEMENT kernels (qkv-prep / attn-out-collect /
# ln_modulate, ops/qkv_prep.py + ln_modulate.py — HBM-bandwidth-bound by
# design; flooring them at the attention cap would claim their time
# vanishes). They are told apart by output signature:
#   flash fwd: (bf16[bh,n,d], f32[bh,n,1])            -> attention
#   dkv:       (bf16[bh,n,dp], bf16[bh,n,dp])          -> attention
#   dq / small-n: single bf16[bh,n,d<=128]             -> attention
#   qkv-prep fwd: 3-tuple of 4-d (B,H,N,DP)            -> pallas_move
#   collect / ln fwd: single 3-d with last dim > 128   -> pallas_move
#   prep bwd (5-tuple), scatter (single 4-d), ln bwd
#   (3-tuple of 3-d), everything else                  -> pallas_move
_DEF_CUSTOM_CALL = re.compile(r"[)}\]]\s*custom-call\(")
_SHAPE = re.compile(r"(\w+)\[([\d,]*)\]")


def _pallas_kind(hlo_line: str) -> str:
    """'' (not a defining custom-call), 'attention', or 'pallas_move'."""
    if not _DEF_CUSTOM_CALL.search(hlo_line):
        return ""
    try:
        out_sig = hlo_line.split(" = ", 1)[1].split(" custom-call(", 1)[0]
    except IndexError:
        return "pallas_move"
    elems = []
    for dt, dims in _SHAPE.findall(out_sig):
        shape = [int(x) for x in dims.split(",") if x]
        elems.append((dt, shape))
    if not elems:
        return "pallas_move"
    if len(elems) == 2:
        (dt0, s0), (dt1, s1) = elems
        if dt1 == "f32" and s1 and s1[-1] == 1:
            return "attention"  # flash forward (out, lse)
        if dt0 == dt1 and s0 == s1 and len(s0) == 3:
            return "attention"  # dkv backward (dk, dv)
        return "pallas_move"
    if len(elems) == 1:
        dt0, s0 = elems[0]
        if len(s0) == 3 and s0 and s0[-1] <= 128:
            return "attention"  # dq backward / small-n forward
        return "pallas_move"
    return "pallas_move"


def _is_attention_op(hlo_line: str) -> bool:
    """Legacy (r4) predicate: any defining custom-call. Kept so the
    committed r4 artifacts re-derive exactly as the r4 verdict reviewed
    them (no data-movement kernels existed then)."""
    return bool(_DEF_CUSTOM_CALL.search(hlo_line))


# rollout bookkeeping (bench.py 200-frame workload, keyframe_density 0.0625,
# 50 DDIM steps, NFE 2): B=1-equivalent denoiser evals per rollout
ROLLOUT_EVALS = 4800
GEN_FRAMES = 199
BASELINE_FPS = 200.0 / 600.0  # reference: ~10 min on one A100

_COPY_CATS = ("data formatting", "copy-start", "copy-done", "copy",
              "memory", "reshape", "transpose")
_MXU_CATS = ("convolution fusion", "convolution", "dot", "output fusion")


def classify(op: dict) -> str:
    name, cat = op["name"], op.get("cat", "")
    kind = _pallas_kind(name)
    if kind:
        return kind
    if cat in _MXU_CATS or op.get("gflops", 0.0) > 1.0:
        return "mxu"
    if cat in _COPY_CATS and op.get("gflops", 0.0) == 0.0:
        return "copy"
    return "elementwise"


def class_floor_ms(cls: str, ms: float, gflops: float, mbytes: float,
                   peak_tfs: float = V5E_PEAK_TFS,
                   hbm_gbs: float = V5E_HBM_GBS) -> float:
    """Justified per-op floor for the non-attention classes (attention gets
    the analytic per-head-dim cap instead, computed by the caller)."""
    bw_ms = mbytes / hbm_gbs  # MB / (GB/s) = ms
    flop_ms = gflops / peak_tfs  # GFLOP / (TFLOP/s) = ms
    if cls == "mxu":
        # measured rate accepted as the floor: XLA's conv/dot fusions
        # already run >=55% of peak here; promoting them to peak would
        # claim headroom we have no plan to realize
        return ms
    if cls == "pallas_move":
        # qkv-prep / collect / ln_modulate: single-pass HBM kernels that
        # each replaced a measured-slower XLA op chain; measured rate IS
        # the justified floor (xplane reports no bytes for custom-calls,
        # so a bandwidth bound cannot be computed from the trace)
        return ms
    if cls == "copy":
        return min(ms, bw_ms)
    return min(ms, max(bw_ms, flop_ms))


def rich_floor(s: dict, args) -> None:
    """Per-op-class roofline for a summary with rich per_op rows."""
    evals_b1 = s.get("evals_b1_per_step")
    batch = s.get("batch", 1)
    if s.get("workload") == "forward":
        # a standalone-forward trace: one eval of batch B per step
        evals_b1 = batch
    if not evals_b1:
        sys.exit("summary lacks evals_b1_per_step — re-trace with "
                 "profile_forward.py --window")

    total_ms = s["traced_device_ms_per_step"]
    cls_ms = {c: 0.0 for c in
              ("attention", "pallas_move", "mxu", "copy", "elementwise")}
    cls_floor = dict(cls_ms)
    cls_bytes = dict(cls_ms)
    cls_flops = dict(cls_ms)
    attn_ops, copy_ops, elem_ops = [], [], []
    for op in s["per_op"]:
        cls = classify(op)
        ms = op["ms"]
        count = op.get("count", 1.0)
        gflops = op.get("gflops", 0.0) * count
        mbytes = op.get("mbytes", 0.0) * count
        cls_ms[cls] += ms
        cls_bytes[cls] += mbytes
        cls_flops[cls] += gflops
        if cls == "attention":
            attn_ops.append((op["name"], ms))
        else:
            cls_floor[cls] += class_floor_ms(cls, ms, gflops, mbytes)
            if cls == "copy":
                copy_ops.append((op["name"], ms, mbytes))
            elif cls == "elementwise":
                elem_ops.append((op["name"], ms, mbytes, gflops))

    attributed = sum(cls_ms.values())
    unattributed = total_ms - attributed
    unattr_frac = unattributed / total_ms if total_ms else 0.0

    # analytic attention floor: per-head-dim caps x the evals this program
    # runs (forward kernels only on the sampling path)
    attn_ms_at_cap = evals_b1 * (
        LEVEL3 / (args.attn_cap_tfs * 1e12)
        + MID / (args.cap_d128_tfs * 1e12)
    ) * 1e3
    attn_analytic_tflops = evals_b1 * ATTN_FLOPS / 1e12
    attn_tfs = (attn_analytic_tflops / (cls_ms["attention"] * 1e-3)
                if cls_ms["attention"] else 0.0)
    cls_floor["attention"] = attn_ms_at_cap

    floor_ms = sum(cls_floor.values()) + max(unattributed, 0.0)
    floor_ms_no_copy = floor_ms - cls_floor["copy"]
    floor_per_eval = floor_ms / evals_b1
    floor_per_eval_nc = floor_ms_no_copy / evals_b1

    def rollout_view(per_eval_ms: float):
        sec = ROLLOUT_EVALS * per_eval_ms * 1e-3 + args.host_overhead_sec
        fps = GEN_FRAMES / sec
        return {"rollout_floor_sec": round(sec, 1),
                "rollout_floor_fps": round(fps, 3),
                "floor_vs_baseline": round(fps / BASELINE_FPS, 2)}

    measured_per_eval = total_ms / evals_b1
    meas = rollout_view(measured_per_eval)
    out = {
        "workload": s.get("workload"),
        "window_kind": s.get("window_kind"),
        "batch": batch,
        "evals_b1_per_step": evals_b1,
        "trace_wall_ms": s["wall_ms_per_step"],
        "trace_device_ms": total_ms,
        "device_ms_per_eval_b1": round(measured_per_eval, 2),
        "unattributed_ms": round(unattributed, 2),
        "unattributed_frac": round(unattr_frac, 4),
        "class_ms": {k: round(v, 2) for k, v in cls_ms.items()},
        "class_floor_ms": {k: round(v, 2) for k, v in cls_floor.items()},
        "class_mbytes": {k: round(v, 1) for k, v in cls_bytes.items()},
        "class_gflops": {k: round(v, 1) for k, v in cls_flops.items()},
        "attention_achieved_tfs": round(attn_tfs, 1),
        "attention_cap_tfs_d64": args.attn_cap_tfs,
        "attention_cap_tfs_d128": args.cap_d128_tfs,
        "floor_ms_per_eval": round(floor_per_eval, 2),
        "floor": rollout_view(floor_per_eval),
        "floor_if_copies_eliminated": rollout_view(floor_per_eval_nc),
        "measured_trace_rollout": meas,
    }
    print(json.dumps(out, indent=1))

    print("\ntop attention ops (ms/step):")
    for name, ms in sorted(attn_ops, key=lambda kv: -kv[1])[:8]:
        print(f"  {ms:8.3f}  {name[:100]}")
    print("\ntop copy/layout ops (ms/step, MB/step):")
    for name, ms, mb in sorted(copy_ops, key=lambda kv: -kv[1])[:15]:
        print(f"  {ms:8.3f}  {mb:9.1f}MB  {name[:90]}")
    print("\ntop elementwise ops (ms/step, MB/step):")
    for name, ms, mb, gf in sorted(elem_ops, key=lambda kv: -kv[1])[:15]:
        bw = mb / ms if ms else 0.0
        print(f"  {ms:8.3f}  {mb:9.1f}MB  {bw:7.1f}GB/s  {name[:80]}")

    vs = out["floor"]["floor_vs_baseline"]
    quality = ("STRUCTURAL" if unattr_frac <= 0.02
               else f"NOT structural ({unattr_frac:.1%} unattributed)")
    print(
        f"\nConclusion [{quality}]: attention at its per-head-dim cap, "
        f"pallas data-movement kernels and conv/dot fusions at measured "
        f"rate, copies at HBM bandwidth, "
        f"elementwise at max(bandwidth, peak-FLOPs) -> floor "
        f"{out['floor']['rollout_floor_fps']} fps = {vs:.2f}x baseline "
        f"(copies eliminated: "
        f"{out['floor_if_copies_eliminated']['floor_vs_baseline']:.2f}x). "
        f"The >=3x north star is "
        f"{'reachable' if vs >= 3.0 else 'NOT reachable'} within this floor."
    )


def legacy_floor(s: dict, args) -> None:
    """r4-era arithmetic for summaries without rich per_op rows (kept so
    the committed r4 artifacts remain re-derivable). Known-imperfect: the
    r4 verdict documents its truncation and class-rate holes."""
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
    unattributed = total_ms - attn_ms - other_ms  # r4 per_op capped at 200
    if unattributed > 0:
        other_ms += unattributed

    batch = s.get("batch", 1)
    attn_tfs = ATTN_FLOPS * batch / (attn_ms * 1e-3) / 1e12 if attn_ms else 0.0
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
        "legacy_summary_format": True,
        "trace_wall_ms": s["wall_ms_per_step"],
        "trace_device_ms": total_ms,
        "attention_ms": round(attn_ms, 2),
        "attention_ops_found": len(attn_ops),
        "attention_achieved_tfs": round(attn_tfs, 1),
        "attention_cap_tfs_d64": args.attn_cap_tfs,
        "attention_cap_tfs_d128": args.cap_d128_tfs,
        "attention_ms_at_cap": round(attn_ms_at_cap, 2),
        "other_ms": round(other_ms, 2),
        "unattributed_ms_in_other": round(max(unattributed, 0.0), 2),
        "forward_floor_ms_per_eval": round(floor_ms_per_eval, 2),
        "implied_rollout_floor_sec": round(rollout_floor_sec, 1),
        "implied_rollout_floor_fps": round(floor_fps, 3),
        "floor_vs_baseline": round(floor_fps / BASELINE_FPS, 2),
        "measured_trace_rollout_sec": round(measured_rollout_sec, 1),
    }, indent=1))
    print(
        "\nNOTE: legacy (r4) summary — top-200-truncated per-op table, "
        "copies at measured rate, raw-forward program. This floor is a "
        ">= bound, not a structural cap; re-trace with profile_forward.py "
        "--window for the per-class roofline."
    )


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("summary", help="trace summary JSON from "
                    "profile_forward.py --summary-out (use --window interp "
                    "for the rollout floor)")
    ap.add_argument("--attn-cap-tfs", type=float, default=ATTN_CAP_TFS,
                    help="structural cap for the d=64-head attention "
                    "(level-2): 98 row orientation, ~131 pvt")
    ap.add_argument("--cap-d128-tfs", type=float, default=V5E_PEAK_TFS,
                    help="structural cap for the d=128-head attention (mid)")
    ap.add_argument("--host-overhead-sec", type=float, default=0.7,
                    help="measured host share of one rollout (bench.py "
                    "interp_host_build_sec + interp_host_scatter_sec)")
    args = ap.parse_args()

    with open(args.summary) as f:
        s = json.load(f)
    if s.get("workload") not in (None, "forward", "window"):
        sys.exit(f"expected a forward/window trace summary, got "
                 f"{s.get('workload')}")
    if not s["traced_device_ms_per_step"]:
        raise SystemExit(
            "summary has zero traced device time — empty trace (CPU xplane "
            "has no TPU op plane?); re-trace on the chip"
        )
    if "per_op" in s:
        rich_floor(s, args)
    else:
        legacy_floor(s, args)


if __name__ == "__main__":
    main()
