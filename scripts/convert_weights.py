"""Convert torch checkpoints into the framework's weight formats.

Usage:
    python scripts/convert_weights.py --kind KIND --src CKPT [--out OUT.npz]

Kinds and expected source checkpoints:
    clip_b32 / clip_l14   OpenAI CLIP state dict (visual.* keys)
    dino                  facebookresearch/timm DINO ViT-B/16 state dict
    laion                 LAION aesthetic predictor (lin weights, 768 -> 1)
    inception             torchvision-keyed FID InceptionV3 (pt-inception)
    lpips                 --src lpips vgg.pth  --vgg torchvision vgg16 .pth
    i3d                   flax-tree npz passthrough (or torch, keys as-is)
    raft / amt / pips     reference eval-model torch checkpoints
    musiq                 pyiqa musiq_spaq_ckpt (imaging_quality predictor)
    dc_ae                 reference DC-AE safetensors/pt (encoder.*/decoder.*)
    titok                 reference TiTok_KL safetensors/pt

Registry kinds (clip_*, dino, laion, inception, lpips, i3d) write a
flattened flax-tree ``.npz`` that ``SharedMetricModelRegistry`` loads from
``--out`` (defaults to ``<weights_dir>/<kind>.npz``); VAE kinds write the
same format for LatentCodec / preprocessing experiments.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _flatten(tree, path=""):
    flat = {}
    for k, v in tree.items():
        p = f"{path}/{k}" if path else k
        if isinstance(v, dict):
            flat.update(_flatten(v, p))
        else:
            flat[p] = np.asarray(v)
    return flat


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--kind", required=True,
                    choices=["clip_b32", "clip_l14", "dino", "laion",
                             "inception", "lpips", "i3d", "raft", "amt",
                             "pips", "musiq", "dc_ae", "titok"])
    ap.add_argument("--src", required=True, help="torch checkpoint path")
    ap.add_argument("--vgg", help="torchvision vgg16 state dict (lpips only)")
    ap.add_argument("--out", help="output .npz (default <kind>.npz beside src)")
    args = ap.parse_args()

    from dfot_tpu.utils.torch_ckpt import load_state_dict

    state = load_state_dict(args.src)
    kind = args.kind

    if kind in ("clip_b32", "clip_l14"):
        from dfot_tpu.metrics.encoders import import_clip_vision_params

        tree = import_clip_vision_params(state)
    elif kind == "dino":
        from dfot_tpu.metrics.encoders import import_dino_params

        tree = import_dino_params(state)
    elif kind == "laion":
        # single linear layer: keep torch names (registry reads weight/bias)
        tree = {"weight": state["weight"], "bias": state["bias"]}
    elif kind == "inception":
        from dfot_tpu.metrics.inception import import_inception_params

        tree = import_inception_params(state)
    elif kind == "lpips":
        if not args.vgg:
            ap.error("--kind lpips requires --vgg (torchvision vgg16 weights)")
        from dfot_tpu.vae.losses import import_lpips_params

        tree = import_lpips_params(state, load_state_dict(args.vgg))
    elif kind == "i3d":
        tree = dict(state)  # already flax-keyed or flat
    elif kind == "raft":
        from dfot_tpu.metrics.raft import import_raft_params

        tree = import_raft_params(state)
    elif kind == "amt":
        from dfot_tpu.metrics.amt import import_amt_params

        tree = import_amt_params(state)
    elif kind == "pips":
        from dfot_tpu.metrics.pips import import_pips_params

        tree = import_pips_params(state)
    elif kind == "musiq":
        from dfot_tpu.metrics.musiq import import_musiq_params

        tree = import_musiq_params(state)
    elif kind == "dc_ae":
        from dfot_tpu.vae import import_dc_ae_params

        tree = import_dc_ae_params(state)
    else:  # titok
        from dfot_tpu.vae import import_titok_params

        tree = import_titok_params(state)

    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(args.src)), f"{kind}.npz"
    )
    flat = tree if all(not isinstance(v, dict) for v in tree.values()) else _flatten(tree)
    np.savez(out, **{k: np.asarray(v) for k, v in flat.items()})
    print(f"wrote {out}: {len(flat)} arrays")


if __name__ == "__main__":
    main()
