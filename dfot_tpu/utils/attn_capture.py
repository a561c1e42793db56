"""Attention-statistics capture (reference: algorithms/common/attn_hook/).

The reference registers forward hooks on ``*attn`` modules, aggregates
per-timestep attention maps, and dumps heatmap PNG grids. The JAX-idiomatic
equivalent is flax's ``sow`` intermediates: models route attention through
``ops.attention.attention_with_weights`` when capture is enabled and sow the
(B, H, N, N) weights into the ``intermediates`` collection; this module
aggregates and renders them.

Enable by applying the model with ``capture_intermediates`` and the
``mutable=['intermediates']`` flag, or use :func:`capture_attention_maps`.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import numpy as np

__all__ = ["collect_attention_maps", "save_attention_heatmaps", "capture_attention_maps"]


def capture_attention_maps(model, variables, *args, **kwargs):
    """Run a forward pass capturing every sown 'attn_weights' intermediate.

    Returns (output, {module_path: weights (B, H, N, N)}).
    """
    out, state = model.apply(
        variables, *args, mutable=["intermediates"],
        capture_intermediates=lambda mdl, name: name == "__call__",
        **kwargs,
    )
    return out, collect_attention_maps(state.get("intermediates", {}))


def collect_attention_maps(intermediates: Dict) -> Dict[str, np.ndarray]:
    """Flatten an intermediates tree to {path: attention array} for entries
    that look like attention weights (square last two dims, >= 3 dims)."""
    flat = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        elif isinstance(node, (tuple, list)):
            for i, v in enumerate(node):
                walk(v, path + (str(i),))
        else:
            arr = np.asarray(node)
            # only sown attention maps — a square activation (e.g. an MLP
            # output whose (N, hidden) happens square) is not one
            if (
                "attn_weights" in path
                and arr.ndim >= 3
                and arr.shape[-1] == arr.shape[-2]
            ):
                flat["/".join(path)] = arr

    walk(intermediates, ())
    return flat


def save_attention_heatmaps(
    maps: Dict[str, np.ndarray],
    out_dir: str,
    timestep: Optional[int] = None,
    max_maps: int = 16,
) -> List[str]:
    """Render head-averaged attention heatmaps to PNG (reference
    attn_hook/hook.py:15-149 saves analogous grids)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, (name, arr) in enumerate(sorted(maps.items())):
        if i >= max_maps:
            break
        a = arr.astype(np.float32)
        while a.ndim > 2:  # average batch/head axes
            a = a.mean(axis=0)
        fig, ax = plt.subplots(figsize=(4, 4))
        im = ax.imshow(a, cmap="viridis", aspect="auto")
        fig.colorbar(im)
        safe = name.replace("/", "_")[:120]
        suffix = f"_t{timestep}" if timestep is not None else ""
        path = os.path.join(out_dir, f"{safe}{suffix}.png")
        ax.set_title(safe, fontsize=6)
        fig.savefig(path, dpi=80, bbox_inches="tight")
        plt.close(fig)
        paths.append(path)
    return paths
