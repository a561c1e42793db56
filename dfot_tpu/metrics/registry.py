"""Shared frozen-model registry for evaluation metrics.

Counterpart of the reference's SharedVideoMetricModelRegistry
(algorithms/common/metrics/video/shared_registry.py): a lazy singleton so
the large frozen eval models (I3D, Inception, LPIPS-VGG, ...) are built and
initialized once and shared by all metrics.

Weights: pass ``weights_dir`` containing converted checkpoints
(``i3d.npz``/``lpips.npz``/...). Missing weights fall back to fixed-seed
random initialization — every metric still runs and orders models
consistently within a run, but values are NOT comparable to published
tables; ``registry.comparable[name]`` records which applies.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SharedMetricModelRegistry"]


class SharedMetricModelRegistry:
    def __init__(self, weights_dir: Optional[str] = None):
        self.weights_dir = weights_dir
        self._models: Dict[str, Callable] = {}
        self.comparable: Dict[str, bool] = {}

    def _load_weights(self, name: str, init_params):
        path = os.path.join(self.weights_dir or "", f"{name}.npz")
        if self.weights_dir and os.path.exists(path):
            flat = dict(np.load(path))
            params = _unflatten({k: jnp.asarray(v) for k, v in flat.items()})
            _check_tree(name, path, params, init_params)
            self.comparable[name] = True
            return params
        self.comparable[name] = False
        return init_params

    # ------------------------------------------------------------------
    def i3d(self) -> Callable:
        """(B, T>=9, H, W, 3) in [0,1] -> (logits (B,400), feats (B,1024))."""
        if "i3d" not in self._models:
            from .i3d import I3D

            model = I3D()
            x = jnp.zeros((1, 9, 64, 64, 3))
            variables = model.init(jax.random.PRNGKey(0), x)
            params = self._load_weights("i3d", variables["params"])
            batch_stats = variables.get("batch_stats", {})

            @jax.jit
            def apply(x):
                return model.apply(
                    {"params": params, "batch_stats": batch_stats}, x
                )

            self._models["i3d"] = apply
        return self._models["i3d"]

    def lpips(self) -> Callable:
        """(B, H, W, 3) pairs in [-1,1] -> (B,) perceptual distances."""
        if "lpips" not in self._models:
            from ..vae.losses import LPIPS

            model = LPIPS()
            x = jnp.zeros((1, 32, 32, 3))
            variables = model.init(jax.random.PRNGKey(0), x, x)
            params = self._load_weights("lpips", variables["params"])

            @jax.jit
            def apply(a, b):
                return model.apply({"params": params}, a, b)

            self._models["lpips"] = apply
        return self._models["lpips"]

    def _vit_encoder(self, name: str, make_model, size: int = 224) -> Callable:
        if name not in self._models:
            model = make_model()
            x = jnp.zeros((1, size, size, 3))
            variables = model.init(jax.random.PRNGKey(0), x)
            params = self._load_weights(name, variables["params"])

            @jax.jit
            def apply(x):
                return model.apply({"params": params}, x)

            self._models[name] = apply
        return self._models[name]

    def clip_b32(self) -> Callable:
        """(B, 224, 224, 3) CLIP-normalized -> (B, 512) embeddings
        (reference models/clip.py, ViT-B/32)."""
        from .encoders import CLIP_B32, CLIPVisionEncoder

        return self._vit_encoder("clip_b32", lambda: CLIPVisionEncoder(CLIP_B32))

    def clip_l14(self) -> Callable:
        """(B, 224, 224, 3) CLIP-normalized -> (B, 768) embeddings."""
        from .encoders import CLIP_L14, CLIPVisionEncoder

        return self._vit_encoder("clip_l14", lambda: CLIPVisionEncoder(CLIP_L14))

    def dino(self) -> Callable:
        """(B, 224, 224, 3) ImageNet-normalized -> (B, 768) CLS features
        (reference models/dino.py, dino_vitb16)."""
        from .encoders import DINO_B16, DINOEncoder

        return self._vit_encoder("dino", lambda: DINOEncoder(DINO_B16))

    def laion(self) -> Callable:
        """l2-normalized CLIP-L/14 embeddings (B, 768) -> (B, 1) aesthetic
        score 0-10 (reference models/laion.py: a single nn.Linear)."""
        if "laion" not in self._models:
            path = os.path.join(self.weights_dir or "", "laion.npz")
            if self.weights_dir and os.path.exists(path):
                flat = dict(np.load(path))
                w = jnp.asarray(flat["weight"])  # torch (1, 768)
                b = jnp.asarray(flat["bias"])
                self.comparable["laion"] = True
            else:
                key = jax.random.PRNGKey(7)
                w = jax.random.normal(key, (1, 768)) * 768**-0.5
                b = jnp.zeros((1,))
                self.comparable["laion"] = False

            @jax.jit
            def apply(feats):
                return feats @ w.T + b

            self._models["laion"] = apply
        return self._models["laion"]

    def raft(self) -> Optional[Callable]:
        """Optical flow: (B, H, W, 3) uint8-range floats x2 -> (B, H, W, 2)
        pixel flow (reference models/raft/; raft-things weights as raft.npz).

        Unlike the encoder metrics there is NO random-weight fallback —
        random-flow values are worse than the classical-flow path the
        VBench dims otherwise use, so this returns None without weights."""
        if "raft" not in self._models:
            path = os.path.join(self.weights_dir or "", "raft.npz")
            if not (self.weights_dir and os.path.exists(path)):
                self.comparable["raft"] = False
                self._models["raft"] = None
                return None
            from .raft import RAFT

            model = RAFT(iters=20)
            flat = dict(np.load(path))
            params = _unflatten({k: jnp.asarray(v) for k, v in flat.items()})
            init = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3))
            )["params"]
            _check_tree("raft", path, params, init)
            self.comparable["raft"] = True

            @jax.jit
            def apply(img1, img2):
                return model.apply({"params": params}, img1, img2)

            self._models["raft"] = apply
        return self._models["raft"]

    def amt(self) -> Optional[Callable]:
        """Frame interpolation: (B, H, W, 3) in [0,1] x2 -> (B, H, W, 3)
        middle frame (reference models/amt/; amt-s weights as amt.npz).
        Like raft(), returns None without real weights — the classical
        interpolation path is a better fallback than random weights."""
        if "amt" not in self._models:
            path = os.path.join(self.weights_dir or "", "amt.npz")
            if not (self.weights_dir and os.path.exists(path)):
                self.comparable["amt"] = False
                self._models["amt"] = None
                return None
            from .amt import AMT_S

            model = AMT_S()
            flat = dict(np.load(path))
            params = _unflatten({k: jnp.asarray(v) for k, v in flat.items()})
            init = model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 128, 128, 3)),
                jnp.full((1,), 0.5),
            )["params"]
            _check_tree("amt", path, params, init)
            self.comparable["amt"] = True

            @jax.jit
            def apply(img0, img1):
                B = img0.shape[0]
                return model.apply(
                    {"params": params}, img0, img1, jnp.full((B,), 0.5)
                )

            self._models["amt"] = apply
        return self._models["amt"]

    def pips(self) -> Optional[Callable]:
        """Point tracker for FVMD: track_fn(frames (S, H, W, C) in [0, 1],
        pts0 (N, 2)) -> trajectories (S, N, 2) using PIPS2 (reference
        models/pips2.py; pips2_weights as pips.npz). Returns None without
        real weights — the LK tracker is a better substitute than random
        weights."""
        if "pips" not in self._models:
            path = os.path.join(self.weights_dir or "", "pips.npz")
            if not (self.weights_dir and os.path.exists(path)):
                self.comparable["pips"] = False
                self._models["pips"] = None
                return None
            from .pips import Pips

            model = Pips(iters=16)
            flat = dict(np.load(path))
            params = _unflatten({k: jnp.asarray(v) for k, v in flat.items()})
            init = model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((2, 4, 2)), jnp.zeros((2, 128, 128, 3)),
            )["params"]
            _check_tree("pips", path, params, init)
            self.comparable["pips"] = True

            @jax.jit
            def apply(trajs0, rgbs):
                return model.apply({"params": params}, trajs0, rgbs)

            def track(frames, pts0):
                frames = jnp.asarray(frames, jnp.float32)
                if frames.ndim == 3:
                    frames = frames[..., None]
                if frames.shape[-1] == 1:
                    frames = jnp.repeat(frames, 3, -1)
                S = frames.shape[0]
                trajs0 = jnp.broadcast_to(
                    jnp.asarray(pts0, jnp.float32)[None], (S,) + pts0.shape
                )
                return np.asarray(apply(trajs0, frames * 2.0 - 1.0))

            self._models["pips"] = track
        return self._models["pips"]

    def musiq(self) -> Optional[Callable]:
        """Image quality: (B, H, W, 3) in [0,1] -> (B,) MUSIQ scores 0-100
        (reference models/musiq.py; pyiqa musiq_spaq weights as musiq.npz).
        Like raft()/amt(), returns None without real weights — the
        classical sharpness/blockiness proxy in vbench.py is a better
        fallback than random transformer weights."""
        if "musiq" not in self._models:
            path = os.path.join(self.weights_dir or "", "musiq.npz")
            if not (self.weights_dir and os.path.exists(path)):
                self.comparable["musiq"] = False
                self._models["musiq"] = None
                return None
            from .musiq import MUSIQ

            model = MUSIQ()
            flat = dict(np.load(path))
            params = _unflatten({k: jnp.asarray(v) for k, v in flat.items()})
            init = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))
            )["params"]
            _check_tree("musiq", path, params, init)
            self.comparable["musiq"] = True

            @jax.jit
            def apply(x):
                return model.apply({"params": params}, x)

            self._models["musiq"] = apply
        return self._models["musiq"]

    def inception(self) -> Callable:
        """Frame features for FID: (B, H, W, 3) in [0,1] -> (B, 2048).

        Without pretrained InceptionV3 weights this is a deterministic
        random-projection feature map (fixed seed) — consistent within a
        run, not comparable across papers."""
        if "inception" not in self._models:
            path = os.path.join(self.weights_dir or "", "inception.npz")
            dim = 2048
            if self.weights_dir and os.path.exists(path):
                # real FID InceptionV3 (pt-inception weights, converted to a
                # flax-tree .npz) — see metrics/inception.py
                from .inception import InceptionV3, inception_preprocess

                model = InceptionV3()
                flat = dict(np.load(path))
                params = _unflatten({k: jnp.asarray(v) for k, v in flat.items()})
                init = model.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3))
                )["params"]
                _check_tree("inception", path, params, init)
                self.comparable["inception"] = True

                @jax.jit
                def apply_real(x):
                    pooled, _ = model.apply(
                        {"params": params}, inception_preprocess(x)
                    )
                    return pooled

                self._models["inception"] = apply_real
                return self._models["inception"]
            self.comparable["inception"] = False
            key = jax.random.PRNGKey(42)

            @jax.jit
            def apply(x):
                B = x.shape[0]
                pooled = jnp.stack(
                    [
                        jnp.mean(x, axis=(1, 2)).reshape(B, -1),
                        jnp.std(x, axis=(1, 2)).reshape(B, -1),
                    ],
                    axis=-1,
                ).reshape(B, -1)
                W = jax.random.normal(key, (pooled.shape[-1], dim)) / np.sqrt(
                    pooled.shape[-1]
                )
                patches = jax.image.resize(x, (B, 16, 16, x.shape[-1]), "linear")
                flat = patches.reshape(B, -1)
                W2 = jax.random.normal(jax.random.fold_in(key, 1), (flat.shape[-1], dim))
                return jnp.tanh(flat @ W2 / np.sqrt(flat.shape[-1])) + pooled @ W

            self._models["inception"] = apply
        return self._models["inception"]


def _check_tree(name: str, path: str, loaded, expected) -> None:
    """Fail fast (at registry build, not mid-validation) on weight files that
    don't match the model's parameter tree."""
    got = {jax.tree_util.keystr(p): v.shape for p, v in
           jax.tree_util.tree_leaves_with_path(loaded)}
    want = {jax.tree_util.keystr(p): v.shape for p, v in
            jax.tree_util.tree_leaves_with_path(expected)}
    if got != want:
        missing = sorted(set(want) - set(got))[:5]
        extra = sorted(set(got) - set(want))[:5]
        wrong = sorted(
            k for k in set(got) & set(want) if got[k] != want[k]
        )[:5]
        raise ValueError(
            f"weights file {path} does not match the {name} model: "
            f"missing={missing} extra={extra} wrong_shape={wrong}"
        )


def _unflatten(flat: Dict[str, jnp.ndarray]):
    tree: Dict = {}
    for path, value in flat.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree
