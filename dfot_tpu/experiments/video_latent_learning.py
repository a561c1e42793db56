"""First-stage (VAE) training: recon + KL + LPIPS + PatchGAN adversarial.

Reference flow (experiments/video_latent_learning.py +
algorithms/vae/image_vae/trainer.py): manual optimization with two
optimizers — autoencoder and discriminator — adversarial term enabled after
``disc_start`` steps with the adaptive generator weight. Here both updates
are one jitted step over a pair of TrainStates.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..data.loader import DataLoader
from ..data.video_dataset import build_dataset
from ..training.checkpoint import save_checkpoint
from ..training.state import TrainState, create_train_state
from ..utils.logging import MetricsLogger
from ..vae import (
    ImageVAE,
    ImageVAEConfig,
    NLayerDiscriminator,
    VideoVAE,
    VideoVAEConfig,
    adopt_weight,
    calculate_adaptive_weight,
    decoder_last_kernel_path,
    vae_discriminator_loss,
    vae_generator_loss,
)
from ..vae.losses import tree_get, tree_set

__all__ = ["VideoLatentLearningExperiment"]


class VideoLatentLearningExperiment:
    def __init__(self, cfg: Config, output_dir: Optional[str] = None, load: Optional[str] = None):
        self.cfg = cfg
        self.output_dir = output_dir or "outputs"
        os.makedirs(self.output_dir, exist_ok=True)
        self.ckpt_dir = os.path.join(self.output_dir, "checkpoints")
        self.logger = MetricsLogger(self.output_dir)
        acfg = cfg.algorithm
        self.is_video = "video" in acfg.get("_name", "image_vae")
        if self.is_video:
            self.vae_cfg = VideoVAEConfig.from_config(acfg)
            self.vae = VideoVAE(self.vae_cfg)
            self.loss_cfg = acfg.loss
        else:
            self.vae_cfg = ImageVAEConfig.from_config(acfg)
            self.vae = ImageVAE(self.vae_cfg)
            self.loss_cfg = acfg.lossconfig
        self.disc = NLayerDiscriminator()

    def exec_task(self, task: str) -> None:
        if task != "training":
            raise ValueError("video_latent_learning only supports training")
        self.training()

    # ------------------------------------------------------------------
    def _init_states(self, rng, sample) -> Tuple[TrainState, TrainState, Dict]:
        lr = self.cfg.experiment.training.lr
        r1, r2, r3 = jax.random.split(rng, 3)
        vae_vars = self.vae.init(r1, sample, r2)
        disc_in = sample if not self.is_video else sample.reshape(-1, *sample.shape[2:])
        disc_vars = self.disc.init(r3, disc_in, True)
        tx = optax.adam(lr, b1=0.5, b2=0.9)
        ae_state = create_train_state(vae_vars["params"], tx, use_ema=False)
        d_state = create_train_state(disc_vars["params"], tx, use_ema=False)
        return ae_state, d_state, disc_vars.get("batch_stats", {})

    def _make_step(self):
        kl_weight = self.loss_cfg.get("kl_weight", 1e-6)
        disc_weight = self.loss_cfg.get("disc_weight", 0.5)
        disc_start = self.loss_cfg.get("disc_start", 0)
        loss_type = self.loss_cfg.get("loss_type", "l1")
        vae, disc, is_video = self.vae, self.disc, self.is_video

        def flat(x):  # discriminator consumes frames
            return x.reshape(-1, *x.shape[2:]) if is_video else x

        def step(ae_state, d_state, bn_stats, batch, rng, global_step):
            x = batch * 2.0 - 1.0
            r_post, r_drop = jax.random.split(rng)
            dw = adopt_weight(disc_weight, global_step, disc_start)

            def gen_loss(params):
                recon, posterior = vae.apply(
                    {"params": params}, x, r_post, train=True,
                    rngs={"dropout": r_drop},
                )

                def disc_g(r):
                    logits, _ = disc.apply(
                        {"params": d_state.params, "batch_stats": bn_stats},
                        flat(r), True, mutable=["batch_stats"],
                    )
                    return -jnp.mean(logits), logits

                # adaptive generator weight ||grad_rec|| / ||grad_gan||, both
                # grads taken wrt the DECODER'S LAST-LAYER KERNEL exactly as
                # the reference's calculate_adaptive_weight does (perceptual_
                # loss.py:77-90,227-236 with last_layer=decoder.conv_out
                # .weight). One jax.vjp pinned at that leaf gives both
                # cotangents; the backward stops at the final conv, and XLA
                # CSEs the extra primal forward against the loss forward.
                def rec_of(r):
                    if loss_type == "l1":
                        return jnp.mean(jnp.abs(r - x))
                    return jnp.mean((r - x) ** 2)

                p_det = jax.lax.stop_gradient(params)
                last_path = decoder_last_kernel_path(p_det)
                last_w = tree_get(p_det, last_path)

                def recon_of_last(lw):
                    r, _ = vae.apply(
                        {"params": tree_set(p_det, last_path, lw)},
                        x, r_post, train=True, rngs={"dropout": r_drop},
                    )
                    return r

                recon_s, vjp_fn = jax.vjp(recon_of_last, last_w)
                (nll_grads,) = vjp_fn(jax.grad(rec_of)(recon_s))
                (gan_grads,) = vjp_fn(
                    jax.grad(lambda r: disc_g(r)[0])(recon_s)
                )
                d_weight = calculate_adaptive_weight(nll_grads, gan_grads)

                _, logits_fake = disc_g(recon)
                total, parts = vae_generator_loss(
                    recon, x, posterior.kl(), logits_fake,
                    kl_weight=kl_weight, disc_weight=dw, loss_type=loss_type,
                    adaptive_weight=d_weight,
                )
                parts["d_weight"] = d_weight
                return total, (parts, recon)

            (g_total, (parts, recon)), g_grads = jax.value_and_grad(
                gen_loss, has_aux=True
            )(ae_state.params)
            ae_state = ae_state.apply_gradients(g_grads)

            def disc_loss(params):
                logits_real, vars_r = disc.apply(
                    {"params": params, "batch_stats": bn_stats}, flat(x), True,
                    mutable=["batch_stats"],
                )
                logits_fake, vars_f = disc.apply(
                    {"params": params, "batch_stats": vars_r["batch_stats"]},
                    flat(jax.lax.stop_gradient(recon)), True, mutable=["batch_stats"],
                )
                return vae_discriminator_loss(logits_real, logits_fake, dw), vars_f[
                    "batch_stats"
                ]

            (d_total, new_bn), d_grads = jax.value_and_grad(disc_loss, has_aux=True)(
                d_state.params
            )
            d_state = d_state.apply_gradients(d_grads)
            metrics = {"g_total": g_total, "d_total": d_total, **parts}
            return ae_state, d_state, new_bn, metrics

        return jax.jit(step)

    # ------------------------------------------------------------------
    def training(self) -> None:
        cfg = self.cfg
        tcfg = cfg.experiment.training
        dataset = build_dataset(cfg.dataset, "training")
        loader = DataLoader(dataset, tcfg.batch_size, shuffle=True)

        sample = next(iter(loader))["videos"]
        if not self.is_video:
            sample = sample.reshape(-1, *sample.shape[2:])  # frames as batch
        sample = jnp.asarray(sample[: min(2, len(sample))])

        rng = jax.random.PRNGKey(tcfg.get("manual_seed", 0))
        rng, r_init = jax.random.split(rng)
        ae_state, d_state, bn_stats = self._init_states(r_init, sample)
        step_fn = self._make_step()

        max_steps = tcfg.max_steps if tcfg.max_steps > 0 else 1000
        step = 0
        done = False
        while not done:
            for batch in loader:
                x = batch["videos"]
                if not self.is_video:
                    x = x.reshape(-1, *x.shape[2:])
                rng, r = jax.random.split(rng)
                ae_state, d_state, bn_stats, metrics = step_fn(
                    ae_state, d_state, bn_stats, jnp.asarray(x), r, step
                )
                step += 1
                if step % 50 == 0 or step == 1:
                    self.logger.log({k: float(v) for k, v in metrics.items()}, step)
                if step >= max_steps:
                    done = True
                    break
        save_checkpoint(self.ckpt_dir, step, ae_state, 1)
        self.ae_state = ae_state
