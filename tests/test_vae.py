"""Tests for the VAE subsystem: distribution, image/video VAEs, losses,
latent preprocessing."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfot_tpu.vae import (
    DiagonalGaussian,
    ImageVAE,
    ImageVAEConfig,
    NLayerDiscriminator,
    VideoVAE,
    VideoVAEConfig,
    adopt_weight,
    estimate_latent_stats,
    hinge_d_loss,
    vae_generator_loss,
)

IMG_CFG = ImageVAEConfig(
    ch=32, ch_mult=(1, 2), num_res_blocks=1, resolution=16, z_channels=4, embed_dim=4
)
VID_CFG = VideoVAEConfig(
    hidden_size=32, hidden_size_mult=(1, 2, 4), num_res_blocks=1,
    resolution=16, z_channels=4, embed_dim=4, temporal_length=9,
)


def test_diagonal_gaussian():
    params = jnp.concatenate(
        [jnp.zeros((2, 4, 4, 3)), jnp.zeros((2, 4, 4, 3))], axis=-1
    )
    d = DiagonalGaussian.from_parameters(params)
    # standard normal: KL to prior is 0
    np.testing.assert_allclose(np.asarray(d.kl()), 0.0, atol=1e-6)
    s = d.sample(jax.random.PRNGKey(0))
    assert s.shape == (2, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(d.mode()), 0.0)
    # nonzero mean increases KL
    params2 = params.at[..., :3].add(1.0)
    d2 = DiagonalGaussian.from_parameters(params2)
    assert float(d2.kl().mean()) > 1.0


def test_image_vae_roundtrip_shapes():
    vae = ImageVAE(IMG_CFG)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    variables = vae.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))
    recon, posterior = vae.apply(variables, x, jax.random.PRNGKey(3))
    assert recon.shape == x.shape
    assert posterior.mean.shape == (2, 8, 8, 4)  # factor 2 downsampling
    z = vae.apply(variables, x, method=vae.encode).mode()
    dec = vae.apply(variables, z, method=vae.decode)
    assert dec.shape == x.shape


def test_video_vae_token_contract():
    vae = VideoVAE(VID_CFG)
    f = VID_CFG.temporal_downsampling_factor
    assert f == 4
    T = 9  # 1 + 2*4 frames -> 3 tokens
    x = jax.random.normal(jax.random.PRNGKey(0), (1, T, 16, 16, 3))
    variables = vae.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))
    posterior = vae.apply(variables, x, method=vae.encode)
    assert posterior.mean.shape == (1, 3, 4, 4, 4)  # (1+k, H/4, W/4, z)
    dec = vae.apply(variables, posterior.mode(), method=vae.decode)
    assert dec.shape == x.shape


def test_video_vae_causality():
    """Token i must not depend on frames after (i * factor)."""
    vae = VideoVAE(VID_CFG)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 9, 16, 16, 3))
    variables = vae.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))
    m1 = vae.apply(variables, x, method=vae.encode).mean
    # perturb the last 4 frames: tokens 0 and 1 must be unchanged
    x2 = x.at[:, 5:].add(1.0)
    m2 = vae.apply(variables, x2, method=vae.encode).mean
    np.testing.assert_allclose(np.asarray(m1[:, :2]), np.asarray(m2[:, :2]), atol=1e-5)
    assert float(jnp.abs(m1[:, 2] - m2[:, 2]).max()) > 1e-4
    # perturb only frame 0: every token may change, but token 0 must change
    x3 = x.at[:, 0].add(1.0)
    m3 = vae.apply(variables, x3, method=vae.encode).mean
    assert float(jnp.abs(m1[:, 0] - m3[:, 0]).max()) > 1e-4


def test_gan_losses():
    real = jnp.ones((2, 4, 4, 1))
    fake = -jnp.ones((2, 4, 4, 1))
    assert float(hinge_d_loss(real, fake)) == pytest.approx(0.0)
    assert float(hinge_d_loss(fake, real)) == pytest.approx(2.0)
    assert float(adopt_weight(0.5, jnp.asarray(10), 100)) == 0.0
    assert float(adopt_weight(0.5, jnp.asarray(200), 100)) == 0.5
    total, parts = vae_generator_loss(
        jnp.zeros((1, 4, 4, 3)), jnp.ones((1, 4, 4, 3)), jnp.ones((1,)),
        logits_fake=jnp.zeros((1, 2, 2, 1)), kl_weight=1e-6, disc_weight=0.5,
    )
    assert np.isfinite(float(total)) and parts["rec_loss"] == pytest.approx(1.0)


def test_discriminator_shapes():
    disc = NLayerDiscriminator(ndf=8, n_layers=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    variables = disc.init(jax.random.PRNGKey(1), x, True)
    out, _ = disc.apply(variables, x, True, mutable=["batch_stats"])
    assert out.shape[0] == 2 and out.shape[-1] == 1


def test_latent_stats(tmp_path):
    rng = np.random.RandomState(0)
    paths = []
    for i in range(3):
        arr = rng.randn(10, 4, 4, 2).astype(np.float32) * 2.0 + 1.0
        p = tmp_path / f"l{i}.npy"
        np.save(p, arr)
        paths.append(str(p))
    mean, std = estimate_latent_stats(paths)
    assert mean.shape == (2,) and std.shape == (2,)
    assert abs(mean.mean() - 1.0) < 0.15 and abs(std.mean() - 2.0) < 0.15


def test_latent_preprocessing_experiment(tmp_path):
    """npz dataset -> latents on disk with the right token count + stats."""
    from dfot_tpu.config import load_config
    from dfot_tpu.experiments.video_latent_preprocessing import (
        VideoLatentPreprocessingExperiment,
    )

    # synthetic npz dataset on disk
    data_dir = tmp_path / "data"
    for split in ("training", "validation"):
        os.makedirs(data_dir / split)
        rng = np.random.RandomState(0)
        for i in range(2):
            video = (rng.rand(9, 16, 16, 3) * 255).astype(np.uint8)
            np.savez(data_dir / split / f"v{i}.npz", video=video)

    cfg = load_config([
        "+name=prep",
        "dataset=ucf_101",
        "algorithm=video_vae_preprocessor",
        "experiment=video_latent_preprocessing",
        f"dataset.save_dir={data_dir}",
        "dataset.resolution=16",
        "dataset.max_frames=9",
        "dataset.n_frames=9",
        "++algorithm.model.hidden_size=32",
        "++algorithm.model.hidden_size_mult=[1,2,4]",
        "++algorithm.model.num_res_blocks=1",
        "++algorithm.model.z_channels=4",
        "++algorithm.model.temporal_length=9",
        "++algorithm.max_encode_length=9",
    ])
    exp = VideoLatentPreprocessingExperiment(cfg, str(tmp_path / "out"))
    exp.exec_task("validation")

    latent_dir = f"{data_dir}_latent_16/training"
    files = sorted(os.listdir(latent_dir))
    assert "v0.npy" in files and "data_mean.npy" in files
    lat = np.load(os.path.join(latent_dir, "v0.npy"))
    assert lat.shape == (3, 4, 4, 4)  # 9 frames -> 3 tokens
    assert lat.dtype == np.float16


def test_vae_learning_experiment(tmp_path):
    """Two AE+discriminator steps through the experiment API (adaptive
    weight active)."""
    from dfot_tpu.config import load_config
    from dfot_tpu.experiments.video_latent_learning import (
        VideoLatentLearningExperiment,
    )

    cfg = load_config([
        "+name=vae_smoke",
        "dataset=ucf_101",   # synthetic fallback
        "algorithm=image_vae",
        "experiment=video_latent_learning",
        "dataset.resolution=16",
        "dataset.max_frames=2",
        "++algorithm.ddconfig.ch=32",
        "++algorithm.ddconfig.ch_mult=[1,2]",
        "++algorithm.ddconfig.num_res_blocks=1",
        "++algorithm.lossconfig.disc_start=1",
        "experiment.training.batch_size=2",
        "experiment.training.max_steps=2",
    ])
    exp = VideoLatentLearningExperiment(cfg, str(tmp_path))
    exp.exec_task("training")
    import json

    lines = [json.loads(l) for l in open(os.path.join(exp.output_dir, "metrics.jsonl"))]
    assert lines and np.isfinite(lines[-1]["g_total"])
    assert "d_weight" in lines[-1]
    assert os.path.isdir(exp.ckpt_dir)


def test_dc_ae_preprocessing_experiment(tmp_path):
    """DC-AE preprocessor: deterministic latents at 4x compression."""
    from dfot_tpu.config import load_config
    from dfot_tpu.experiments.video_latent_preprocessing import (
        VideoLatentPreprocessingExperiment,
    )

    data_dir = tmp_path / "data"
    os.makedirs(data_dir / "training")
    rng = np.random.RandomState(0)
    video = (rng.rand(5, 16, 16, 3) * 255).astype(np.uint8)
    np.savez(data_dir / "training" / "v0.npz", video=video)

    cfg = load_config([
        "+name=prep_dcae",
        "dataset=ucf_101",
        "algorithm=dc_ae_preprocessor",
        "experiment=video_latent_preprocessing",
        f"dataset.save_dir={data_dir}",
        "dataset.resolution=16",
        "dataset.max_frames=4",
        "dataset.n_frames=4",
        "++algorithm.latent_channels=8",
        "++algorithm.attention_head_dim=16",
        "++algorithm.encoder_block_types=[ResBlock,ResBlock,EfficientViTBlock]",
        "++algorithm.decoder_block_types=[ResBlock,ResBlock,EfficientViTBlock]",
        "++algorithm.encoder_block_out_channels=[16,32,32]",
        "++algorithm.decoder_block_out_channels=[16,32,32]",
        "++algorithm.encoder_layers_per_block=[0,1,1]",
        "++algorithm.decoder_layers_per_block=[0,1,1]",
        "++algorithm.encoder_qkv_multiscales=[[],[],[]]",
        "++algorithm.decoder_qkv_multiscales=[[],[],[]]",
        "++algorithm.decoder_norm_types=[batch_norm,batch_norm,rms_norm]",
        "++algorithm.decoder_act_fns=[relu,relu,silu]",
        "++algorithm.max_encode_length=4",
    ])
    exp = VideoLatentPreprocessingExperiment(cfg, str(tmp_path / "out"))
    assert exp.is_deterministic
    exp.exec_task("validation")

    lat = np.load(f"{data_dir}_latent_16/training/v0.npy")
    assert lat.shape == (5, 4, 4, 8)  # per-frame latents, 16px -> 4x4
    assert np.isfinite(lat).all()


def test_kl_autoencoder_preprocessing_experiment(tmp_path):
    """KL-f8 preprocessor: posterior-MODE latents through the AutoencoderKL
    alias (reference autoencoder_kl/preprocessor.py:66-70)."""
    import jax

    from dfot_tpu.config import load_config
    from dfot_tpu.experiments.video_latent_preprocessing import (
        VideoLatentPreprocessingExperiment,
    )

    data_dir = tmp_path / "data"
    os.makedirs(data_dir / "training")
    rng = np.random.RandomState(0)
    video = (rng.rand(5, 16, 16, 3) * 255).astype(np.uint8)
    np.savez(data_dir / "training" / "v0.npz", video=video)

    cfg = load_config([
        "+name=prep_kl",
        "dataset=ucf_101",
        "algorithm=kl_autoencoder_preprocessor",
        "experiment=video_latent_preprocessing",
        f"dataset.save_dir={data_dir}",
        "dataset.resolution=16",
        "dataset.max_frames=4",
        "dataset.n_frames=4",
        "++algorithm.embed_dim=4",
        "++algorithm.ddconfig.in_channels=3",
        "++algorithm.ddconfig.out_ch=3",
        "++algorithm.ddconfig.ch=32",
        "++algorithm.ddconfig.ch_mult=[1,2]",
        "++algorithm.ddconfig.num_res_blocks=1",
        "++algorithm.ddconfig.attn_resolutions=[]",
        "++algorithm.ddconfig.dropout=0.0",
        "++algorithm.ddconfig.resolution=16",
        "++algorithm.ddconfig.z_channels=4",
        "++algorithm.ddconfig.double_z=true",
        "++algorithm.max_encode_length=4",
    ])
    exp = VideoLatentPreprocessingExperiment(cfg, str(tmp_path / "out"))
    exp.exec_task("validation")

    lat = np.load(f"{data_dir}_latent_16/training/v0.npy")
    assert lat.shape == (5, 8, 8, 4)  # ch_mult (1,2) -> stride 2
    assert lat.dtype == np.float16
    # mode() latents are deterministic: the rng must not enter the encode
    x = jax.numpy.zeros((1, 16, 16, 3))
    a = exp._encode(exp.variables, x, jax.random.PRNGKey(0))
    b = exp._encode(exp.variables, x, jax.random.PRNGKey(1))
    assert np.array_equal(np.asarray(a), np.asarray(b))
