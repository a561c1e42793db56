"""Training-step tests: noise levels, optimization, EMA, mesh sharding."""

import jax
import jax.numpy as jnp
import numpy as np

from dfot_tpu.diffusion import DiffusionConfig, make_schedule
from dfot_tpu.parallel import make_mesh, param_sharding_rule, shard_batch, shard_params
from dfot_tpu.training import (
    NoiseLevelConfig,
    create_train_state,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
    training_noise_levels,
)


def test_noise_levels_random_independent():
    cfg = NoiseLevelConfig(noise_level="random_independent", timesteps=100)
    mask = jnp.ones((4, 8), bool).at[0, 6:].set(False)
    k, loss_mask = training_noise_levels(jax.random.PRNGKey(0), cfg, mask)
    k = np.asarray(k)
    assert k.shape == (4, 8) and k.min() >= 0 and k.max() <= 99
    # unavailable frames forced to max noise, still excluded from loss
    assert (k[0, 6:] == 99).all()
    assert not np.asarray(loss_mask)[0, 6:].any()
    # iid: not all equal within a row
    assert len(np.unique(k[1])) > 1


def test_noise_levels_random_uniform_and_interleaved():
    mask = jnp.ones((3, 6), bool)
    cfg_u = NoiseLevelConfig(noise_level="random_uniform", timesteps=100)
    k, _ = training_noise_levels(jax.random.PRNGKey(1), cfg_u, mask)
    assert (np.asarray(k) == np.asarray(k)[:, :1]).all()
    cfg_i = NoiseLevelConfig(noise_level="interleaved", timesteps=100)
    k, _ = training_noise_levels(jax.random.PRNGKey(2), cfg_i, mask)
    k = np.asarray(k)
    assert (k[:, 0] == k[:, 2]).all() and (k[:, 1] == k[:, 3]).all()


def test_noise_levels_fixed_context():
    cfg = NoiseLevelConfig(
        noise_level="random_independent",
        timesteps=100,
        n_context_tokens=2,
        fixed_context=True,
        fixed_context_dropout=0.0,
    )
    mask = jnp.ones((2, 6), bool)
    k, loss_mask = training_noise_levels(jax.random.PRNGKey(0), cfg, mask)
    # context tokens clean (level 0), excluded from loss
    assert (np.asarray(k)[:, :2] == 0).all()
    assert not np.asarray(loss_mask)[:, :2].any()
    assert np.asarray(loss_mask)[:, 2:].all()


def test_lr_schedule_warmup():
    s = make_lr_schedule("constant_with_warmup", 1e-3, 100)
    assert float(s(0)) == 0.0
    assert float(s(50)) == np.float32(5e-4)
    assert float(s(100)) == np.float32(1e-3)
    assert float(s(10_000)) == np.float32(1e-3)


def _tiny_setup():
    from dfot_tpu.models.dit import DiT3D, DiTSpec

    spec = DiTSpec(
        hidden_size=32, depth=1, num_heads=2, mlp_ratio=1.0,
        variant="full", pos_emb_type="rope_3d", patch_size=2,
        max_temporal_length=2,
    )
    model = DiT3D(spec=spec, x_channels=1, resolution=(4, 4))
    x = jnp.zeros((2, 2, 4, 4, 1))
    k = jnp.zeros((2, 2))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x, k
    )

    def model_apply(params, x, noise_levels, cond, cond_mask, rngs=None, train=False):
        return model.apply(
            {"params": params}, x, noise_levels, cond, cond_mask, train=train, rngs=rngs
        )

    dcfg = DiffusionConfig(timesteps=50, sampling_timesteps=10, objective="pred_v",
                           loss_weighting_strategy="uniform")
    sched = make_schedule(dcfg)
    nl_cfg = NoiseLevelConfig(noise_level="random_independent", timesteps=50)
    return model_apply, variables["params"], dcfg, sched, nl_cfg


def test_train_step_updates_params_and_ema():
    model_apply, params, dcfg, sched, nl_cfg = _tiny_setup()
    tx = make_optimizer(lr=1e-2, num_warmup_steps=0, lr_schedule_name="constant")
    # train_step donates the state, invalidating the original buffers ->
    # snapshot init params on host before stepping
    init = jax.tree_util.tree_map(np.asarray, params)
    state = create_train_state(params, tx, use_ema=True)
    step = make_train_step(model_apply, dcfg, sched, nl_cfg, ema_decay=0.5)
    batch = {
        "xs": jnp.ones((2, 2, 4, 4, 1)) * 0.3,
        "masks": jnp.ones((2, 2), bool),
    }
    losses = []
    for i in range(3):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert int(state.step) == 3
    assert all(np.isfinite(losses))
    # params moved away from init
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()), state.params, init)
    assert max(jax.tree_util.tree_leaves(d)) > 0
    # EMA trails params but also moved
    de = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.ema_params, init
    )
    assert max(jax.tree_util.tree_leaves(de)) > 0


def test_ema_steps_once_per_optimizer_step_under_accumulation():
    """With MultiSteps(k), EMA must decay only when params actually update
    (reference steps EMA after optimizer.step, simple_video_generation.py
    :307-309); per-micro-step decay would shrink the horizon by k."""
    model_apply, params, dcfg, sched, nl_cfg = _tiny_setup()
    k_acc = 4
    tx = make_optimizer(
        lr=1e-2, num_warmup_steps=0, lr_schedule_name="constant",
        accumulate_steps=k_acc,
    )
    init = jax.tree_util.tree_map(np.asarray, params)
    state = create_train_state(params, tx, use_ema=True)
    step = make_train_step(
        model_apply, dcfg, sched, nl_cfg, ema_decay=0.5, accumulate_steps=k_acc
    )
    batch = {
        "xs": jnp.ones((2, 2, 4, 4, 1)) * 0.3,
        "masks": jnp.ones((2, 2), bool),
    }
    # 3 micro-steps: no optimizer update yet -> EMA must equal init exactly
    for i in range(k_acc - 1):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
        d = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), state.ema_params, init
        )
        assert max(jax.tree_util.tree_leaves(d)) == 0.0
        dp = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), state.params, init
        )
        assert max(jax.tree_util.tree_leaves(dp)) == 0.0  # MultiSteps holds params
    # 4th micro-step: optimizer updates, EMA takes exactly ONE decay step
    state, _ = step(state, batch, jax.random.PRNGKey(99))
    flat_p = jax.tree_util.tree_leaves(state.params)
    flat_e = jax.tree_util.tree_leaves(state.ema_params)
    flat_i = jax.tree_util.tree_leaves(init)
    expected = [0.5 * i0 + 0.5 * np.asarray(p) for i0, p in zip(flat_i, flat_p)]
    for e, exp in zip(flat_e, expected):
        np.testing.assert_allclose(np.asarray(e), exp, rtol=1e-6, atol=1e-7)


def test_param_sharding_rule():
    from jax.sharding import PartitionSpec as P

    assert param_sharding_rule("w", (4, 4), 1) == P()
    assert param_sharding_rule("w", (8,), 4, min_size=4) == P("fsdp")
    assert param_sharding_rule("w", (512, 1024), 4, min_size=16) == P(None, "fsdp")
    assert param_sharding_rule("w", (3, 5), 4, min_size=1) == P()  # indivisible


def test_train_step_on_8_device_mesh(cpu_mesh_devices):
    model_apply, params, dcfg, sched, nl_cfg = _tiny_setup()
    tx = make_optimizer(lr=1e-3, num_warmup_steps=0, lr_schedule_name="constant")
    step = make_train_step(model_apply, dcfg, sched, nl_cfg)
    mesh = make_mesh((4, 2))
    with mesh:
        p_sh = shard_params(params, mesh, min_size=64)
        params_s = jax.tree_util.tree_map(jax.device_put, params, p_sh)
        state = create_train_state(params_s, tx, use_ema=True)
        batch = shard_batch(
            {"xs": np.ones((8, 2, 4, 4, 1), np.float32), "masks": np.ones((8, 2), bool)},
            mesh,
        )
        state, m = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(m["loss"]))
        assert int(state.step) == 1


def test_async_checkpoint_save_restore_and_prune(tmp_path):
    """block=False saves commit in the background (orbax AsyncCheckpointer);
    wait_for_checkpoints() makes them durable, pruning keeps only complete
    dirs, and the restored payload matches the saved state."""
    import optax

    from dfot_tpu.training.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
        wait_for_checkpoints,
    )

    params = {"w": jnp.arange(8, dtype=jnp.float32)}
    tx = optax.sgd(1e-2)
    state = create_train_state(params, tx, use_ema=True)
    ckpt_dir = str(tmp_path / "ckpts")
    for s in (1, 2, 3):
        state = state.replace(params={"w": state.params["w"] + 1.0})
        save_checkpoint(ckpt_dir, s, state, save_top_k=2, block=False)
    wait_for_checkpoints()

    latest = latest_checkpoint(ckpt_dir)
    assert latest.endswith("checkpoint_3")
    restored = restore_checkpoint(latest)
    assert int(np.asarray(restored["step"])) == 3
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.arange(8) + 3.0
    )
    assert "ema_params" in restored
    # pruning runs before each save over COMPLETE dirs only: disk holds at
    # most save_top_k + 1 (the in-flight save), and after the final wait the
    # newest dirs survive
    import os as _os

    dirs = sorted(d for d in _os.listdir(ckpt_dir) if d.startswith("checkpoint_"))
    assert "checkpoint_3" in dirs and len(dirs) <= 3


def test_remat_policy_gradients_match():
    """Finer-grained remat policies (save dots / attention outputs instead of
    recomputing the whole block) must not change the math: loss and grads
    match the policy-free remat bit-for-bit up to float tolerance."""
    from dfot_tpu.models.uvit import UViT3D, UViTSpec

    def build(policy):
        spec = UViTSpec(
            channels=(32, 64), emb_channels=64, patch_size=2,
            block_types=("ResBlock", "TransformerBlock"),
            block_dropouts=(0.0, 0.0), num_updown_blocks=(1,),
            num_mid_blocks=2, num_heads=2, pos_emb_type="rope",
            use_checkpointing=(True, True), max_temporal_length=2,
            remat_policy=policy,
        )
        return UViT3D(spec=spec, x_channels=3, resolution=8)

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 8, 3))
    k = jnp.full((1, 2), 500.0)
    variables = build(None).init({"params": jax.random.PRNGKey(1)}, x, k)

    def loss_and_grads(policy):
        model = build(policy)

        def loss_fn(v):
            return jnp.mean(jnp.square(model.apply(v, x, k)))

        return jax.value_and_grad(loss_fn)(variables)

    ref_loss, ref_grads = loss_and_grads(None)
    for policy in ("dots", "attn", "dots_attn"):
        loss, grads = loss_and_grads(policy)
        assert np.allclose(float(loss), float(ref_loss), rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            ),
            grads, ref_grads,
        )


def test_dit_remat_policy_gradients_match():
    """Same policy-invariance guarantee for the remated DiT3D blocks."""
    from dfot_tpu.models.dit import DiT3D, DiTSpec

    def build(policy):
        spec = DiTSpec(
            hidden_size=32, depth=2, num_heads=2, patch_size=2,
            max_temporal_length=2, use_gradient_checkpointing=True,
            remat_policy=policy,
        )
        return DiT3D(spec=spec, x_channels=3, resolution=(8, 8))

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 8, 3))
    k = jnp.full((1, 2), 500.0)
    variables = build(None).init({"params": jax.random.PRNGKey(1)}, x, k)

    def loss_and_grads(policy):
        model = build(policy)

        def loss_fn(v):
            return jnp.mean(jnp.square(model.apply(v, x, k)))

        return jax.value_and_grad(loss_fn)(variables)

    ref_loss, ref_grads = loss_and_grads(None)
    for policy in ("dots", "attn", "dots_attn"):
        loss, grads = loss_and_grads(policy)
        assert np.allclose(float(loss), float(ref_loss), rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            ),
            grads, ref_grads,
        )


def test_tp_param_sharding_rule():
    from jax.sharding import PartitionSpec as P

    from dfot_tpu.parallel import tp_param_sharding_rule as tp

    # column-parallel: qkv / mlp-in kernels shard the OUTPUT dim
    assert tp("dit/block_0/attn/qkv/kernel", (32, 96), 2) == P(None, "tensor")
    assert tp("trunk/b0/fused_proj/kernel", (64, 448), 2) == P(None, "tensor")
    assert tp("dit/block_0/mlp/fc1/kernel", (32, 128), 4) == P(None, "tensor")
    # ...and their biases
    assert tp("dit/block_0/attn/qkv/bias", (96,), 2) == P("tensor")
    # row-parallel: attention-out / mlp-out kernels shard the INPUT dim
    assert tp("dit/block_0/attn/proj/kernel", (32, 32), 2) == P("tensor", None)
    assert tp("dit/block_0/mlp/fc2/kernel", (128, 32), 2) == P("tensor", None)
    assert tp("trunk/b0/mlp_out/kernel", (128, 64), 2) == P("tensor", None)
    # row-parallel biases stay replicated
    assert tp("dit/block_0/mlp/fc2/bias", (32,), 2) is None
    # UViT's temporal_attn "proj" is a QKV (column), unlike DiT's "proj"
    assert tp("b/temporal_attn/proj/kernel", (64, 192), 2) == P(None, "tensor")
    # indivisible or tp=1 -> no TP spec
    assert tp("dit/block_0/attn/qkv/kernel", (32, 96), 5) is None
    assert tp("dit/block_0/attn/qkv/kernel", (32, 96), 1) is None
    assert tp("dit/final_layer/proj/kernel", (31, 31), 2) is None


def test_train_step_on_tp_mesh_matches_single_device(cpu_mesh_devices):
    """(data=2, fsdp=2, tensor=2) mesh: TP specs are layout, not math — the
    train step must reproduce the single-device loss, and the qkv/mlp kernels
    must actually carry 'tensor' in their committed shardings."""
    model_apply, params, dcfg, sched, nl_cfg = _tiny_setup()
    tx = make_optimizer(lr=1e-3, num_warmup_steps=0, lr_schedule_name="constant")
    step = make_train_step(model_apply, dcfg, sched, nl_cfg)
    batch_np = {
        "xs": np.random.RandomState(0).randn(4, 2, 4, 4, 1).astype(np.float32),
        "masks": np.ones((4, 2), bool),
    }
    rng = jax.random.PRNGKey(7)

    # single device reference (deep copy: train_step donates its state and
    # jnp.asarray aliases, which would delete `params` out from under the
    # mesh run below)
    state0 = create_train_state(
        jax.tree_util.tree_map(lambda a: jnp.array(np.asarray(a)), params),
        tx, use_ema=True,
    )
    _, m0 = step(state0, jax.tree_util.tree_map(jnp.asarray, batch_np), rng)
    ref_loss = float(m0["loss"])

    mesh = make_mesh((2, 2, 2))
    with mesh:
        p_sh = shard_params(params, mesh, min_size=64)
        # at least one kernel must be tensor-sharded (qkv (32,96) divides)
        tp_axes = [
            sh.spec
            for sh in jax.tree_util.tree_leaves(
                p_sh, is_leaf=lambda x: hasattr(x, "spec")
            )
            if "tensor" in tuple(sh.spec)
        ]
        assert tp_axes, "no parameter got a tensor-parallel spec"
        params_s = jax.tree_util.tree_map(jax.device_put, params, p_sh)
        state = create_train_state(params_s, tx, use_ema=True)
        state, m = step(state, shard_batch(batch_np, mesh), rng)
        assert int(state.step) == 1
        np.testing.assert_allclose(float(m["loss"]), ref_loss, rtol=2e-5)
