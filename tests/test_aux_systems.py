"""Aux subsystem tests: attention capture, profiling, eval loss, cluster."""

import os

import jax
import jax.numpy as jnp
import numpy as np


def test_attention_capture_and_heatmaps(tmp_path):
    from dfot_tpu.models.dit import DiT3D, DiTSpec
    from dfot_tpu.ops.attention import set_attention_capture
    from dfot_tpu.utils.attn_capture import (
        capture_attention_maps,
        save_attention_heatmaps,
    )

    spec = DiTSpec(hidden_size=32, depth=1, num_heads=2, mlp_ratio=1.0,
                   variant="full", pos_emb_type="rope_3d", patch_size=2,
                   max_temporal_length=2)
    model = DiT3D(spec=spec, x_channels=1, resolution=(4, 4))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 4, 4, 1))
    k = jnp.zeros((1, 2))
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, k)

    set_attention_capture(True)
    try:
        out, state = model.apply(variables, x, k, mutable=["intermediates"])
        from dfot_tpu.utils.attn_capture import collect_attention_maps

        maps = collect_attention_maps(state["intermediates"])
        assert maps, "no attention maps sown"
        (name, arr), = list(maps.items())[:1]
        # (B, H, N, N) with N = T * patches = 2 * 4
        assert arr.shape[-1] == arr.shape[-2] == 8
        np.testing.assert_allclose(arr.sum(-1), 1.0, atol=1e-5)
        paths = save_attention_heatmaps(maps, str(tmp_path))
        assert paths and os.path.exists(paths[0])
    finally:
        set_attention_capture(False)


def test_step_timer():
    from dfot_tpu.utils.profiling import StepTimer

    t = StepTimer(window=4)
    for _ in range(5):
        t.tick()
    assert t.steps_per_sec > 0


def test_eval_loss_runs():
    from dfot_tpu.algorithms import build_algorithm
    from dfot_tpu.config import load_config

    cfg = load_config([
        "+name=x", "dataset=ucf_101", "algorithm=dfot_video",
        "dataset.resolution=8", "dataset.max_frames=2",
        "++dataset.latent.enabled=false",
        "++algorithm.backbone.hidden_size=32", "++algorithm.backbone.depth=1",
        "++algorithm.backbone.num_heads=2",
        "++algorithm.backbone.use_gradient_checkpointing=false",
    ])
    algo = build_algorithm(cfg, compute_dtype=jnp.float32)
    params = algo.init_params(jax.random.PRNGKey(0))["params"]
    eval_loss = algo.make_eval_loss()
    batch = {"xs": jnp.ones((1, 2, 8, 8, 3)) * 0.2, "masks": jnp.ones((1, 2), bool)}
    loss = float(eval_loss(params, batch, jax.random.PRNGKey(1)))
    assert np.isfinite(loss) and loss > 0


def test_cluster_template_render(tmp_path):
    from dfot_tpu.config import load_config
    from dfot_tpu.utils.cluster import submit_cluster_job

    cfg = load_config(["cluster=base_slurm", "+name=job"])
    # use 'bash -c true'-style submitter so no slurm is needed
    cfg.cluster["submit_command"] = "true"
    path = submit_cluster_job(
        cfg.cluster, "job", "python main.py +name=job", str(tmp_path)
    )
    text = open(path).read()
    assert "#SBATCH --job-name=job" in text
    assert "python main.py +name=job" in text
    assert os.path.islink(os.path.join(tmp_path, "slurm_logs", "latest"))


def test_history_guidance_visualizer(tmp_path):
    from dfot_tpu.guidance import HistoryGuidance, visualize_plan
    from dfot_tpu.sampling.sampler import plan_sampling

    hg = HistoryGuidance.stabilized_vanilla(
        guidance_scale=4.0, stabilization_level=0.02, timesteps=1000
    )
    mask = np.zeros((1, 4), dtype=np.int64)
    mask[:, :2] = 1
    plan = plan_sampling(mask, hg, "full_sequence", 1000, 4, 4, 0)
    path = visualize_plan(plan, 1000, str(tmp_path / "hg.gif"), max_steps=3)
    assert os.path.exists(path) and os.path.getsize(path) > 0


def test_export_sampler_roundtrip(tmp_path):
    """jax.export serving artifact: the serialized window sampler reproduces
    the in-process sampler bit-for-bit (scripts/export_sampler.py)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "sampler.jaxexport")
    env = {**os.environ, "PYTHONPATH": "", "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts/export_sampler.py"),
         "--tiny", "--out", out],
        capture_output=True, text=True, env=env, cwd=repo, timeout=500,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts/export_sampler.py"),
         "--tiny", "--load", out],
        capture_output=True, text=True, env=env, cwd=repo, timeout=500,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "bit-equal vs in-process sampler: True" in r.stdout


def test_fetch_and_verify_fixtures_subset(tmp_path):
    """Day-1 weights pipeline dry run (scripts/fetch_and_verify.py): fixture
    write -> registry fail-fast load -> smoke -> FVD -> DFoT ckpt import +
    sample, on the fast subset (reference ckpt_utils.py:111-121 download
    flow, replayed against random-weight fixtures)."""
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env.update({"PYTHONPATH": "", "JAX_PLATFORMS": "cpu"})
    r = subprocess.run(
        [sys.executable, "scripts/fetch_and_verify.py", "--fixtures",
         "--only", "lpips,laion", "--tmp", str(tmp_path)],
        capture_output=True, text=True, timeout=520,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "RESULT: PASS" in r.stdout
    assert "lpips: PASS" in r.stdout
    assert '"tree_match": true' in r.stdout and '"sample_ok": true' in r.stdout


def test_bench_probe_failure_emits_parsable_record(monkeypatch, capsys):
    """The perf channel must never die silently (VERDICT r3 missing #1):
    an unavailable backend yields retries then a machine-readable error
    record keyed to the flagship metric, with rc-0 semantics."""
    import json
    import sys as _sys

    sys_path_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if sys_path_root not in _sys.path:
        _sys.path.insert(0, sys_path_root)
    import bench

    # a python that always fails fast simulates a dead backend
    monkeypatch.setattr(bench.sys, "executable", "/bin/false")
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    probe = bench.probe_backend(budget_sec=0.5)
    assert probe["ok"] is False and probe["attempts"] >= 1

    out = capsys.readouterr().out.strip().splitlines()
    retry = json.loads(out[-1])
    assert retry["metric"] == "backend_probe_retry"
    assert retry["phase"] == "backend_probe"

    bench.set_phase("backend_probe")
    bench.emit_error("TPU backend unavailable after retries: x",
                     probe_attempts=probe["attempts"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["metric"] == bench.FLAGSHIP_METRIC
    assert rec["value"] == 0.0 and "error" in rec and rec["phase"] == "backend_probe"


def test_bench_probe_success_path(monkeypatch):
    """A healthy backend probe returns ok with backend identification."""
    import sys as _sys

    sys_path_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if sys_path_root not in _sys.path:
        _sys.path.insert(0, sys_path_root)
    import bench

    # stand in for `python -c "import jax; ..."` with a trivially-ok command
    monkeypatch.setattr(bench.sys, "executable", "/bin/true")
    probe = bench.probe_backend(budget_sec=30.0)
    assert probe["ok"] is True and probe["attempts"] == 1


def test_floor_script_pallas_kind_classification():
    """recompute_floor tells attention-dot pallas calls from the r5
    data-movement kernels by output signature (the r4 'custom-call <=>
    attention' rule would promote bandwidth kernels to the MXU cap)."""
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "recompute_floor",
        pathlib.Path(__file__).parent.parent / "scripts" / "recompute_floor.py",
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    flash = ("%up.1 = (bf16[36,8192,64]{2,1,0}, f32[36,8192,1]{2,1,0}) "
             "custom-call(bf16[36,8192,64]{2,1,0} %a)")
    dkv = ("%g.2 = (bf16[36,8192,128]{2,1,0}, bf16[36,8192,128]{2,1,0}) "
           "custom-call(bf16[36,8192,128]{2,1,0} %a)")
    dq = "%g.3 = bf16[36,8192,128]{2,1,0} custom-call(bf16[8,1,2]{2,1,0} %a)"
    prep = ("%b.4 = (bf16[4,9,8192,64]{3,2,1,0}, bf16[4,9,8192,64]{3,2,1,0},"
            " bf16[4,9,8192,65]{3,2,1,0}) custom-call(bf16[4,8192,1728] %a)")
    collect = "%b.5 = bf16[4,8192,576]{2,1,0} custom-call(bf16[4,9,8192,64] %a)"
    ln = "%c.6 = bf16[8,1280,1152]{2,1,0} custom-call(bf16[8,1280,1152] %a)"
    fusion = "%f.7 = bf16[4,8192,576]{2,1,0} fusion(bf16[2,2]{1,0} %a)"

    assert m._pallas_kind(flash) == "attention"
    assert m._pallas_kind(dkv) == "attention"
    assert m._pallas_kind(dq) == "attention"
    assert m._pallas_kind(prep) == "pallas_move"
    assert m._pallas_kind(collect) == "pallas_move"
    assert m._pallas_kind(ln) == "pallas_move"
    assert m._pallas_kind(fusion) == ""


def test_bench_run_workload_retry_semantics(monkeypatch):
    """run_workload retries ONCE on transient tunnel/HBM failures (dropping
    the exception frames so a dead attempt can't pin device memory) and
    fails fast on everything else — the r5 bench-hardening contract."""
    import bench

    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("INTERNAL: remote_compile: HTTP 500: boom")
        return {"ok": True}

    out, err = bench.run_workload(flaky)
    assert out == {"ok": True} and err is None and calls["n"] == 2

    calls["n"] = 0

    def oom():
        calls["n"] += 1
        raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")

    out, err = bench.run_workload(oom)
    assert out is None and "RESOURCE_EXHAUSTED" in err and calls["n"] == 2

    calls["n"] = 0

    def fatal():
        calls["n"] += 1
        raise ValueError("shape mismatch")

    out, err = bench.run_workload(fatal)
    assert out is None and "shape mismatch" in err and calls["n"] == 1
