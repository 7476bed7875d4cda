"""Test configuration.

- Forces the CPU backend with 8 virtual devices so multi-chip mesh/sharding
  tests run without TPU hardware (SURVEY §4e).
- Pins full matmul precision: the CPU backend's default matmul/conv
  precision is reduced, which would mask real numerical differences in the
  PyTorch-parity tests.
- Persistent compilation cache: this container has a single CPU core and
  XLA compiles are expensive; the cache makes re-runs cheap.

1-core scheduling hazard (diagnosed round 3): the 8 virtual devices
execute on 8 spin-waiting threads; on a 1-core host (`nproc` == 1) the
sharded-EXECUTION tests (test_parallel.py's grad-accum / hybrid-multislice
/ model-axis rows, test_categorical's DP row) can degrade from ~1-5 min
each to effectively wedged when several run back-to-back — each collective
rendezvous needs the right thread scheduled while 7 others burn their
quanta spinning.  Every such test passes standalone on the same host
(hybrid-multislice: 70 s standalone vs >75 min wedged in-suite; the pair
grad_accum+hybrid reproduces the wedge).  On >=2-core hosts the full suite
completes in ~30-60 min.  If a 1-core run wedges, run test_parallel.py's
heavy rows individually.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

# The container's sitecustomize force-registers the axon TPU plugin even when
# JAX_PLATFORMS=cpu is in the env; the config update below wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from multimodal_rssm_tpu.core.runtime import enable_persistent_cache  # noqa: E402

# host-scoped CPU cache dir (core/runtime.py): entries are AOT machine
# code, so a cache carried across container hosts must not be shared
enable_persistent_cache(min_compile_secs=0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


TINY_OVERRIDES = [
    "rssm.belief_size=64",
    "rssm.state_size=16",
    "rssm.hidden_size=64",
    "rssm.embedding_size.image=64",
    "rssm.embedding_size.sound=32",
    "rssm.embedding_size.fusion=64",
    "rssm.embedding_size.other=16",
    "train.batch_size=4",
    "train.chunk_size=8",
    "train.experience_size=512",
    "train.use_amp=False",
    "rssm.remat=False",  # remat slows XLA:CPU compiles hugely; tiny shapes fit
]


@pytest.fixture(scope="session")
def tiny_cfg():
    from multimodal_rssm_tpu.core.config import compose

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    return compose(cfg_dir, overrides=TINY_OVERRIDES)


@pytest.fixture(scope="session")
def tiny_dataset_dir(tmp_path_factory, tiny_cfg):
    from multimodal_rssm_tpu.data.synthetic import write_synthetic_dataset

    out = tmp_path_factory.mktemp("episodes")
    shapes = {
        "image_horizon": tiny_cfg.env.observation_shapes["image_horizon"],
        "sound": tiny_cfg.env.observation_shapes["sound"],
    }
    write_synthetic_dataset(str(out), 3, 40, shapes)
    return str(out)


@pytest.fixture(scope="session")
def tiny_buffer(tiny_cfg, tiny_dataset_dir):
    from multimodal_rssm_tpu.data.buffer import build_buffer

    D = build_buffer(tiny_cfg)
    D.load_dataset(tiny_dataset_dir)
    return D
