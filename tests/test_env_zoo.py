"""External-suite adapters (envs/zoo.py): schema conversion, both gym API
generations, dm_env TimeStep stepping, robosuite dict observations, and
registry dispatch — all driven by duck-typed fakes so the suite needs no
gym/dm_control/robosuite install (the adapters' own imports are lazy).
Reference parity target: the reference sim image's env zoo
(docker/with_simulation_env/Dockerfile) — capability, not code, since the
reference ships no env modules.
"""

import numpy as np
import pytest

from multimodal_rssm_tpu.envs import make_env
from multimodal_rssm_tpu.envs.zoo import (
    ContactTrace,
    DMControlAdapter,
    GymAdapter,
    RobosuiteAdapter,
    _map_to_box,
    flatten_observation,
    make_zoo_env,
    pose_vector,
    resize_frame,
)


def check_schema(obs, size=64):
    assert set(obs) == {"image_horizon", "sound", "pose_quat_v2"}
    assert obs["image_horizon"].shape == (size, size, 3)
    assert obs["image_horizon"].dtype == np.uint8
    assert obs["sound"].shape == (128, 20)
    assert obs["sound"].dtype == np.float32
    assert obs["pose_quat_v2"].shape == (3,)
    assert obs["pose_quat_v2"].dtype == np.float32
    assert np.all(np.abs(obs["pose_quat_v2"]) <= 1.0)


# -- pure helpers -----------------------------------------------------------


def test_resize_identity_and_down():
    frame = np.arange(64 * 64 * 3, dtype=np.uint8).reshape(64, 64, 3)
    out = resize_frame(frame, 64)
    assert out is frame or np.array_equal(out, frame)
    down = resize_frame(np.zeros((128, 96, 3), np.uint8), 64)
    assert down.shape == (64, 64, 3) and down.dtype == np.uint8


def test_resize_float_and_rgba_inputs():
    rgba = np.ones((32, 32, 4), np.float32) * 0.5
    out = resize_frame(rgba, 64)
    assert out.shape == (64, 64, 3)
    assert np.all(out == 127)
    with pytest.raises(ValueError):
        resize_frame(np.zeros((32, 32)), 64)


def test_pose_vector_squash_and_pad():
    p = pose_vector([10.0, -10.0], dim=3)
    assert p.shape == (3,)
    assert p[0] > 0.99 and p[1] < -0.99 and p[2] == 0.0


def test_flatten_observation_dict_order_and_image_skip():
    obs = {
        "b": np.array([3.0, 4.0]),
        "a": np.array(2.0),
        "cam": np.zeros((32, 32, 3)),  # image plane: skipped
    }
    flat = flatten_observation(obs)
    assert np.allclose(flat, [2.0, 3.0, 4.0])


def test_map_to_box_affine_and_infinite():
    out = _map_to_box(np.array([-1.0, 0.0, 1.0], np.float32),
                      low=[0.0, -2.0, -np.inf],
                      high=[4.0, 2.0, np.inf])
    assert np.allclose(out[:2], [0.0, 0.0])
    assert out[2] == 1.0  # unbounded dim passes through


def test_contact_trace_energy_tracks_amplitude():
    quiet, loud = ContactTrace(), ContactTrace()
    for _ in range(50):
        quiet.push(0.01)
        loud.push(5.0)
    assert loud.spectrogram().sum() > quiet.spectrogram().sum()
    assert quiet.spectrogram().shape == (128, 20)


# -- fake suites ------------------------------------------------------------


class FakeGymnasium:
    """New-API gym: reset(seed=) -> (obs, info); 5-tuple step; Box."""

    class action_space:
        low = np.array([-2.0, -2.0], np.float32)
        high = np.array([2.0, 2.0], np.float32)

    def __init__(self, horizon=6):
        self.horizon = horizon
        self.t = 0
        self.last_action = None

    def reset(self, seed=None):
        self.t = 0
        return np.array([0.1, 0.2, 0.3, 0.4], np.float32), {}

    def step(self, action):
        self.last_action = np.asarray(action)
        self.t += 1
        obs = np.full(4, 0.1 * self.t, np.float32)
        return obs, 1.0, self.t >= self.horizon, False, {}

    def render(self):
        return np.full((48, 48, 3), 30 * (self.t % 8), np.uint8)


class FakeClassicGym:
    """Old-API gym: reset() (no seed kwarg) -> obs; 4-tuple step;
    Discrete actions; no rgb rendering."""

    class action_space:
        n = 3

    def __init__(self):
        self.t = 0
        self.last_action = None

    def reset(self):
        self.t = 0
        return np.zeros(2, np.float32)

    def step(self, action):
        self.last_action = action
        self.t += 1
        return np.zeros(2, np.float32), -1.0, False, {}

    def render(self):
        return None


class _Spec:
    minimum = np.array([-1.0, -1.0, -1.0], np.float64)
    maximum = np.array([1.0, 1.0, 1.0], np.float64)


class _TimeStep:
    def __init__(self, obs, reward, last):
        self.observation = obs
        self.reward = reward
        self._last = last

    def last(self):
        return self._last


class FakeDMControl:
    """dm_env protocol: TimeSteps, action_spec(), dict observations."""

    def __init__(self, horizon=5):
        self.horizon = horizon
        self.t = 0

    def action_spec(self):
        return _Spec()

    def reset(self):
        self.t = 0
        return _TimeStep({"position": np.array([0.3, -0.2]),
                          "velocity": np.zeros(2)}, None, False)

    def step(self, action):
        assert np.all(np.abs(action) <= 1.0 + 1e-6)
        self.t += 1
        return _TimeStep({"position": np.array([0.3, -0.2]),
                          "velocity": np.ones(2)}, 0.5,
                         self.t >= self.horizon)


class FakeRobosuite:
    """robosuite protocol: dict obs with agentview_image + proprio-state,
    action_spec property, 4-tuple step."""

    def __init__(self, horizon=5):
        self.horizon = horizon
        self.t = 0

    @property
    def action_spec(self):
        return (np.full(7, -1.0, np.float64), np.full(7, 1.0, np.float64))

    def _obs(self):
        img = np.zeros((64, 64, 3), np.uint8)
        img[0, :, 0] = 255  # top row marker (pre-flip)
        return {
            "agentview_image": img,
            "robot0_proprio-state": np.linspace(-1, 1, 32),
            "robot0_eef_force": np.array([0.0, 0.0, 9.8]),
        }

    def reset(self):
        self.t = 0
        return self._obs()

    def step(self, action):
        assert action.shape == (7,)
        self.t += 1
        return self._obs(), 0.1, self.t >= self.horizon, {}


# -- adapters over the fakes ------------------------------------------------


def test_gym_adapter_new_api_schema_and_mapping():
    fake = FakeGymnasium()
    env = GymAdapter(env=fake, length=10, seed=0)
    assert env.action_size == 2
    obs = env.reset(seed=0)
    check_schema(obs)
    obs, reward, done = env.step(np.array([1.0, -1.0]))
    check_schema(obs)
    assert reward == 1.0 and not done
    # affine [-1,1] -> [-2,2]
    assert np.allclose(fake.last_action, [2.0, -2.0])


def test_gym_adapter_env_done_and_length_cap():
    env = GymAdapter(env=FakeGymnasium(horizon=3), length=10)
    env.reset(seed=0)
    dones = [env.step(np.zeros(2))[2] for _ in range(3)]
    assert dones == [False, False, True]  # env's own termination
    env2 = GymAdapter(env=FakeGymnasium(horizon=100), length=4)
    env2.reset(seed=0)
    dones = [env2.step(np.zeros(2))[2] for _ in range(4)]
    assert dones == [False, False, False, True]  # adapter length cap


def test_gym_adapter_classic_api_discrete_and_no_render():
    fake = FakeClassicGym()
    env = GymAdapter(env=fake, length=5)
    assert env.action_size == 3
    obs, reward, done = env.step(np.array([0.1, 0.9, 0.2]))
    check_schema(obs)
    assert fake.last_action == 1  # argmax bin
    assert np.all(obs["image_horizon"] == 0)  # zero frame fallback


def test_dmc_adapter_timestep_protocol():
    env = DMControlAdapter(env=FakeDMControl(), length=10)
    assert env.action_size == 3
    obs = env.reset(seed=0)
    check_schema(obs)
    for i in range(5):
        obs, reward, done = env.step(np.full(3, 2.0))  # clipped to 1
        check_schema(obs)
        assert reward == 0.5
    assert done  # fake's horizon == 5


def test_robosuite_adapter_flip_and_contact():
    env = RobosuiteAdapter(env=FakeRobosuite(), length=10)
    assert env.action_size == 7
    obs = env.reset(seed=0)
    check_schema(obs)
    # the pre-flip top-row marker must land on the BOTTOM row
    assert np.all(obs["image_horizon"][-1, :, 0] == 255)
    assert np.all(obs["image_horizon"][0, :, 0] == 0)
    obs, reward, done = env.step(np.zeros(7))
    # eef force 9.8 N drives the contact trace: non-silent spectrogram
    assert obs["sound"].sum() > 0.0


def test_online_protocol_compat_rollout():
    """The adapter satisfies the duck-typed protocol train/online.py's
    collect_episode drives: reset(seed=) -> obs dict; step -> (obs,
    reward, done); observation_names / action_size / length attrs."""
    env = GymAdapter(env=FakeGymnasium(horizon=100), length=6)
    assert env.observation_names == ("image_horizon", "sound",
                                     "pose_quat_v2")
    rng = np.random.default_rng(0)
    obs, done, steps = env.reset(seed=1), False, 0
    while not done:
        action = rng.uniform(-1, 1, env.action_size).astype(np.float32)
        obs, reward, done = env.step(action)
        check_schema(obs)
        steps += 1
    assert steps == env.length


# -- registry ---------------------------------------------------------------


def test_make_zoo_env_dispatch_errors():
    with pytest.raises(ValueError, match="unknown env suite"):
        make_zoo_env("atari:Pong")
    with pytest.raises(ValueError, match="malformed"):
        make_zoo_env("gym:")
    with pytest.raises(ValueError, match="malformed dmc"):
        make_zoo_env("dmc:cartpole")


def test_make_env_routes_suite_specs_with_injected_env():
    env = make_env("gym:anything", env=FakeGymnasium(), length=3)
    assert isinstance(env, GymAdapter)
    env = make_env("dmc:d:t", env=FakeDMControl(), length=3)
    assert isinstance(env, DMControlAdapter)
    env = make_env("robosuite:Lift", env=FakeRobosuite(), length=3)
    assert isinstance(env, RobosuiteAdapter)
    with pytest.raises(ValueError, match="unknown env"):
        make_env("nope")


def test_gym_adapter_import_error_message():
    """Without the suites installed, the failure is a clear ImportError
    naming the install path (not an AttributeError deep in the adapter)."""
    pytest.importorskip  # documentative; the real check:
    try:
        import gymnasium  # noqa: F401
        pytest.skip("gymnasium installed; error path not reachable")
    except ImportError:
        pass
    try:
        import gym  # noqa: F401
        pytest.skip("gym installed; error path not reachable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="gymnasium or gym"):
        GymAdapter("Pendulum-v1")


# -- online training over a zoo adapter (integration) -----------------------


@pytest.mark.slow
def test_run_online_over_gym_adapter(tmp_path):
    """The full online Dreamer loop runs against an external-suite
    adapter: the gym env's 2-D action space (vs the COBOTTA default 3)
    flows through cfg.env.action_size into the buffer, actor, and
    collection, and every loss stays finite."""
    import copy
    import json
    import os

    import jax

    from multimodal_rssm_tpu.core.config import compose
    from multimodal_rssm_tpu.io.metrics import MetricLogger
    from multimodal_rssm_tpu.train.online import online_cfg, run_online
    from tests.conftest import TINY_OVERRIDES

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = copy.deepcopy(compose(cfg_dir, overrides=TINY_OVERRIDES))
    cfg.online = {"seed_episodes": 1, "episodes": 1, "collect_interval": 1,
                  "checkpoint_interval": 1}
    cfg.behavior = {"horizon": 3}
    online_cfg(cfg)

    env = GymAdapter(env=FakeGymnasium(horizon=100), length=12)
    # the CLI (cli/train_online.py) syncs this from the env; do the same
    cfg.env.action_size = int(env.action_size)
    assert cfg.env.action_size == 2

    logger = MetricLogger(str(tmp_path))
    run_online(cfg, env, str(tmp_path), logger, jax.random.PRNGKey(0),
               progress=False)
    logger.finish()

    rows = [json.loads(l)
            for l in open(os.path.join(tmp_path, "metrics.jsonl"))]
    online_rows = [r for r in rows if "episode_reward/online" in r]
    assert len(online_rows) == 1
    assert np.isfinite(online_rows[0]["wm_loss/online"])
    assert online_rows[0]["episode_steps/online"] == 12.0
