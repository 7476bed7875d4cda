"""Interactive environments for online (Dreamer-style) training.

The reference is an offline world-model codebase: it ships a MuJoCo
simulation only as a Docker dependency (docker/with_simulation_env/) and
never steps an environment from Python.  This package provides the
steppable-environment surface the online training loop
(multimodal_rssm_tpu/train/online.py) drives:

- ``PegInsertionEnv`` — the MuJoCo peg-insertion task whose scripted
  collector already produces this repo's sim dataset
  (scripts/collect_sim_data.py), exposed as reset/step.
- ``SyntheticEnv`` — a dependency-free COBOTTA-schema toy task for tests
  and smoke runs.

Env protocol (duck-typed):
  ``reset(seed) -> obs``  — dict of single-frame observations (images
  uint8 HWC at the model's input size, other modalities float32);
  ``step(action) -> (obs, reward, done)`` — action in [-1, 1]^action_size;
  attributes ``observation_names``, ``action_size``, ``length``.
"""

from multimodal_rssm_tpu.envs.synthetic import SyntheticEnv


def make_env(name: str, **kwargs):
    """Dispatch by name ('synthetic' | 'peg'); MuJoCo imports lazily."""
    if name == "synthetic":
        return SyntheticEnv(**kwargs)
    if name == "peg":
        from multimodal_rssm_tpu.envs.peg import PegInsertionEnv

        return PegInsertionEnv(**kwargs)
    raise ValueError(f"unknown env '{name}' (expected 'synthetic' or 'peg')")


__all__ = ["SyntheticEnv", "make_env"]
