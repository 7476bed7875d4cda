"""Latent-state and reward heads.

Re-implements the Gaussian heads of the reference
(utils/models/encoder.py:126-280, utils/models/reward_model.py:10-41):

- ``StochasticStateModel``  p(s_t | h_t): 2-layer MLP -> (loc, softplus
  scale + min_std)                                      (ref encoder.py:126-155)
- ``ObsEncoder``            q(s_t | h_t, o_t)           (ref encoder.py:157-190)
- ``ObsEncoderNoBelief``    q(s_t | o_t)                (ref encoder.py:250-280)
- ``RewardModel``           p(r_t | h_t, s_t): 3-layer MLP -> scalar loc,
  scale 1                                               (ref reward_model.py:10-41)

TPU-native design note: ``ObsEncoder`` exposes ``project_obs`` so the
observation half of its first layer — which does not depend on the recurrent
carry — can be computed for *all* timesteps in one large MXU matmul outside
the ``lax.scan``, leaving only the belief half inside the per-step cell.
This is numerically identical to the reference's fc1 over the concatenated
[h, o] (Linear is additive over input blocks) but far friendlier to the TPU.
The checkpoint importer splits the torch fc1 weight accordingly.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_rssm_tpu.models.layers import Dense, act_fn, fold_tb, unfold_tb

Dtype = Any


def scale_from_raw(raw: jnp.ndarray, min_std_dev: float) -> jnp.ndarray:
    """softplus(raw) + min_std (ref encoder.py:140,175)."""
    return jax.nn.softplus(raw) + min_std_dev


class StochasticStateModel(nn.Module):
    """p(s_t | h_t) (ref encoder.py:126-155)."""

    state_size: int
    hidden_size: int
    activation_function: str = "elu"
    min_std_dev: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        act = act_fn(self.activation_function)
        hidden = act(Dense(self.hidden_size, dtype=self.dtype, name="fc1")(h.astype(self.dtype)))
        out = Dense(2 * self.state_size, dtype=self.dtype, name="fc2")(hidden)
        out = out.astype(jnp.float32)
        loc, raw_scale = jnp.split(out, 2, axis=-1)
        return {"loc": loc, "scale": scale_from_raw(raw_scale, self.min_std_dev)}


class ObsEncoder(nn.Module):
    """q(s_t | h_t, o_t) (ref encoder.py:157-190), with the first layer split
    into a belief half (in-scan) and an observation half (pre-scan).

    fc1([h, o]) == fc1_h(h) + fc1_o(o) + bias; the bias lives in fc1_h.
    """

    state_size: int
    hidden_size: int
    activation_function: str = "elu"
    min_std_dev: float = 0.1
    dtype: Dtype = jnp.float32

    def setup(self):
        self.fc1_h = Dense(self.hidden_size, use_bias=True, dtype=self.dtype)
        self.fc1_o = Dense(self.hidden_size, use_bias=False, dtype=self.dtype)
        self.fc2 = Dense(2 * self.state_size, dtype=self.dtype)

    def project_obs(self, obs_emb: jnp.ndarray) -> jnp.ndarray:
        """Observation half of fc1; call once per rollout over [T*B, E]."""
        return self.fc1_o(obs_emb.astype(self.dtype))

    def __call__(
        self, h: jnp.ndarray, obs_proj: jnp.ndarray
    ) -> Dict[str, jnp.ndarray]:
        act = act_fn(self.activation_function)
        hidden = act(self.fc1_h(h.astype(self.dtype)) + obs_proj.astype(self.dtype))
        out = self.fc2(hidden).astype(jnp.float32)
        loc, raw_scale = jnp.split(out, 2, axis=-1)
        return {"loc": loc, "scale": scale_from_raw(raw_scale, self.min_std_dev)}

    def apply_concat(self, h: jnp.ndarray, obs_emb: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Reference-style single call on [h, o] (used by tests/eval)."""
        return self(h, self.project_obs(obs_emb))


class ObsEncoderNoBelief(nn.Module):
    """q(s_t | o_t) (ref encoder.py:250-280)."""

    state_size: int
    hidden_size: int
    activation_function: str = "elu"
    min_std_dev: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, obs_emb: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        act = act_fn(self.activation_function)
        hidden = act(Dense(self.hidden_size, dtype=self.dtype, name="fc1")(obs_emb.astype(self.dtype)))
        out = Dense(2 * self.state_size, dtype=self.dtype, name="fc2")(hidden)
        out = out.astype(jnp.float32)
        loc, raw_scale = jnp.split(out, 2, axis=-1)
        return {"loc": loc, "scale": scale_from_raw(raw_scale, self.min_std_dev)}


class RewardModel(nn.Module):
    """p(r_t | h_t, s_t) (ref reward_model.py:10-41).

    Operates on stacked [T, B, ·] beliefs/states, folding (T, B) for the MLP.
    Returns loc [T, B] with unit scale.
    """

    hidden_size: int
    activation_function: str = "elu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray, s: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        act = act_fn(self.activation_function)
        T, B = h.shape[:2]
        x = jnp.concatenate(
            [fold_tb(h).reshape(T * B, -1), fold_tb(s).reshape(T * B, -1)],
            axis=-1,
        ).astype(self.dtype)
        x = act(Dense(self.hidden_size, dtype=self.dtype, name="fc1")(x))
        x = act(Dense(self.hidden_size, dtype=self.dtype, name="fc2")(x))
        r = Dense(1, dtype=self.dtype, name="fc3")(x).astype(jnp.float32)
        r = unfold_tb(r, T, B).reshape(T, B)
        return {"loc": r, "scale": jnp.ones_like(r)}
