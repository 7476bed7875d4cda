"""Actor / value networks (Dreamer-style policy heads).

Parity port of utils/models/policy.py — unused by the reference's training
path (SURVEY §2: "never imported by the training path") but part of its
capability surface for future online RL:

- ``ValueModel``     V(h, s): 4-layer MLP -> scalar Gaussian     (ref :11-43)
- ``Pie``            tanh-normal policy head pi(a | h, s)        (ref :46-101)
- ``ActorModel``     tanh squash + 100-sample mode-seeking det
  action                                                         (ref :103-138)
- ``PieEmb`` / ``ActorModelEnc`` encoder-conditioned variants    (ref :140-240)

Plus one post-reference addition: ``TwoHotValueModel``, the DreamerV3
discrete-regression critic (symlog two-hot bins), selected by
``behavior.value_head=twohot_symlog``.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_rssm_tpu.models.encoders import build_encoder
from multimodal_rssm_tpu.models.layers import Dense, act_fn, fold_tb, unfold_tb
from multimodal_rssm_tpu.ops import gaussian

Dtype = Any


class ValueModel(nn.Module):
    """V(h_t, s_t) (ref policy.py:11-43): folds (T, B), 4-layer MLP."""

    hidden_size: int
    activation_function: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray, s: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        act = act_fn(self.activation_function)
        T, B = h.shape[:2]
        x = jnp.concatenate(
            [fold_tb(h).reshape(T * B, -1), fold_tb(s).reshape(T * B, -1)],
            axis=-1,
        ).astype(self.dtype)
        for i in (1, 2, 3):
            x = act(Dense(self.hidden_size, dtype=self.dtype, name=f"fc{i}")(x))
        loc = Dense(1, dtype=self.dtype, name="fc4")(x).astype(jnp.float32)
        loc = unfold_tb(loc, T, B).reshape(T, B)
        return {"loc": loc, "scale": jnp.ones_like(loc)}

    def get_log_prob(self, h, s, r):
        out = self(h, s)
        return gaussian.log_prob(out["loc"], out["scale"], r)


class TwoHotValueModel(nn.Module):
    """Discrete-regression critic (DreamerV3): V(h, s) as a categorical
    over fixed symlog-spaced bins, trained by cross-entropy against the
    two-hot encoding of symlog(target) — gradient scale is independent of
    the return scale (ops/returns.py).  No reference counterpart; selected
    by ``behavior.value_head=twohot_symlog``.

    Same [T, B] folding and trunk depth as ``ValueModel`` so the two heads
    are drop-in interchangeable; ``__call__`` returns the decoded value
    under "loc" (plus "logits"), so every consumer of ``ValueModel``'s
    output works unchanged.
    """

    hidden_size: int
    num_bins: int = 255
    activation_function: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray, s: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        from multimodal_rssm_tpu.ops import returns as rt

        act = act_fn(self.activation_function)
        T, B = h.shape[:2]
        x = jnp.concatenate(
            [fold_tb(h).reshape(T * B, -1), fold_tb(s).reshape(T * B, -1)],
            axis=-1,
        ).astype(self.dtype)
        for i in (1, 2, 3):
            x = act(Dense(self.hidden_size, dtype=self.dtype, name=f"fc{i}")(x))
        logits = Dense(self.num_bins, dtype=self.dtype, name="fc4")(x)
        logits = unfold_tb(logits.astype(jnp.float32), T, B).reshape(
            T, B, self.num_bins)
        bins = rt.bin_centers(self.num_bins)
        value = rt.symexp(rt.twohot_decode(jax.nn.softmax(logits, -1), bins))
        return {"loc": value, "logits": logits,
                "scale": jnp.ones_like(value)}


def _policy_dist(raw: jnp.ndarray, mean_scale: float, init_std: float,
                 min_std: float) -> Dict[str, jnp.ndarray]:
    """(loc, scale) head shared by Pie/PieEmb (ref :87-92)."""
    raw_init_std = math.log(math.exp(init_std) - 1.0)
    mean, raw_std = jnp.split(raw, 2, axis=-1)
    mean = mean_scale * jnp.tanh(mean / mean_scale)
    std = jax.nn.softplus(raw_std + raw_init_std) + min_std
    return {"loc": mean, "scale": std}


class Pie(nn.Module):
    """tanh-normal policy head pi(a | h, s) (ref :46-101)."""

    hidden_size: int
    action_size: int
    activation_function: str = "elu"
    min_std: float = 1e-4
    init_std: float = 5.0
    mean_scale: float = 5.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray, s: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        act = act_fn(self.activation_function)
        x = jnp.concatenate([h, s], axis=-1).astype(self.dtype)
        for i in (1, 2, 3, 4):
            x = act(Dense(self.hidden_size, dtype=self.dtype, name=f"fc{i}")(x))
        raw = Dense(2 * self.action_size, dtype=self.dtype, name="fc5")(x)
        return _policy_dist(raw.astype(jnp.float32), self.mean_scale,
                            self.init_std, self.min_std)

    def sample(self, h, s, key, sample_shape: Tuple[int, ...] = ()):
        d = self(h, s)
        eps = jax.random.normal(key, (*sample_shape, *d["loc"].shape))
        return d["loc"] + d["scale"] * eps

    def get_log_prob(self, h, s, a):
        d = self(h, s)
        return gaussian.log_prob(d["loc"], d["scale"], a)


def mode_seeking_action(sample_fn, log_prob_fn, key, n_samples: int = 100):
    """The reference's det-action trick (ref :119-133): draw N tanh-squashed
    samples, pick the per-batch-element argmax of the squash-corrected log
    density."""
    raw = sample_fn(key, (n_samples,))          # [N, B, A]
    actions = jnp.tanh(raw)
    logprob = log_prob_fn(raw)                   # [N, B, A]
    logprob = logprob - jnp.log(1.0 - jnp.square(actions) + 1e-6)
    logprob = logprob.sum(-1)                    # [N, B]
    idx = jnp.argmax(logprob, axis=0)            # [B]
    return jnp.take_along_axis(
        actions, idx[None, :, None], axis=0
    )[0]


class ActorModel(nn.Module):
    """tanh-squashed actor (ref :103-138)."""

    hidden_size: int
    action_size: int
    activation_function: str = "elu"
    min_std: float = 1e-4
    init_std: float = 5.0
    mean_scale: float = 5.0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.pie = Pie(
            hidden_size=self.hidden_size, action_size=self.action_size,
            activation_function=self.activation_function, min_std=self.min_std,
            init_std=self.init_std, mean_scale=self.mean_scale, dtype=self.dtype,
        )

    def __call__(self, h, s, key, det: bool = False):
        return self.get_action(h, s, key, det)

    def get_action(self, h, s, key, det: bool = False):
        if det:
            return mode_seeking_action(
                lambda k, shape: self.pie.sample(h, s, k, shape),
                lambda raw: gaussian.log_prob(
                    self.pie(h, s)["loc"], self.pie(h, s)["scale"], raw
                ),
                key,
            )
        return jnp.tanh(self.pie.sample(h, s, key))


class PieEmb(nn.Module):
    """Encoder-embedding-conditioned policy head (ref :140-195)."""

    hidden_size: int
    action_size: int
    activation_function: str = "elu"
    min_std: float = 1e-4
    init_std: float = 5.0
    mean_scale: float = 5.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        act = act_fn(self.activation_function)
        x = x.astype(self.dtype)
        for i in (1, 2, 3, 4):
            x = act(Dense(self.hidden_size, dtype=self.dtype, name=f"fc{i}")(x))
        raw = Dense(2 * self.action_size, dtype=self.dtype, name="fc5")(x)
        return _policy_dist(raw.astype(jnp.float32), self.mean_scale,
                            self.init_std, self.min_std)

    def sample(self, x, key, sample_shape: Tuple[int, ...] = ()):
        d = self(x)
        eps = jax.random.normal(key, (*sample_shape, *d["loc"].shape))
        return d["loc"] + d["scale"] * eps


class ActorModelEnc(nn.Module):
    """Observation-conditioned actor: encoder + PieEmb (ref :197-240)."""

    name_enc: str
    observation_shapes: Mapping[str, Sequence[int]]
    embedding_size: Mapping[str, int]
    activation_function: Mapping[str, str]
    hidden_size: int
    action_size: int
    normalization: Optional[str] = None
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = build_encoder(
            self.name_enc, self.observation_shapes, self.embedding_size,
            self.activation_function, self.normalization, self.dtype,
        )
        self.pie = PieEmb(
            hidden_size=self.hidden_size, action_size=self.action_size,
            activation_function=self.activation_function["dense"],
            dtype=self.dtype,
        )

    def __call__(self, obs, key, det: bool = False, train: bool = False):
        x = self.encoder(obs, train=train)
        if det:
            return mode_seeking_action(
                lambda k, shape: self.pie.sample(x, k, shape),
                lambda raw: gaussian.log_prob(
                    self.pie(x)["loc"], self.pie(x)["scale"], raw
                ),
                key,
            )
        return jnp.tanh(self.pie.sample(x, key))
