"""Streaming (online) posterior inference for deployment.

The reference infers latent states only over whole pre-recorded episodes
(utils/evaluation/estimate_states.py); a deployed controller needs the
recursive filter: one observation frame in, one posterior out, carrying
(belief, state) between calls.  ``OnlineFilter`` wraps the jit-compiled
``WorldModel.filter_step`` (exactly one step of the training scan — same
parameters, same numerics) plus optional decoding.

    filt = OnlineFilter(model, variables)
    filt.reset(batch_size=1)
    for frame in stream:                       # dict of [B, ...] arrays
        post = filt.step(action, frame)        # preprocessed like training
        recon = filt.decode()                  # optional
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp


class OnlineFilter:
    def __init__(self, model, variables: Mapping[str, Any], det: bool = True,
                 seed: int = 0):
        self.model = model
        self.variables = dict(variables)
        self.det = det
        self.h: Optional[jnp.ndarray] = None
        self.s: Optional[jnp.ndarray] = None
        # internal key stream for det=False when no per-step key is passed
        # (a constant key would draw identical eps noise every frame)
        self._key = jax.random.PRNGKey(seed)

        @jax.jit
        def _step(variables, h, s, action, observations, nonterminal, key):
            return model.apply(
                variables, h, s, action, observations, nonterminal, key, det,
                False, method=model.filter_step,
            )

        @jax.jit
        def _decode(variables, h, s):
            return model.apply(
                variables, h[None], s[None], False, method=model.decode,
            )

        self._step = _step
        self._decode = _decode

    def reset(self, batch_size: int = 1) -> None:
        self.h = jnp.zeros((batch_size, self.model.belief_size), jnp.float32)
        self.s = jnp.zeros((batch_size, self.model.state_size), jnp.float32)

    def step(
        self,
        action: jnp.ndarray,
        observations: Mapping[str, jnp.ndarray],
        nonterminal: Optional[jnp.ndarray] = None,
        key: Optional[jax.Array] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Advance the filter one frame; returns the per-step state dict.
        ``nonterminal`` [B, 1] zeroes the carried state at episode starts
        (same masking as the training scan)."""
        if self.h is None:
            self.reset(next(iter(observations.values())).shape[0])
        B = next(iter(observations.values())).shape[0]
        if nonterminal is None:
            nonterminal = jnp.ones((B, 1), jnp.float32)
        if key is None:
            self._key, key = jax.random.split(self._key)
        out = self._step(self.variables, self.h, self.s,
                         jnp.asarray(action), observations,
                         jnp.asarray(nonterminal), key)
        self.h = out["beliefs"]
        self.s = out["posterior_states"]
        return out

    def decode(self) -> Dict[str, Dict[str, jnp.ndarray]]:
        """Reconstructions from the current (belief, state)."""
        out = self._decode(self.variables, self.h, self.s)
        return jax.tree_util.tree_map(
            lambda x: x[0] if hasattr(x, "shape") and x.ndim > 0 else x, out)
