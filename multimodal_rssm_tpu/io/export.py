"""Serving export: frozen StableHLO artifacts via ``jax.export``.

The reference has no deployment story — inference happens in notebooks
against the live torch modules (check_model.ipynb), so serving a trained
model requires the full research codebase.  The TPU-native route is
``jax.export``: the jitted per-frame posterior filter (and the
filter+actor controller step) is lowered once to StableHLO with the
trained weights baked in as constants, and serialized to a single bytes
artifact.  Any JAX runtime can later rehydrate and call it — no model
code, no config tree, no checkpoint plumbing — and the artifact records
the exact calling convention and the platforms it was lowered for
(cross-platform lowering supported: one artifact can target cpu+tpu).

Input contract (chosen so the artifact is end-to-end for a controller):
image modalities enter as RAW uint8 [B, H, W, C] frames at the configured
observation size and are bit-depth-normalised inside the artifact
(deterministic eval semantics — no dequantisation noise); non-image
modalities enter as float32 [B, ...] already in the dataset's normalised
units (pose preprocessing is a dataset-build step, data/pose.py).

    art = export_filter_step(cfg, model, variables)
    save_exported(art, "filter_step.jaxexport")
    ...
    exp = load_exported("filter_step.jaxexport")          # no model code
    out = exp.call(h, s, action, obs, nonterminal, key)
"""

from __future__ import annotations

import os
from typing import Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jexport

from multimodal_rssm_tpu.ops.image import normalize_image_deterministic


def _as_jax(tree):
    """Coerce checkpoint-loaded numpy leaves to jax arrays.  Weight trees
    restored from msgpack are numpy; numpy arrays indexed with traced
    index arrays inside the export trace raise TracerArrayConversionError
    (PackedWidthConv builds its packed kernel that way)."""
    return jax.tree_util.tree_map(jnp.asarray, tree)


def _obs_structs(cfg, batch_size: int):
    """ShapeDtypeStructs of the raw per-frame observation dict the exported
    functions consume (uint8 HWC images, float32 otherwise)."""
    structs = {}
    for name in cfg.rssm.observation_names_enc:
        shape = tuple(int(x) for x in cfg.env.observation_shapes[name])
        if "image" in name:
            c, h, w = shape
            structs[name] = jax.ShapeDtypeStruct((batch_size, h, w, c),
                                                 jnp.uint8)
        else:
            structs[name] = jax.ShapeDtypeStruct((batch_size, *shape),
                                                 jnp.float32)
    return structs


def _normalize_obs(obs: Mapping[str, jnp.ndarray], bit_depth: int):
    """Deterministic bit-depth normalise of the uint8 image modalities
    (eval semantics: quantise without dequantisation noise)."""
    out = {}
    for name, v in obs.items():
        if "image" in name:
            out[name] = normalize_image_deterministic(v, bit_depth)
        else:
            out[name] = v.astype(jnp.float32)
    return out


def export_filter_step(cfg, model, variables, batch_size: int = 1,
                       det: bool = True,
                       platforms: Optional[Sequence[str]] = None):
    """Export one streaming posterior update (WorldModel.filter_step) with
    the trained ``variables`` baked in.

    Calling convention of the artifact:
        call(belief [B,H] f32, state [B,S] f32, action [B,A] f32,
             observations {name: raw frame}, nonterminal [B,1] f32,
             key uint32[2])
        -> per-step state dict (beliefs / prior / posterior [/ experts]);
           carry forward ``beliefs`` and ``posterior_states``.
    """
    bit_depth = int(cfg.env.bit_depth)
    variables = _as_jax(variables)

    def fn(h, s, action, observations, nonterminal, key):
        obs = _normalize_obs(observations, bit_depth)
        return model.apply(
            variables, h, s, action, obs, nonterminal, key, det, False,
            method=model.filter_step,
        )

    B = batch_size
    args = (
        jax.ShapeDtypeStruct((B, int(model.belief_size)), jnp.float32),
        jax.ShapeDtypeStruct((B, int(model.state_size)), jnp.float32),
        jax.ShapeDtypeStruct((B, int(cfg.env.action_size)), jnp.float32),
        _obs_structs(cfg, B),
        jax.ShapeDtypeStruct((B, 1), jnp.float32),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    return jexport.export(jax.jit(fn), platforms=platforms)(*args)


def export_decode(cfg, model, variables, batch_size: int = 1,
                  platforms: Optional[Sequence[str]] = None):
    """Export the per-modality decoder: (belief [B,H], state [B,S]) ->
    {modality: {'loc': recon}} (weights baked in)."""
    variables = _as_jax(variables)

    def fn(h, s):
        return model.apply(variables, h[None], s[None], False,
                           method=model.decode)

    B = batch_size
    args = (
        jax.ShapeDtypeStruct((B, int(model.belief_size)), jnp.float32),
        jax.ShapeDtypeStruct((B, int(model.state_size)), jnp.float32),
    )
    return jexport.export(jax.jit(fn), platforms=platforms)(*args)


def export_agent_step(cfg, model, actor, wm_variables, actor_params,
                      batch_size: int = 1,
                      platforms: Optional[Sequence[str]] = None):
    """Export the full controller step: raw frame -> posterior update ->
    greedy action (the reference ActorModel's 100-sample mode-seeking
    action, policy.py:103-138).  World-model and actor weights baked in.

    Calling convention:
        call(belief, state, prev_action, observations, nonterminal, key)
        -> (belief', state', action)
    """
    bit_depth = int(cfg.env.bit_depth)
    wm_variables = _as_jax(wm_variables)
    actor_params = _as_jax(actor_params)

    def fn(h, s, prev_action, observations, nonterminal, key):
        obs = _normalize_obs(observations, bit_depth)
        states = model.apply(
            wm_variables, h, s, prev_action, obs, nonterminal, None, True,
            False, method=model.filter_step,
        )
        h2 = states["beliefs"]
        s2 = states["posterior_means"]
        action = actor.apply({"params": actor_params}, h2, s2, key, det=True)
        return h2, s2, action

    B = batch_size
    args = (
        jax.ShapeDtypeStruct((B, int(model.belief_size)), jnp.float32),
        jax.ShapeDtypeStruct((B, int(model.state_size)), jnp.float32),
        jax.ShapeDtypeStruct((B, int(cfg.env.action_size)), jnp.float32),
        _obs_structs(cfg, B),
        jax.ShapeDtypeStruct((B, 1), jnp.float32),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    return jexport.export(jax.jit(fn), platforms=platforms)(*args)


def export_plan_step(cfg, model, wm_variables, batch_size: int = 1,
                     platforms: Optional[Sequence[str]] = None):
    """Export the zero-shot MPC controller step: raw frame -> posterior
    update -> CEM-planned action (train/planner.py; the whole candidate
    search is inside the artifact as one lax.scan program).  Needs only the
    world-model weights — no behavior checkpoint.  ``cfg.planner`` sets
    horizon/candidates/iterations at export time and is baked in.

    Calling convention (same as agent_step):
        call(belief, state, prev_action, observations, nonterminal, key)
        -> (belief', state', action)
    """
    from multimodal_rssm_tpu.train.planner import make_cem_planner

    bit_depth = int(cfg.env.bit_depth)
    wm_variables = _as_jax(wm_variables)
    plan = make_cem_planner(model, cfg)

    def fn(h, s, prev_action, observations, nonterminal, key):
        obs = _normalize_obs(observations, bit_depth)
        states = model.apply(
            wm_variables, h, s, prev_action, obs, nonterminal, None, True,
            False, method=model.filter_step,
        )
        h2 = states["beliefs"]
        s2 = states["posterior_means"]
        action = plan(wm_variables, h2, s2, key)
        return h2, s2, action

    B = batch_size
    args = (
        jax.ShapeDtypeStruct((B, int(model.belief_size)), jnp.float32),
        jax.ShapeDtypeStruct((B, int(model.state_size)), jnp.float32),
        jax.ShapeDtypeStruct((B, int(cfg.env.action_size)), jnp.float32),
        _obs_structs(cfg, B),
        jax.ShapeDtypeStruct((B, 1), jnp.float32),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    return jexport.export(jax.jit(fn), platforms=platforms)(*args)


def save_exported(exported, path: str) -> str:
    """Serialize an Exported to ``path`` atomically; returns the path."""
    data = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def load_exported(path: str):
    """Rehydrate a serialized artifact; call via ``.call(*args)``."""
    with open(path, "rb") as f:
        return jexport.deserialize(f.read())
