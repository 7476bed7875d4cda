"""Shared bring-up for the profiling scripts (profile_step / op_profile /
micro_bench): compile-cache config, synthetic batch, aug spec, model and
train-state construction — one place so the profilers can't drift apart."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def enable_compile_cache():
    from multimodal_rssm_tpu.core.runtime import enable_persistent_cache

    enable_persistent_cache()


def fill_synthetic_buffer(D, cfg, episodes: int = 4, ep_len: int = 120):
    """Write ``episodes`` synthetic COBOTTA-schema episodes straight into
    the host ring buffer (no filesystem round trip) — the shared buffer
    population for bench.py / sweep_perf / bench_scaling, so the
    done->nonterminals and row conventions can't drift between harnesses."""
    import numpy as np

    from multimodal_rssm_tpu.data.synthetic import synthetic_episode

    shapes = {
        "image_horizon": cfg.env.observation_shapes["image_horizon"],
        "sound": cfg.env.observation_shapes["sound"],
    }
    for i in range(episodes):
        ep = synthetic_episode(ep_len, shapes, cfg.env.action_name,
                               int(cfg.env.action_size), seed=i)
        ep["nonterminals"] = 1.0 - np.expand_dims(ep.pop("done"), -1)
        idx = np.arange(D.idx, D.idx + ep_len)
        for name in D.observation_names:
            D.observations[name][idx] = ep[name]
        D.actions[idx] = ep[cfg.env.action_name]
        D.rewards[idx] = ep["reward"]
        D.nonterminals[idx] = ep["nonterminals"]
        D.idx += ep_len
        D.steps += ep_len
        D.episodes += 1
    return D


def build_step_setup(batch_size: int, chunk_size: int, overrides=()):
    """Compose the config, build a synthetic raw batch, the image-only
    AugSpec/draws, the model, and an initialised TrainState.

    Returns (cfg, model, optimizer, spec, draws, raw, prep, state, key).
    """
    import jax

    from multimodal_rssm_tpu.core.config import compose
    from multimodal_rssm_tpu.models.world_model import WorldModel
    from multimodal_rssm_tpu.train import trainer as tr

    import __graft_entry__ as ge

    cfg = compose(
        os.path.join(_REPO, "configs"),
        overrides=[f"train.batch_size={batch_size}",
                   f"train.chunk_size={chunk_size}"] + list(overrides),
    )
    L, B = int(cfg.train.chunk_size), int(cfg.train.batch_size)
    raw = ge._synthetic_batch(cfg, L, B)
    model = WorldModel.from_config(cfg, dtype=tr.compute_dtype(cfg))
    optimizer = tr.build_optimizer(cfg)

    mods = []
    for name in raw[0]:
        if "image" in name:
            hw = tuple(raw[0][name].shape[2:4])
            mods.append((name, tr.ModalityAugSpec(
                out_size=hw, needs_crop=False, noise=False, pca=False,
                normalize=True)))
    spec = tr.AugSpec(modalities=tuple(mods))
    draws = {name: {} for name, _ in spec.modalities}
    key = jax.random.PRNGKey(0)

    prep = tr.prepare_observations(raw[0], spec, draws,
                                   int(cfg.env.bit_depth), key)
    state = tr.init_train_state(model, cfg, optimizer, key,
                                (prep, raw[1], raw[2], raw[3]))
    return cfg, model, optimizer, spec, draws, raw, prep, state, key
