"""Shared tiny training case for the 2-process multi-host test.

Both the worker processes (tests/_multihost_worker.py) and the in-parent
single-process oracle (tests/test_multihost.py) build the SAME model,
train step, and deterministic per-rank batches from this module, so the
distributed loss can be compared against the oracle exactly.
"""

import numpy as np

T, B_LOCAL, A = 4, 2, 3
# sound + symbolic pose: no image codec (only 64/84/128/256 exist) keeps the
# per-worker compile small while still exercising multimodal PoE fusion
SHAPES = {"pose_quat_v2": (3,), "sound": (128, 20)}
NAMES = ("pose_quat_v2", "sound")


def make_case():
    import jax.numpy as jnp

    from multimodal_rssm_tpu.models.world_model import WorldModel
    from multimodal_rssm_tpu.train import trainer as tr

    model = WorldModel(
        observation_names_enc=NAMES,
        observation_names_rec=("sound",),
        observation_shapes=SHAPES,
        embedding_size={"fusion": 24, "image": 24, "sound": 16, "other": 8},
        activation_function={"cnn": "relu", "dense": "elu", "fusion": "relu"},
        belief_size=24, state_size=8, hidden_size=16, action_size=A,
        normalization=None,
        multimodal=True,
        fusion_method="PoE",
        remat=False,
    )
    from multimodal_rssm_tpu.core.config import ConfigDict

    cfg = ConfigDict({
        "env": {"action_size": A, "bit_depth": 5,
                "observation_shapes": {k: list(v) for k, v in SHAPES.items()}},
        "train": {"batch_size": 2 * B_LOCAL, "chunk_size": T,
                  "use_amp": False},
        "rssm": {
            "belief_size": 24, "state_size": 8, "hidden_size": 16,
            "multimodal": True,
            "multimodal_params": {"fusion_method": "PoE",
                                   "expert_dist": "q(st|ht,ot)"},
            "free_nats": 3.0, "kl_beta": 1.0, "kl_balancing_alpha": 0.5,
            "global_kl_beta": 0.0, "overshooting_distance": 0,
            "overshooting_kl_beta": 0.0, "overshooting_reward_scale": 0.0,
            "worldmodel_LogProbLoss": False, "predict_reward": False,
            "learning_rate_schedule": 0, "model_learning_rate": 1e-3,
            "adam_epsilon": 1e-7, "grad_clip_norm": 100.0,
        },
    })
    optimizer = tr.build_optimizer(cfg)
    # no image modality -> empty augmentation structure
    spec = tr.AugSpec(modalities=())
    draws = {}
    train_step, _ = tr.make_train_step(model, cfg, optimizer, spec)
    return model, cfg, train_step, spec, draws


def local_batch(process_id: int):
    """Deterministic per-rank local half-batch [T, B_LOCAL, ...]."""
    import jax.numpy as jnp

    rng = np.random.default_rng(100 + process_id)
    obs = {
        "pose_quat_v2": rng.normal(size=(T, B_LOCAL, 3)).astype(np.float32),
        "sound": rng.normal(size=(T, B_LOCAL, 128, 20)).astype(np.float32),
    }
    actions = rng.normal(size=(T, B_LOCAL, A)).astype(np.float32)
    rewards = rng.normal(size=(T, B_LOCAL)).astype(np.float32)
    nonterm = np.ones((T, B_LOCAL, 1), np.float32)
    return obs, actions, rewards, nonterm


def concat_global_batch(n_ranks: int):
    """The oracle's view: all ranks' local batches along the batch dim."""
    parts = [local_batch(i) for i in range(n_ranks)]

    def cat(leaves):
        return np.concatenate(leaves, axis=1)

    obs = {k: cat([p[0][k] for p in parts]) for k in parts[0][0]}
    return (obs, cat([p[1] for p in parts]), cat([p[2] for p in parts]),
            cat([p[3] for p in parts]))


def oracle_state(model, cfg):
    """Identical initial TrainState in every process (key-only init)."""
    import jax
    import jax.numpy as jnp

    from multimodal_rssm_tpu.train import trainer as tr

    optimizer = tr.build_optimizer(cfg)
    obs, actions, rewards, nonterm = local_batch(0)
    prep = {
        "pose_quat_v2": jnp.asarray(obs["pose_quat_v2"]),
        "sound": jnp.asarray(obs["sound"]),
    }
    return tr.init_train_state(
        model, cfg, optimizer, jax.random.PRNGKey(0),
        (prep, jnp.asarray(actions), jnp.asarray(rewards),
         jnp.asarray(nonterm)),
    )
