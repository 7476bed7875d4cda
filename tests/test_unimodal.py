"""Unimodal (image-only) RSSM: the reference's plain PlaNet-style variant
(algos/MRSSM/RSSM/algo.py) — rollout parity vs the reference TransitionModel
and an end-to-end tiny training run via the unimodal config group."""

import copy
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
torch = pytest.importorskip("torch")
if os.path.isdir(REFERENCE) and REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_rssm_tpu.io import torch_import  # noqa: E402
from multimodal_rssm_tpu.models.world_model import WorldModel  # noqa: E402

BELIEF, STATE, HIDDEN = 32, 8, 16
EMB = {"fusion": 40, "image": 40, "sound": 32, "other": 12}
ACT = {"cnn": "relu", "dense": "elu", "fusion": "relu"}
SHAPES = {"image_horizon": (3, 64, 64)}
T, B, A = 5, 2, 3


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="no reference checkout")
def test_unimodal_rollout_parity(rng):
    from utils.models.encoder import build_Encoder, bottle_tupele
    from utils.models.transition_model import TransitionModel

    torch.manual_seed(0)
    transition = TransitionModel(
        belief_size=BELIEF, state_size=STATE, action_size=A,
        hidden_size=HIDDEN, embedding_size=dict(EMB),
        activation_function="elu",
    )
    encoder = build_Encoder(
        name="image_horizon",
        observation_shapes={k: list(v) for k, v in SHAPES.items()},
        embedding_size=dict(EMB), activation_function=dict(ACT),
        normalization="BatchNorm",
    )
    transition.eval(); encoder.eval()

    model = WorldModel(
        observation_names_enc=("image_horizon",),
        observation_names_rec=("image_horizon",),
        observation_shapes=SHAPES, embedding_size=EMB,
        activation_function=ACT, belief_size=BELIEF, state_size=STATE,
        hidden_size=HIDDEN, action_size=A, normalization="BatchNorm",
        multimodal=False, remat=False,
    )
    # reference unimodal checkpoint schema: flat encoder / transition dicts
    # NOTE embedding_size for the unimodal obs head is embedding_size["fusion"]
    # (ref transition_model.py:32) and the encoder emits embedding_size["image"]
    # — equal in the shipped configs and here.
    model_dicts = {
        "transition_model": transition.get_state_dict(),
        "encoder": encoder.state_dict(),
        "observation_model": {},  # decoders unused in this test
        "reward_model": {},
    }

    state_size = STATE
    params = {}
    # build variables via importer pieces (decoder/reward omitted)
    cell = {}
    main = model_dicts["transition_model"]["main"]
    fc_s, fc_a = torch_import.split_dense(main, "fc_embed_state_action", state_size)
    cell["fc_sa_s"] = fc_s
    cell["rnn"] = torch_import.gru_cell(main, "rnn")
    cell["ssm_fc1"] = torch_import.dense(main, "stochastic_state_model.fc1")
    cell["ssm_fc2"] = torch_import.dense(main, "stochastic_state_model.fc2")
    obs_enc = model_dicts["transition_model"]["obs_encoder"]
    fc1_h, fc1_o = torch_import.split_dense(obs_enc, "fc1", BELIEF)
    cell["obs_fc1_h"] = fc1_h
    cell["obs_fc2"] = torch_import.dense(obs_enc, "fc2")
    core = {"cell": cell, "fc_sa_a": fc_a, "obs_proj_fused": fc1_o}
    enc_p, enc_s = torch_import.image_encoder(model_dicts["encoder"], 4, "BatchNorm")
    params = {"core": core, "encoder": {"image_horizon": enc_p}}
    stats = {"encoder": {"image_horizon": enc_s}}
    variables = {"params": params, "batch_stats": stats}

    obs_np = rng.normal(size=(T, B, 3, 64, 64)).astype(np.float32) * 0.3
    actions = rng.normal(size=(T, B, A)).astype(np.float32)
    with torch.no_grad():
        emb = bottle_tupele(encoder, {"image_horizon": torch.tensor(obs_np)})
        outs = transition(torch.zeros(B, STATE), torch.tensor(actions),
                          torch.zeros(B, BELIEF), emb, None, det=True)
    beliefs, _, prior_means, prior_stds, _, post_means, post_stds, _, _ = outs

    obs_hwc = {"image_horizon": jnp.asarray(obs_np.transpose(0, 1, 3, 4, 2))}
    states = model.apply(variables, obs_hwc, jnp.asarray(actions), None, None,
                         True, False, method=model.estimate_state)
    np.testing.assert_allclose(np.asarray(states["beliefs"]), beliefs.numpy(),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(states["posterior_means"]),
                               post_means.numpy(), rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(states["prior_std_devs"]),
                               prior_stds.numpy(), rtol=1e-4, atol=2e-4)


def test_unimodal_e2e_training(tiny_dataset_dir, tmp_path):
    """BASELINE config #1: image-only RSSM, tiny batch — loss decreases."""
    from multimodal_rssm_tpu.core.config import compose
    from multimodal_rssm_tpu.train.loop import run

    from tests.conftest import TINY_OVERRIDES

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = compose(cfg_dir, overrides=["rssm=unimodal", *TINY_OVERRIDES])
    cfg.main.experiment_name = "uni"
    cfg.train.train_data_path = tiny_dataset_dir
    cfg.train.validation_data_path = tiny_dataset_dir
    cfg.train.train_iteration = 5
    cfg.train.checkpoint_interval = 5
    cfg.train.validation_interval = 5

    state, results_dir = run(cfg, cwd=str(tmp_path))
    import json

    lines = [json.loads(l) for l in open(os.path.join(results_dir, "metrics.jsonl"))]
    losses = [l["loss/train"] for l in lines if "loss/train" in l]
    assert len(losses) == 5
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))
