"""JAX -> torch checkpoint export (io/torch_export.py).

Three guarantees, each against the actual reference implementation at
/root/reference (skipped if absent):

1. export is the exact inverse of import: a reference checkpoint
   round-tripped through import_world_model -> export_world_model is
   reproduced bit-for-bit (every tensor, every key).
2. a JAX-initialised (never-torch) model exports to a ``.pth`` that the
   reference's own modules load strictly (``_load_state_dict`` +
   ``model_optimizer`` validation, base/algo.py:311-316) and that then
   reproduces our deterministic rollout.
3. the unimodal flat algo-level schema (RSSM.get_state_dict = the whole
   algo nn.Module's state_dict, algos/MRSSM/RSSM/algo.py:48-49) both
   imports (nest_flat_unimodal) and exports.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)
torch = pytest.importorskip("torch")

if os.path.isdir(REFERENCE) and REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_rssm_tpu.io import torch_export, torch_import  # noqa: E402
from multimodal_rssm_tpu.models.world_model import WorldModel  # noqa: E402

BELIEF, STATE, HIDDEN = 32, 8, 16
EMB = {"fusion": 40, "image": 40, "sound": 32, "other": 12}
ACT = {"cnn": "relu", "dense": "elu", "fusion": "relu"}
SHAPES = {"image_horizon": (3, 64, 64), "sound": (128, 20)}
NAMES = ("image_horizon", "sound")
A = 3
T, B = 5, 2


def _torch_models(normalization="BatchNorm"):
    from utils.models.encoder import MultimodalEncoder
    from utils.models.observation_model import MultimodalObservationModel
    from utils.models.reward_model import RewardModel
    from utils.models.transition_model import MultimodalTransitionModel

    torch.manual_seed(0)
    device = torch.device("cpu")
    transition = MultimodalTransitionModel(
        belief_size=BELIEF, state_size=STATE, action_size=A,
        hidden_size=HIDDEN, observation_names_enc=list(NAMES),
        embedding_size=dict(EMB), activation_function="elu",
        device=device, fusion_method="PoE", expert_dist="q(st|ht,ot)",
    )
    encoder = MultimodalEncoder(
        observation_names_enc=list(NAMES),
        observation_shapes={k: list(v) for k, v in SHAPES.items()},
        embedding_size=dict(EMB), activation_function=dict(ACT),
        normalization=normalization, device=device,
    )
    observation_model = MultimodalObservationModel(
        observation_names_rec=list(NAMES),
        observation_shapes={k: list(v) for k, v in SHAPES.items()},
        embedding_size=dict(EMB), belief_size=BELIEF, state_size=STATE,
        hidden_size=HIDDEN, activation_function=dict(ACT),
        normalization=normalization, device=device,
    )
    reward = RewardModel(h_size=BELIEF, s_size=STATE, hidden_size=HIDDEN,
                         activation="elu")
    return transition, encoder, observation_model, reward


def _state_dicts(transition, encoder, observation_model, reward):
    return {
        "transition_model": transition.get_state_dict(),
        "observation_model": observation_model.get_state_dict(),
        "reward_model": reward.state_dict(),
        "encoder": encoder.get_state_dict(),
    }


def _jax_model(normalization="BatchNorm"):
    return WorldModel(
        observation_names_enc=NAMES, observation_names_rec=NAMES,
        observation_shapes=SHAPES, embedding_size=EMB,
        activation_function=ACT, belief_size=BELIEF, state_size=STATE,
        hidden_size=HIDDEN, action_size=A, normalization=normalization,
        multimodal=True, fusion_method="PoE", expert_dist="q(st|ht,ot)",
    )


def _assert_tree_equal(got, want, path=""):
    """Recursive bit-exact comparison of (possibly nested) state dicts."""
    if isinstance(want, dict):
        assert isinstance(got, dict), f"{path}: expected dict"
        assert set(got.keys()) == set(want.keys()), (
            f"{path}: keys differ: only-got={set(got) - set(want)}, "
            f"only-want={set(want) - set(got)}")
        for k in want:
            _assert_tree_equal(got[k], want[k], f"{path}.{k}")
        return
    g = np.asarray(got.detach().numpy() if hasattr(got, "detach") else got)
    w = np.asarray(want.detach().numpy() if hasattr(want, "detach") else want)
    assert g.shape == w.shape, f"{path}: shape {g.shape} != {w.shape}"
    assert np.array_equal(g, w), f"{path}: values differ"


@pytest.mark.parametrize("normalization", ["BatchNorm", None])
def test_multimodal_roundtrip_bitexact(normalization):
    """import -> export reproduces a reference checkpoint exactly."""
    sd = _state_dicts(*_torch_models(normalization))
    model = _jax_model(normalization)
    variables = torch_import.import_world_model(sd, model)
    out = torch_export.export_world_model(model, variables)
    _assert_tree_equal(out, sd)


def test_jax_initialised_model_exports_and_loads(tmp_path, rng):
    """A flax-initialised model (no torch provenance) saves a .pth the
    reference loads strictly — modules AND optimizer — and the loaded
    torch rollout matches our deterministic rollout."""
    model = _jax_model()
    obs_hwc = {
        "image_horizon": jnp.asarray(
            rng.normal(size=(T, B, 64, 64, 3)).astype(np.float32) * 0.3),
        "sound": jnp.asarray(
            rng.normal(size=(T, B, 128, 20)).astype(np.float32) * 0.3),
    }
    actions = rng.normal(size=(T, B, A)).astype(np.float32)
    key = jax.random.PRNGKey(7)
    variables = model.init(key, obs_hwc, jnp.asarray(actions), None, key,
                           train=False)

    path = str(tmp_path / "models_123.pth")
    torch_export.save_reference_checkpoint(path, model, variables)

    md = torch.load(path, map_location="cpu", weights_only=False)
    transition, encoder, obs_model, reward = _torch_models()
    # strict per-module loads — the reference's load_state_dict path
    # (base/algo.py:311-316)
    transition._load_state_dict(md["transition_model"])
    encoder._load_state_dict(md["encoder"])
    obs_model._load_state_dict(md["observation_model"])
    reward.load_state_dict(md["reward_model"])
    # the reference validates the optimizer entry against its param_list
    # before discarding it (quirk 6)
    param_list = (transition.get_model_params()
                  + obs_model.get_model_params()
                  + list(reward.parameters())
                  + encoder.get_model_params())
    torch.optim.Adam(param_list, lr=1e-3, eps=1e-7).load_state_dict(
        md["model_optimizer"])

    for m in (encoder, obs_model, reward):
        m.eval()
    transition._eval()

    from utils.models.encoder import bottle_tupele_multimodal

    obs_chw = {
        "image_horizon": torch.tensor(
            np.asarray(obs_hwc["image_horizon"]).transpose(0, 1, 4, 2, 3)),
        "sound": torch.tensor(np.asarray(obs_hwc["sound"])),
    }
    with torch.no_grad():
        emb = bottle_tupele_multimodal(encoder, obs_chw)
        outs = transition(torch.zeros(B, STATE), torch.tensor(actions),
                          torch.zeros(B, BELIEF), emb, None, det=True)
    beliefs, post_means = outs[0], outs[5]

    states = model.apply(variables, obs_hwc, jnp.asarray(actions), None,
                         None, True, False, method=model.estimate_state)
    np.testing.assert_allclose(np.asarray(states["beliefs"]),
                               beliefs.numpy(), rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(states["posterior_means"]),
                               post_means.numpy(), rtol=1e-4, atol=2e-4)


class _FlatAlgo(torch.nn.Module):
    """Mirror of the reference RSSM algo's module layout: RSSM_base assigns
    these exact attribute names (base/algo.py:17-28 via _init_models,
    RSSM/algo.py:17-38), and ``RSSM.get_state_dict`` is the whole module's
    flat ``state_dict()`` (RSSM/algo.py:48-49).  global_prior / free_nats /
    the GradScaler are not registered buffers, so they never appear."""

    def __init__(self, transition, encoder, observation_model, reward):
        super().__init__()
        self.transition_model = transition
        self.encoder = encoder
        self.observation_model = observation_model
        self.reward_model = reward


def _unimodal_torch():
    from utils.models.encoder import build_Encoder
    from utils.models.observation_model import build_ObservationModel
    from utils.models.reward_model import RewardModel
    from utils.models.transition_model import TransitionModel

    torch.manual_seed(0)
    shapes = {"image_horizon": list(SHAPES["image_horizon"])}
    transition = TransitionModel(
        belief_size=BELIEF, state_size=STATE, action_size=A,
        hidden_size=HIDDEN, embedding_size=dict(EMB),
        activation_function="elu",
    )
    encoder = build_Encoder(
        name="image_horizon", observation_shapes=shapes,
        embedding_size=dict(EMB), activation_function=dict(ACT),
        normalization="BatchNorm",
    )
    observation_model = build_ObservationModel(
        name="image_horizon", observation_shapes=shapes,
        embedding_size=dict(EMB), belief_size=BELIEF, state_size=STATE,
        hidden_size=HIDDEN, activation_function=dict(ACT),
        normalization="BatchNorm",
    )
    reward = RewardModel(h_size=BELIEF, s_size=STATE, hidden_size=HIDDEN,
                         activation="elu")
    return transition, encoder, observation_model, reward


def test_unimodal_flat_schema_roundtrip():
    """Real unimodal checkpoints are ONE flat dict (RSSM/algo.py:48-49);
    they must import (nest_flat_unimodal) and export back bit-exactly,
    and the export must strict-load into the reference module layout."""
    transition, encoder, observation_model, reward = _unimodal_torch()
    algo = _FlatAlgo(transition, encoder, observation_model, reward)
    flat_sd = algo.state_dict()

    model = WorldModel(
        observation_names_enc=("image_horizon",),
        observation_names_rec=("image_horizon",),
        observation_shapes=SHAPES, embedding_size=EMB,
        activation_function=ACT, belief_size=BELIEF, state_size=STATE,
        hidden_size=HIDDEN, action_size=A, normalization="BatchNorm",
        multimodal=False, remat=False,
    )
    variables = torch_import.import_world_model(flat_sd, model)
    out = torch_export.export_world_model(model, variables)
    _assert_tree_equal(out, {k: v for k, v in flat_sd.items()})

    algo2 = _FlatAlgo(*_unimodal_torch())
    algo2.load_state_dict(torch_export._to_torch(out))  # strict


@pytest.mark.parametrize("size,normalization", [
    (84, "BatchNorm"),          # 84px supports None/BatchNorm (ref :369-394)
    (128, "InstanceNorm"),      # track_running_stats=True (ref :451-467)
    (128, "GroupNorm"),         # num_groups=4 (ref :468-486)
    (256, "BatchNorm"),
    (256, "InstanceNorm"),      # only the 256 decoder has all 4 variants
])
def test_image_variant_import_export_parity(size, normalization, rng):
    """Large image codecs through the importer AND exporter: forward parity
    (eval mode, running stats where the variant tracks them) + bit-exact
    import->export roundtrip.  Covers the converter paths the 64px parity
    tests never touch (84's 'fc' decoder key, 5/6-conv walks, Instance/
    GroupNorm without/with stats)."""
    from utils.models.encoder import build_Encoder
    from utils.models.observation_model import build_ObservationModel

    from multimodal_rssm_tpu.models.decoders import build_observation_model
    from multimodal_rssm_tpu.models.encoders import build_encoder

    name = f"image_horizon_{size}"
    shapes = {name: (3, size, size)}
    emb = dict(EMB)

    torch.manual_seed(0)
    t_enc = build_Encoder(
        name=name, observation_shapes={name: list(shapes[name])},
        embedding_size=emb, activation_function=dict(ACT),
        normalization=normalization)
    # decoder norm support in the reference: 64/84/128 px only None/
    # BatchNorm; 256 px all four (observation_model.py:66-360)
    dec_supported = normalization in (None, "BatchNorm") or size == 256
    t_dec = (build_ObservationModel(
        name=name, observation_shapes={name: list(shapes[name])},
        embedding_size=emb, belief_size=BELIEF, state_size=STATE,
        hidden_size=HIDDEN, activation_function=dict(ACT),
        normalization=normalization) if dec_supported else None)
    t_enc.eval()

    enc_sd = t_enc.state_dict()
    enc_p, enc_s = torch_import.encoder_for_name(name, enc_sd, shapes,
                                                 normalization)
    # bit-exact exporter roundtrip
    _assert_tree_equal(
        torch_export.encoder_for_name(name, enc_p, enc_s, shapes,
                                      normalization), enc_sd)
    if t_dec is not None:
        t_dec.eval()
        dec_sd = t_dec.state_dict()
        dec_p, dec_s = torch_import.decoder_for_name(name, dec_sd, shapes,
                                                     normalization)
        _assert_tree_equal(
            torch_export.decoder_for_name(name, dec_p, dec_s, shapes,
                                          normalization), dec_sd)

    # forward parity (eval mode)
    j_enc = build_encoder(name, shapes, emb, ACT, normalization, jnp.float32)

    x = rng.normal(size=(4, 3, size, size)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref_emb = t_enc(torch.tensor(x)).numpy()
    variables = {"params": enc_p}
    if enc_s:
        variables["batch_stats"] = enc_s
    got_emb = j_enc.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                          False)
    np.testing.assert_allclose(np.asarray(got_emb), ref_emb,
                               rtol=1e-4, atol=2e-4)

    if t_dec is None:
        return
    j_dec = build_observation_model(
        name, shapes, belief_size=BELIEF, state_size=STATE,
        hidden_size=HIDDEN, embedding_size=emb, activation_function=ACT,
        normalization=normalization, dtype=jnp.float32)
    h = rng.normal(size=(2, 2, BELIEF)).astype(np.float32)
    s = rng.normal(size=(2, 2, STATE)).astype(np.float32)
    with torch.no_grad():
        ref_out = t_dec(torch.tensor(h), torch.tensor(s))["loc"].numpy()
    dvars = {"params": dec_p}
    if dec_s:
        dvars["batch_stats"] = dec_s
    got_out = j_dec.apply(dvars, jnp.asarray(h), jnp.asarray(s), False)
    np.testing.assert_allclose(
        np.asarray(got_out["loc"]).transpose(0, 1, 4, 2, 3), ref_out,
        rtol=1e-4, atol=2e-4)


@pytest.mark.slow
def test_crosscheck_torch_cli(tiny_dataset_dir, tmp_path):
    """The cross-framework validation CLI (cli/crosscheck_torch.py) at tiny
    scale: train 2 iters through the loop, then let the harness export the
    run, load it with the reference's own build_RSSM/load_model, and agree
    with our deterministic latents + imagined frames within its gates."""
    import json

    from multimodal_rssm_tpu.cli import crosscheck_torch as cc
    from multimodal_rssm_tpu.core.config import compose
    from multimodal_rssm_tpu.train.loop import run

    from tests.conftest import TINY_OVERRIDES

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = compose(cfg_dir, overrides=TINY_OVERRIDES)
    cfg.main.experiment_name = "crosscheck_cli"
    cfg.train.train_data_path = tiny_dataset_dir
    cfg.train.validation_data_path = tiny_dataset_dir
    cfg.train.train_iteration = 2
    cfg.train.checkpoint_interval = 2
    cfg.train.validation_interval = 2
    _, results_dir = run(cfg, cwd=str(tmp_path))

    rc = cc.main(["--run-dir", results_dir, "--itr", "2",
                  "--t-start", "5", "--horizon", "8", "--cwd", str(tmp_path)])
    assert rc == 0
    with open(os.path.join(results_dir, "analysis",
                           "crosscheck_torch.json")) as f:
        result = json.load(f)
    assert result["latent_max_abs_diff"]["posterior_means"] < 5e-3
    assert all(v < 1e-4 for v in
               result["imagination_cross_framework_mse"].values())


def test_crosscheck_torch_cli_unimodal(tiny_dataset_dir, tmp_path):
    """The crosscheck CLI on a unimodal run: the flat algo-level export
    loads through the reference's base ``load_model`` (strict
    ``load_state_dict``, base/algo.py:51-54) and the single-decoder
    ``observation_model`` output (``{'loc': ...}``, not a per-modality
    dict) is compared under its modality name."""
    import json

    from multimodal_rssm_tpu.cli import crosscheck_torch as cc
    from multimodal_rssm_tpu.core.config import compose
    from multimodal_rssm_tpu.train.loop import run

    from tests.conftest import TINY_OVERRIDES

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = compose(cfg_dir, overrides=["rssm=unimodal"] + TINY_OVERRIDES)
    cfg.main.experiment_name = "crosscheck_cli_uni"
    cfg.train.train_data_path = tiny_dataset_dir
    cfg.train.validation_data_path = tiny_dataset_dir
    cfg.train.train_iteration = 2
    cfg.train.checkpoint_interval = 2
    cfg.train.validation_interval = 2
    _, results_dir = run(cfg, cwd=str(tmp_path))

    rc = cc.main(["--run-dir", results_dir, "--itr", "2",
                  "--t-start", "5", "--horizon", "8", "--cwd", str(tmp_path)])
    assert rc == 0
    with open(os.path.join(results_dir, "analysis",
                           "crosscheck_torch.json")) as f:
        result = json.load(f)
    assert result["latent_max_abs_diff"]["posterior_means"] < 5e-3
    assert set(result["imagination_cross_framework_mse"]) == {"image_horizon"}
    assert all(v < 1e-4 for v in
               result["imagination_cross_framework_mse"].values())


@pytest.mark.slow
def test_export_torch_cli_roundtrip(tiny_dataset_dir, tmp_path, monkeypatch):
    """Full chain: train CLI path -> mrssm-export-torch -> .pth ->
    re-import == the native msgpack checkpoint, tensor for tensor."""
    from multimodal_rssm_tpu.cli import export_torch as et
    from multimodal_rssm_tpu.core.config import compose, load_run_config
    from multimodal_rssm_tpu.eval.state_estimation import load_model_variables
    from multimodal_rssm_tpu.train.loop import run

    from tests.conftest import TINY_OVERRIDES

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = compose(cfg_dir, overrides=TINY_OVERRIDES)
    cfg.main.experiment_name = "torch_export_cli"
    cfg.train.train_data_path = tiny_dataset_dir
    cfg.train.validation_data_path = tiny_dataset_dir
    cfg.train.train_iteration = 2
    cfg.train.checkpoint_interval = 2
    cfg.train.validation_interval = 2
    _, results_dir = run(cfg, cwd=str(tmp_path))

    monkeypatch.setattr(sys, "argv", ["export_torch", "--run-dir", results_dir])
    et.main()
    pth = os.path.join(results_dir, "torch_export", "models_2.pth")
    assert os.path.exists(pth)

    cfg2 = load_run_config(results_dir)
    model = WorldModel.from_config(cfg2)
    native = load_model_variables(
        model, cfg2, os.path.join(results_dir, "models_2.msgpack"))
    back = torch_import.load_reference_checkpoint(pth, model)

    n_paths = {jax.tree_util.keystr(p)
               for p, _ in jax.tree_util.tree_flatten_with_path(native)[0]}
    b_paths = {jax.tree_util.keystr(p)
               for p, _ in jax.tree_util.tree_flatten_with_path(back)[0]}
    assert n_paths == b_paths
    for (p, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(native)[0],
            jax.tree_util.tree_flatten_with_path(back)[0]):
        assert np.array_equal(np.asarray(a), np.asarray(b)), jax.tree_util.keystr(p)
