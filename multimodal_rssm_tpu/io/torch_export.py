"""Framework variables -> PyTorch reference checkpoint converter.

The exact inverse of io/torch_import.py: walks a WorldModel's
``{"params", "batch_stats"}`` trees and emits the reference's saved
state-dict schema, so a TPU-trained model can be loaded back into the
reference's torch tooling (check_model.ipynb, estimate_state.py,
``train.model_path`` warm starts).

Schemas (both verified against the reference's own save/load code):

- multimodal (``MRSSM_base.get_state_dict``, algos/MRSSM/base/algo.py:
  328-335): ``{transition_model: {main, obs_encoder: {prior_expert,
  <mod>...}}, observation_model: {<mod>...}, reward_model,
  encoder: {<mod>...}, model_optimizer}``.  ``model_optimizer`` is a
  *fresh* Adam state dict over the same parameter count — the reference
  discards loaded optimizer state anyway (``load_model`` calls
  ``_init_optimizer`` right after, base/algo.py:51-54, SURVEY quirk 6),
  but its ``load_state_dict`` validates group/param counts first, so the
  key must be present and well-formed.
- unimodal (``RSSM.get_state_dict`` = the algo nn.Module's flat
  ``state_dict()``, algos/MRSSM/RSSM/algo.py:48-49): one flat dict with
  ``transition_model.`` / ``encoder.`` / ``observation_model.`` /
  ``reward_model.`` key prefixes and no optimizer entry.

Layout inversions mirror the importer leaf-for-leaf (Linear [in,out]->
[out,in], Conv HWIO->OIHW, ConvTranspose (kh,kw,Cin,Cout)->(Cin,Cout,
kh,kw), 1x1 Conv1d Dense->[out,in,1], GRU [in,3H]->[3H,in], split
Linears re-concatenated over their input blocks).  ``num_batches_tracked``
buffers are emitted as 0 — the importer drops them, and torch only reads
them under ``momentum=None``, which the reference never uses.

Like the importer, the torch dependency is local to the save function;
``export_world_model`` itself returns numpy and needs no torch.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x)


# -- leaf converters (inverses of torch_import's) --------------------------


def dense(p: Mapping) -> Dict[str, np.ndarray]:
    out = {"weight": _np(p["kernel"]).T}
    if "bias" in p:
        out["bias"] = _np(p["bias"])
    return out


def conv2d(p: Mapping) -> Dict[str, np.ndarray]:
    out = {"weight": _np(p["kernel"]).transpose(3, 2, 0, 1)}  # HWIO -> OIHW
    if "bias" in p:
        out["bias"] = _np(p["bias"])
    return out


def conv_transpose2d(p: Mapping) -> Dict[str, np.ndarray]:
    # (kh, kw, Cin, Cout) -> (Cin, Cout, kh, kw)
    out = {"weight": _np(p["kernel"]).transpose(2, 3, 0, 1)}
    if "bias" in p:
        out["bias"] = _np(p["bias"])
    return out


def conv1d_1x1(p: Mapping) -> Dict[str, np.ndarray]:
    out = {"weight": _np(p["kernel"]).T[:, :, None]}  # [in,out] -> [out,in,1]
    if "bias" in p:
        out["bias"] = _np(p["bias"])
    return out


def conv1d_1x1_cols_hwc(p: Mapping, C: int, H: int, W: int
                        ) -> Dict[str, np.ndarray]:
    """Inverse of torch_import.conv1d_1x1_cols_hwc: the framework stores the
    output columns in (h, w, c) order; torch wants (c, h, w) rows."""
    w = _np(p["kernel"]).T                               # [out_hwc, in]
    w = (w.reshape(H, W, C, -1).transpose(2, 0, 1, 3)    # rows -> (c, h, w)
          .reshape(C * H * W, -1))
    out = {"weight": w[:, :, None]}
    if "bias" in p:
        b = _np(p["bias"])
        out["bias"] = b.reshape(H, W, C).transpose(2, 0, 1).reshape(-1)
    return out


def norm(p: Mapping, stats: Optional[Mapping]) -> Dict[str, np.ndarray]:
    out = {"weight": _np(p["scale"]), "bias": _np(p["bias"])}
    if stats is not None:
        out["running_mean"] = _np(stats["mean"])
        out["running_var"] = _np(stats["var"])
        out["num_batches_tracked"] = np.asarray(0, dtype=np.int64)
    return out


def gru_cell(p: Mapping) -> Dict[str, np.ndarray]:
    return {
        "weight_ih": _np(p["wi"]).T,
        "weight_hh": _np(p["wh"]).T,
        "bias_ih": _np(p["bi"]),
        "bias_hh": _np(p["bh"]),
    }


def join_dense(a: Mapping, b: Mapping) -> Dict[str, np.ndarray]:
    """Inverse of torch_import.split_dense: re-concatenate the two input
    blocks of a torch Linear over [a, b]."""
    w = np.concatenate([_np(a["kernel"]), _np(b["kernel"])], axis=0).T
    out = {"weight": w}
    if "bias" in a:
        out["bias"] = _np(a["bias"])
    return out


# -- module walkers ---------------------------------------------------------


def _emit(into: Dict, prefix: str, leaf: Mapping) -> None:
    for k, v in leaf.items():
        into[f"{prefix}.{k}"] = v


def _seq_indices(n_convs: int, has_norm: bool):
    step = 3 if has_norm else 2
    conv_idx = [i * step for i in range(n_convs)]
    norm_idx = [i * step + 1 for i in range(n_convs)] if has_norm else []
    return conv_idx, norm_idx


def image_encoder(params: Mapping, stats: Mapping, n_convs: int,
                  normalization) -> Dict[str, np.ndarray]:
    has_norm = normalization not in (None, "None")
    conv_idx, norm_idx = _seq_indices(n_convs, has_norm)
    sd: Dict[str, np.ndarray] = {}
    for i, ci in enumerate(conv_idx):
        _emit(sd, f"conv.{ci}", conv2d(params[f"conv{i}"]))
    for i, ni in enumerate(norm_idx):
        _emit(sd, f"conv.{ni}", norm(params[f"norm{i}"], stats.get(f"norm{i}")))
    if "fc" in params:
        _emit(sd, "fc", dense(params["fc"]))
    return sd


def image_decoder(params: Mapping, stats: Mapping, n_deconvs: int,
                  normalization, fc_key: str = "fc1") -> Dict[str, np.ndarray]:
    has_norm = normalization not in (None, "None")
    step = 3 if has_norm else 2
    sd: Dict[str, np.ndarray] = {}
    _emit(sd, fc_key, dense(params["fc1"]))
    for i in range(n_deconvs):
        ci = i * step
        _emit(sd, f"conv.{ci}", conv_transpose2d(params[f"deconv{i}"]))
        if has_norm and i < n_deconvs - 1:
            _emit(sd, f"conv.{ci + 1}",
                  norm(params[f"norm{i}"], stats.get(f"norm{i}")))
    return sd


def sound_encoder_v2(params: Mapping, stats: Mapping) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    _emit(sd, "down_sample_1.0", conv2d(params["down1_conv"]))
    for i in (2, 3, 4):
        _emit(sd, f"down_sample_{i}.0", conv2d(params[f"down{i}_conv"]))
        _emit(sd, f"down_sample_{i}.1",
              norm(params[f"down{i}_norm"], stats.get(f"down{i}_norm")))
    _emit(sd, "down_conversion.0", conv1d_1x1(params["down_conversion"]))
    _emit(sd, "down_conversion.1", norm(params["down_conversion_norm"], None))
    return sd


def sound_decoder_v2(params: Mapping, stats: Mapping) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    _emit(sd, "up_conversion",
          conv1d_1x1_cols_hwc(params["up_conversion"], C=256, H=32, W=4))
    for i in (0, 1, 2):
        _emit(sd, f"up_sample_{i}.0", conv_transpose2d(params[f"up{i}_deconv"]))
        _emit(sd, f"up_sample_{i}.1",
              norm(params[f"up{i}_norm"], stats.get(f"up{i}_norm")))
    _emit(sd, "out", conv2d(params["out"]))
    return sd


def mlp(params: Mapping, keys=("fc1", "fc2", "fc3")) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    for k in keys:
        _emit(sd, k, dense(params[k]))
    return sd


_IMAGE_ENC_CONVS = {64: 4, 84: 4, 128: 5, 256: 6}
_IMAGE_DEC_CONVS = {64: 4, 84: 5, 128: 5, 256: 6}


def encoder_for_name(name: str, params: Mapping, stats: Mapping,
                     observation_shapes, normalization) -> Dict:
    if "image" in name:
        hw = observation_shapes[name][1]
        return image_encoder(params, stats, _IMAGE_ENC_CONVS[hw], normalization)
    if "sound" in name:
        return sound_encoder_v2(params, stats)
    return mlp(params)


def decoder_for_name(name: str, params: Mapping, stats: Mapping,
                     observation_shapes, normalization) -> Dict:
    if "image" in name:
        hw = observation_shapes[name][1]
        fc_key = "fc" if hw == 84 else "fc1"
        return image_decoder(params, stats, _IMAGE_DEC_CONVS[hw],
                             normalization, fc_key)
    if "sound" in name:
        return sound_decoder_v2(params, stats)
    return mlp(params)  # draw_target and dense decoders share fc1..fc3


# -- full model -------------------------------------------------------------

_BUFFER_SUFFIXES = ("running_mean", "running_var", "num_batches_tracked")


def _count_params(sd: Mapping) -> int:
    """Number of *parameter* tensors in a torch-style state dict (buffers
    excluded) — what ``list(module.parameters())`` would count."""
    return sum(1 for k in sd if not k.endswith(_BUFFER_SUFFIXES))


def _transition_main(params: Mapping) -> Dict[str, np.ndarray]:
    core = params["core"]
    cell = core["cell"]
    sd: Dict[str, np.ndarray] = {}
    _emit(sd, "fc_embed_state_action",
          join_dense(cell["fc_sa_s"], core["fc_sa_a"]))
    _emit(sd, "rnn", gru_cell(cell["rnn"]))
    _emit(sd, "stochastic_state_model.fc1", dense(cell["ssm_fc1"]))
    _emit(sd, "stochastic_state_model.fc2", dense(cell["ssm_fc2"]))
    return sd


def export_world_model(model, variables: Mapping) -> Dict[str, Any]:
    """WorldModel ``{"params", "batch_stats"}`` -> reference ``model_dicts``
    (numpy leaves; see module docstring for the two schemas).

    Exact inverse of torch_import.import_world_model — round-tripping a
    reference checkpoint through import then export reproduces it
    bit-for-bit (tests/test_torch_export.py).
    """
    if getattr(model, "latent_dist", "gaussian") != "gaussian":
        raise ValueError(
            "the reference state-dict schema is Gaussian-latent only; "
            f"cannot export a latent_dist={model.latent_dist!r} model")
    params = variables["params"]
    stats_root = variables.get("batch_stats", {}) or {}
    shapes = model.observation_shapes
    normalization = model.normalization

    if model.multimodal and model.expert_dist != "q(st|ht,ot)":
        raise NotImplementedError(
            "torch export (like torch import) covers the reference's shipped "
            "expert_dist 'q(st|ht,ot)'; 'q(st|ot)' checkpoints use the "
            "MultimodalStochasticEncoder schema, which has no torch-side "
            "converter yet")

    core = params["core"]
    cell = core["cell"]

    enc_stats = stats_root.get("encoder", {})
    dec_stats = stats_root.get("observation_model", {})

    if not model.multimodal:
        # Flat algo-level nn.Module schema (RSSM/algo.py:48-49): the
        # unimodal TransitionModel registers its fused-obs ObsEncoder as a
        # submodule, so its tensors appear under transition_model.obs_encoder.
        name_enc = model.observation_names_enc[0]
        name_rec = model.observation_names_rec[0]
        flat: Dict[str, np.ndarray] = {}
        for k, v in _transition_main(params).items():
            flat[f"transition_model.{k}"] = v
        _emit(flat, "transition_model.obs_encoder.fc1",
              join_dense(cell["obs_fc1_h"], core["obs_proj_fused"]))
        _emit(flat, "transition_model.obs_encoder.fc2", dense(cell["obs_fc2"]))
        for k, v in encoder_for_name(
                name_enc, params["encoder"][name_enc],
                enc_stats.get(name_enc, {}), shapes, normalization).items():
            flat[f"encoder.{k}"] = v
        dkey = f"models_{name_rec}"
        for k, v in decoder_for_name(
                name_rec, params["observation_model"][dkey],
                dec_stats.get(dkey, {}), shapes, normalization).items():
            flat[f"observation_model.{k}"] = v
        for k, v in mlp(params["reward_model"]).items():
            flat[f"reward_model.{k}"] = v
        return flat

    # --- multimodal nested schema ---------------------------------------
    main = _transition_main(params)
    obs_encoder: Dict[str, Dict] = {"prior_expert": {}}
    _emit(obs_encoder["prior_expert"], "fc1", dense(cell["prior_expert_fc1"]))
    _emit(obs_encoder["prior_expert"], "fc2", dense(cell["prior_expert_fc2"]))
    for name in model.observation_names_enc:
        esd: Dict[str, np.ndarray] = {}
        _emit(esd, "fc1",
              join_dense(cell[f"obs_{name}_fc1_h"], core[f"obs_proj_{name}"]))
        _emit(esd, "fc2", dense(cell[f"obs_{name}_fc2"]))
        obs_encoder[name] = esd

    encoder_sd = {
        name: encoder_for_name(name, params["encoder"][name],
                               enc_stats.get(name, {}), shapes, normalization)
        for name in model.observation_names_enc
    }
    observation_sd = {
        name: decoder_for_name(name, params["observation_model"][f"models_{name}"],
                               dec_stats.get(f"models_{name}", {}), shapes,
                               normalization)
        for name in model.observation_names_rec
    }

    return {
        "transition_model": {"main": main, "obs_encoder": obs_encoder},
        "observation_model": observation_sd,
        "reward_model": mlp(params["reward_model"]),
        "encoder": encoder_sd,
    }


def count_reference_params(model_dicts: Mapping) -> int:
    """Parameter-tensor count of the reference's Adam ``param_list``
    (base/algo.py:313-322): transition (main + nested obs_encoder) +
    observation_model + reward + encoder, buffers excluded."""
    tm = model_dicts["transition_model"]
    n = _count_params(tm["main"])
    for sub in tm["obs_encoder"].values():
        n += _count_params(sub)
    for sub in model_dicts["observation_model"].values():
        n += _count_params(sub)
    n += _count_params(model_dicts["reward_model"])
    for sub in model_dicts["encoder"].values():
        n += _count_params(sub)
    return n


def fresh_optimizer_state(n_params: int, lr: float, eps: float) -> Dict:
    """A fresh torch Adam state dict over ``n_params`` parameters — the
    shape the reference's ``model_optimizer.load_state_dict`` validates
    (group count + per-group param counts) before ``_init_optimizer``
    replaces it (base/algo.py:51-54)."""
    import torch

    dummies = [torch.nn.Parameter(torch.zeros(1)) for _ in range(n_params)]
    return torch.optim.Adam(dummies, lr=lr, eps=eps).state_dict()


def _to_torch(tree):
    import torch

    if isinstance(tree, Mapping):
        return {k: _to_torch(v) for k, v in tree.items()}
    # copy=True: jax array views are read-only, which torch tensors reject
    return torch.from_numpy(np.array(tree, copy=True))


def save_reference_checkpoint(path: str, model, variables: Mapping,
                              lr: float = 1e-3, eps: float = 1e-7) -> None:
    """Write a ``models_{itr}.pth`` the reference's ``load_model`` accepts.

    Multimodal checkpoints get a fresh ``model_optimizer`` entry sized to
    the reference's param_list (see fresh_optimizer_state); unimodal ones
    are the flat schema with no optimizer key.  ``lr``/``eps`` should come
    from the run config (``rssm.model_learning_rate`` / ``adam_epsilon``;
    pass lr=0 when ``learning_rate_schedule != 0`` to mirror the
    reference's constructor, base/algo.py:40-42).
    """
    import torch

    model_dicts = _to_torch(export_world_model(model, variables))
    if model.multimodal:
        n = count_reference_params(model_dicts)
        model_dicts["model_optimizer"] = fresh_optimizer_state(n, lr, eps)
    torch.save(model_dicts, path)
