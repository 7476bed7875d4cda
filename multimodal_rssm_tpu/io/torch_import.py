"""PyTorch reference checkpoint -> framework variables converter.

Maps the reference's saved state-dict schema (algos/MRSSM/base/algo.py:
328-335 — ``{transition_model: {main, obs_encoder: {prior_expert, <mod>}},
observation_model: {<mod>}, reward_model, encoder: {<mod>},
model_optimizer}``) onto this framework's param/batch_stats trees, handling
every layout difference:

- Linear: torch [out, in] -> kernel [in, out];
- Conv2d: torch OIHW -> HWIO;
- ConvTranspose2d: torch (Cin, Cout, kh, kw) -> (kh, kw, Cin, Cout)
  (models/layers.py ConvTranspose stores the un-flipped kernel);
- Conv1d k=1 (sound up/down conversion): torch [out, in, 1] -> [in, out]
  Dense kernel;
- GRUCell: weight_ih/weight_hh [3H, in] -> wi/wh [in, 3H] (gate order r,z,n
  is identical between torch and models/layers.GRUCell);
- split Linears: the reference's ``fc_embed_state_action`` ([state, action]
  concat) and expert-head ``fc1`` ([belief, obs] concat) are stored split
  into their input blocks (the action/observation halves are hoisted out of
  the scan — rssm/core.py docstring);
- Batch/InstanceNorm: weight/bias -> scale/bias params; running_mean/var ->
  batch_stats.

The torch dependency is local to this module (CPU torch is only needed when
importing reference checkpoints or running parity tests).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        return x.detach().cpu().numpy()
    return np.asarray(x)


# -- leaf converters ------------------------------------------------------


def dense(sd: Mapping, prefix: str, use_bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if use_bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def conv2d(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def conv_transpose2d(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 0, 1)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def conv1d_1x1(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    """1x1 Conv1d == Dense over the channel axis."""
    w = _np(sd[f"{prefix}.weight"])[:, :, 0]  # [out, in]
    out = {"kernel": w.T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def conv1d_1x1_cols_hwc(sd: Mapping, prefix: str, C: int, H: int, W: int
                        ) -> Dict[str, np.ndarray]:
    """1x1 Conv1d whose output channels flatten a (C, H, W) feature map:
    permute the output columns from torch's (c, h, w) order to (h, w, c)
    so the consumer's NHWC reshape needs no activation transpose
    (models/decoders.SoundDecoderV2 up_conversion)."""
    w = _np(sd[f"{prefix}.weight"])[:, :, 0]          # [out = C*H*W, in]
    w = (w.reshape(C, H, W, -1).transpose(1, 2, 0, 3)  # rows -> (h, w, c)
          .reshape(C * H * W, -1))
    out = {"kernel": w.T}
    if f"{prefix}.bias" in sd:
        b = _np(sd[f"{prefix}.bias"])
        out["bias"] = b.reshape(C, H, W).transpose(1, 2, 0).reshape(-1)
    return out


def norm(sd: Mapping, prefix: str) -> Tuple[Dict, Optional[Dict]]:
    """(params, batch_stats) for Batch/Instance/GroupNorm."""
    params = {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
    }
    stats = None
    if f"{prefix}.running_mean" in sd:
        stats = {
            "mean": _np(sd[f"{prefix}.running_mean"]),
            "var": _np(sd[f"{prefix}.running_var"]),
        }
    return params, stats


def gru_cell(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "wi": _np(sd[f"{prefix}.weight_ih"]).T,
        "wh": _np(sd[f"{prefix}.weight_hh"]).T,
        "bi": _np(sd[f"{prefix}.bias_ih"]),
        "bh": _np(sd[f"{prefix}.bias_hh"]),
    }


def split_dense(
    sd: Mapping, prefix: str, first_width: int
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """A torch Linear over a concatenated input [a, b] -> two kernels
    ((a-half with bias), (b-half, no bias))."""
    w = _np(sd[f"{prefix}.weight"])  # [out, a+b]
    a = {"kernel": w[:, :first_width].T}
    if f"{prefix}.bias" in sd:
        a["bias"] = _np(sd[f"{prefix}.bias"])
    b = {"kernel": w[:, first_width:].T}
    return a, b


# -- conv-stack walkers ---------------------------------------------------


def _seq_indices(n_convs: int, has_norm: bool):
    """Torch Sequential indices of convs (and norms) in the reference's
    (Conv[, Norm], ReLU/GLU)* stacks."""
    step = 3 if has_norm else 2
    conv_idx = [i * step for i in range(n_convs)]
    norm_idx = [i * step + 1 for i in range(n_convs)] if has_norm else []
    return conv_idx, norm_idx


def image_encoder(
    sd: Mapping, n_convs: int, normalization: Optional[str]
) -> Tuple[Dict, Dict]:
    """Reference ImageEncoder* state_dict -> (params, batch_stats) for
    models/encoders._ConvStackEncoder."""
    has_norm = normalization not in (None, "None")
    conv_idx, norm_idx = _seq_indices(n_convs, has_norm)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i, ci in enumerate(conv_idx):
        params[f"conv{i}"] = conv2d(sd, f"conv.{ci}")
    for i, ni in enumerate(norm_idx):
        p, s = norm(sd, f"conv.{ni}")
        params[f"norm{i}"] = p
        if s is not None:
            stats[f"norm{i}"] = s
    if "fc.weight" in sd:
        params["fc"] = dense(sd, "fc")
    return params, stats


def image_decoder(
    sd: Mapping, n_deconvs: int, normalization: Optional[str], fc_key: str = "fc1"
) -> Tuple[Dict, Dict]:
    """Reference ImageDecoder* -> (params, batch_stats) for
    models/decoders._ImageDecoderBase.  Norm applies to all but the final
    deconv (ref observation_model.py:75-86)."""
    has_norm = normalization not in (None, "None")
    step = 3 if has_norm else 2
    params: Dict[str, Any] = {"fc1": dense(sd, fc_key)}
    stats: Dict[str, Any] = {}
    for i in range(n_deconvs):
        ci = i * step
        params[f"deconv{i}"] = conv_transpose2d(sd, f"conv.{ci}")
        if has_norm and i < n_deconvs - 1:
            p, s = norm(sd, f"conv.{ci + 1}")
            params[f"norm{i}"] = p
            if s is not None:
                stats[f"norm{i}"] = s
    return params, stats


def sound_encoder_v2(sd: Mapping) -> Tuple[Dict, Dict]:
    """Reference SoundEncoder_v2 -> models/encoders.SoundEncoderV2."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["down1_conv"] = conv2d(sd, "down_sample_1.0")
    for i in (2, 3, 4):
        params[f"down{i}_conv"] = conv2d(sd, f"down_sample_{i}.0")
        p, s = norm(sd, f"down_sample_{i}.1")
        params[f"down{i}_norm"] = p
        if s is not None:
            stats[f"down{i}_norm"] = s
    params["down_conversion"] = conv1d_1x1(sd, "down_conversion.0")
    p, _ = norm(sd, "down_conversion.1")  # InstanceNorm1d, no running stats
    params["down_conversion_norm"] = p
    return params, stats


def sound_decoder_v2(sd: Mapping) -> Tuple[Dict, Dict]:
    """Reference SoundDecoder_v2 -> models/decoders.SoundDecoderV2."""
    params: Dict[str, Any] = {"up_conversion": conv1d_1x1_cols_hwc(
        sd, "up_conversion", C=256, H=32, W=4)}
    stats: Dict[str, Any] = {}
    for i in (0, 1, 2):
        params[f"up{i}_deconv"] = conv_transpose2d(sd, f"up_sample_{i}.0")
        p, s = norm(sd, f"up_sample_{i}.1")
        params[f"up{i}_norm"] = p
        if s is not None:
            stats[f"up{i}_norm"] = s
    params["out"] = conv2d(sd, "out")
    return params, stats


def symbolic_encoder(sd: Mapping) -> Tuple[Dict, Dict]:
    return {k: dense(sd, k) for k in ("fc1", "fc2", "fc3")}, {}


def dense_decoder(sd: Mapping) -> Tuple[Dict, Dict]:
    return {k: dense(sd, k) for k in ("fc1", "fc2", "fc3")}, {}


def mlp_head(sd: Mapping, keys: Sequence[str] = ("fc1", "fc2")) -> Dict:
    return {k: dense(sd, k) for k in keys}


_IMAGE_ENC_CONVS = {64: 4, 84: 4, 128: 5, 256: 6}
_IMAGE_DEC_CONVS = {64: 4, 84: 5, 128: 5, 256: 6}


def encoder_for_name(
    name: str, sd: Mapping, observation_shapes, normalization
) -> Tuple[Dict, Dict]:
    if "image" in name:
        hw = observation_shapes[name][1]
        return image_encoder(sd, _IMAGE_ENC_CONVS[hw], normalization)
    if "sound" in name:
        return sound_encoder_v2(sd)
    return symbolic_encoder(sd)


def decoder_for_name(
    name: str, sd: Mapping, observation_shapes, normalization
) -> Tuple[Dict, Dict]:
    if "image" in name:
        hw = observation_shapes[name][1]
        fc_key = "fc" if hw == 84 else "fc1"
        return image_decoder(sd, _IMAGE_DEC_CONVS[hw], normalization, fc_key)
    if "sound" in name:
        return sound_decoder_v2(sd)
    if name == "draw_target":
        return {k: dense(sd, k) for k in ("fc1", "fc2", "fc3")}, {}
    return dense_decoder(sd)


# -- full model -----------------------------------------------------------


def _strip_prefix(sd: Mapping, prefix: str) -> Dict[str, Any]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def nest_flat_unimodal(model_dicts: Mapping) -> Dict[str, Any]:
    """The unimodal reference saves the *algo module's* flat
    ``state_dict()`` (``RSSM.get_state_dict`` = ``self.state_dict()``,
    algos/MRSSM/RSSM/algo.py:48-49) — keys like
    ``transition_model.fc_embed_state_action.weight`` — not the nested
    per-module schema the multimodal algos save.  Restructure it into the
    nested shape import_world_model walks."""
    main = _strip_prefix(model_dicts, "transition_model.")
    return {
        "transition_model": {
            "main": main,
            # the unimodal TransitionModel registers its ObsEncoder as a
            # submodule, so the nested view aliases the same tensors
            "obs_encoder": _strip_prefix(main, "obs_encoder."),
        },
        "encoder": _strip_prefix(model_dicts, "encoder."),
        "observation_model": _strip_prefix(model_dicts, "observation_model."),
        "reward_model": _strip_prefix(model_dicts, "reward_model."),
    }


def import_world_model(model_dicts: Mapping, model) -> Dict[str, Any]:
    """Reference full checkpoint -> ``{"params": ..., "batch_stats": ...}``
    for models/world_model.WorldModel.

    ``model_dicts`` is the object torch.load returns for a reference
    ``models_{itr}.pth``; ``model`` is the (un-initialised) WorldModel whose
    static config determines the expected tree.
    """
    if getattr(model, "latent_dist", "gaussian") != "gaussian":
        raise ValueError(
            "reference checkpoints are Gaussian-latent only "
            "(utils/models/encoder.py:126-155); cannot import into a "
            f"latent_dist={model.latent_dist!r} model")
    if "transition_model" not in model_dicts:
        # flat unimodal algo-level schema (see nest_flat_unimodal)
        model_dicts = nest_flat_unimodal(model_dicts)

    state_size = model.state_size
    belief_size = model.belief_size
    shapes = model.observation_shapes
    normalization = model.normalization

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    # --- transition model -> core -----------------------------------
    tm = model_dicts["transition_model"]
    main = tm["main"]
    cell: Dict[str, Any] = {}
    fc_s, fc_a = split_dense(main, "fc_embed_state_action", state_size)
    cell["fc_sa_s"] = fc_s
    cell["rnn"] = gru_cell(main, "rnn")
    ssm = mlp_head(main, ("stochastic_state_model.fc1", "stochastic_state_model.fc2"))
    cell["ssm_fc1"] = ssm["stochastic_state_model.fc1"]
    cell["ssm_fc2"] = ssm["stochastic_state_model.fc2"]

    core: Dict[str, Any] = {"cell": cell, "fc_sa_a": fc_a}

    obs_enc = tm["obs_encoder"]
    if model.multimodal:
        pe = obs_enc["prior_expert"]
        cell["prior_expert_fc1"] = dense(pe, "fc1")
        cell["prior_expert_fc2"] = dense(pe, "fc2")
        for name in model.observation_names_enc:
            if model.expert_dist != "q(st|ht,ot)":
                continue
            esd = obs_enc[name]
            fc1_h, fc1_o = split_dense(esd, "fc1", belief_size)
            cell[f"obs_{name}_fc1_h"] = fc1_h
            cell[f"obs_{name}_fc2"] = dense(esd, "fc2")
            core[f"obs_proj_{name}"] = fc1_o
    else:
        # unimodal: obs_encoder is a flat {fc1, fc2} state dict
        # (ref transition_model.py:118 nests it under "obs_encoder")
        fc1_h, fc1_o = split_dense(obs_enc, "fc1", belief_size)
        cell["obs_fc1_h"] = fc1_h
        cell["obs_fc2"] = dense(obs_enc, "fc2")
        core["obs_proj_fused"] = fc1_o
    params["core"] = core

    # --- encoder(s) ---------------------------------------------------
    enc_sd = model_dicts["encoder"]
    enc_params: Dict[str, Any] = {}
    enc_stats: Dict[str, Any] = {}
    enc_names = (
        model.observation_names_enc if model.multimodal
        else (model.observation_names_enc[0],)
    )
    for name in enc_names:
        sd = enc_sd[name] if name in enc_sd else enc_sd  # unimodal: flat
        p, s = encoder_for_name(name, sd, shapes, normalization)
        enc_params[name] = p
        if s:
            enc_stats[name] = s
    params["encoder"] = enc_params
    if enc_stats:
        stats["encoder"] = enc_stats

    # --- decoders -----------------------------------------------------
    dec_sd = model_dicts["observation_model"]
    dec_params: Dict[str, Any] = {}
    dec_stats: Dict[str, Any] = {}
    rec_names = (
        model.observation_names_rec if model.multimodal
        else (model.observation_names_rec[0],)
    )
    for name in rec_names:
        sd = dec_sd[name] if name in dec_sd else dec_sd
        p, s = decoder_for_name(name, sd, shapes, normalization)
        dec_params[f"models_{name}"] = p
        if s:
            dec_stats[f"models_{name}"] = s
    params["observation_model"] = dec_params
    if dec_stats:
        stats["observation_model"] = dec_stats

    # --- reward -------------------------------------------------------
    params["reward_model"] = {
        k: dense(model_dicts["reward_model"], k) for k in ("fc1", "fc2", "fc3")
    }

    return {"params": params, "batch_stats": stats}


def load_reference_checkpoint(path: str, model) -> Dict[str, Any]:
    """torch.load a reference ``models_{itr}.pth`` and convert."""
    import torch

    model_dicts = torch.load(path, map_location="cpu", weights_only=False)
    return import_world_model(model_dicts, model)
