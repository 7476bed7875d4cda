"""Observation decoders p(o_t | h_t, s_t).

Re-implements every decoder of the reference
(utils/models/observation_model.py) as flax linen modules over NHWC:

- ``DenseDecoder``                                   (ref :33-54)
- ``ImageDecoder64/84/128/256`` ConvTranspose stacks (ref :58-378)
- ``SoundDecoder`` GLU+BatchNorm ConvT stack         (ref :380-416)
- ``SoundDecoderV2`` 1x1 up-conversion + GLU up-sampling (ref :420-472)
- ``Discriminator`` logits head for label modalities (ref :474-513)
- factory ``build_observation_model``                (ref :515-533)
- ``MultimodalObservationModel`` dict-of-decoders with per-modality
  log_prob / mse                                     (ref :537-612)

All decoders consume stacked time-major [T, B, ·] beliefs/states, fold
(T, B) into one large batch for the MXU, and unfold afterwards (the
reference does the same reshape inside every forward).  Image outputs are
[T, B, H, W, C].
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_rssm_tpu.models.layers import (
    BatchNorm,
    Conv,
    ConvTranspose,
    Dense,
    InstanceNorm,
    act_fn,
    fold_tb,
    glu,
    tag_conv_out,
    unfold_tb,
)
from multimodal_rssm_tpu.ops import gaussian

Dtype = Any


def _maybe_remat(cls, remat):
    """nn.remat a decoder class (``train`` is static arg index 3 of the
    lifted (h, s, train) __call__) — backward recomputes the ConvTranspose
    stacks instead of storing their activations; the sound decoder's
    intermediates alone are several GB at reference batch sizes.

    ``remat == "conv"``: keep the tagged conv/matmul outputs, recompute only
    the norm/GLU/activation tail (see encoders._maybe_remat)."""
    if not remat:
        return cls
    policy = None
    if remat == "conv":
        import jax

        policy = jax.checkpoint_policies.save_only_these_names("conv_out")
    return nn.remat(cls, static_argnums=(3,), policy=policy)


def _fold(h: jnp.ndarray, s: jnp.ndarray) -> Tuple[jnp.ndarray, int, int]:
    T, B = h.shape[:2]
    x = jnp.concatenate([fold_tb(h).reshape(T * B, -1),
                         fold_tb(s).reshape(T * B, -1)], axis=-1)
    return x, T, B


def _fold_sh(h: jnp.ndarray, s: jnp.ndarray) -> Tuple[jnp.ndarray, int, int]:
    """[state, belief] concat order.

    Reference quirk replicated for weight-compatibility: the sound decoders'
    ``forward(self, s_t, h_t)`` signature is called positionally as
    ``model(h_t, s_t)`` (observation_model.py:404,456 vs :564), so their
    effective input is cat([state, belief]) — opposite to every other head.
    """
    T, B = h.shape[:2]
    x = jnp.concatenate([fold_tb(s).reshape(T * B, -1),
                         fold_tb(h).reshape(T * B, -1)], axis=-1)
    return x, T, B


def _apply_norm(normalization, x, train, dtype, name):
    if normalization in (None, "None"):
        return x
    if normalization == "BatchNorm":
        return BatchNorm(use_running_average=not train, dtype=dtype, name=name)(x)
    if normalization == "InstanceNorm":
        return InstanceNorm(use_running_average=not train, dtype=dtype, name=name)(x)
    if normalization == "GroupNorm":
        return nn.GroupNorm(num_groups=4, epsilon=1e-5, dtype=dtype, name=name)(x)
    raise NotImplementedError(f"normalization {normalization!r}")


class DecoderBase(nn.Module):
    """Gaussian-likelihood helpers shared by all decoders (ref :9-31)."""

    def get_log_prob(self, h, s, o, train: bool = True):
        out = self(h, s, train)
        return gaussian.log_prob(out["loc"], jnp.asarray(out["scale"], jnp.float32), o)

    def get_mse(self, h, s, o, train: bool = True):
        out = self(h, s, train)
        return jnp.square(out["loc"] - o)


class DenseDecoder(DecoderBase):
    """3-layer MLP decoder for low-dimensional modalities (ref :33-54)."""

    observation_size: int = 1
    embedding_size: int = 128
    activation_function: str = "elu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h, s, train: bool = True) -> Dict[str, jnp.ndarray]:
        act = act_fn(self.activation_function)
        x, T, B = _fold(h, s)
        x = x.astype(self.dtype)
        x = act(Dense(self.embedding_size, dtype=self.dtype, name="fc1")(x))
        x = act(Dense(self.embedding_size, dtype=self.dtype, name="fc2")(x))
        x = Dense(self.observation_size, dtype=self.dtype, name="fc3")(x)
        x = unfold_tb(x.astype(jnp.float32), T, B).reshape(
            T, B, self.observation_size)
        return {"loc": x, "scale": 1.0}


class _ImageDecoderBase(DecoderBase):
    """Shared ConvTranspose-stack image decoder.

    ``layer_defs``: (features, kernel, stride) per ConvT (torch padding 0);
    with a normalization configured every ConvT except the last drops its
    bias and is followed by the norm (ref :75-86 etc.).  The first fc has no
    nonlinearity (ref :99-100) and feeds a 1x1 spatial seed.
    """

    layer_defs: Tuple[Tuple[int, int, int], ...] = ()
    embedding_size: int = 1024
    activation_function: str = "relu"
    image_dim: int = 3
    normalization: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h, s, train: bool = True) -> Dict[str, jnp.ndarray]:
        x, T, B = _fold(h, s)
        x = Dense(self.embedding_size, dtype=self.dtype, name="fc1")(x.astype(self.dtype))
        x = x.reshape(T * B, 1, 1, self.embedding_size)
        n = len(self.layer_defs)
        use_norm = self.normalization not in (None, "None")
        for i, (features, kernel, stride) in enumerate(self.layer_defs):
            last = i == n - 1
            x = ConvTranspose(
                features if not last else self.image_dim,
                (kernel, kernel),
                strides=(stride, stride),
                padding=(0, 0),
                use_bias=(not use_norm) or last,
                dtype=self.dtype,
                name=f"deconv{i}",
            )(x)
            if not last:
                x = _apply_norm(self.normalization, x, train, self.dtype, f"norm{i}")
                x = nn.relu(x)
        x = x.astype(jnp.float32)
        x = unfold_tb(x, T, B)
        return {"loc": x, "scale": 1.0}


class ImageDecoder64(_ImageDecoderBase):
    """64px decoder (ref :58-105): k5/k5/k6/k6 s2 from a 1x1 seed."""

    layer_defs: Tuple[Tuple[int, int, int], ...] = (
        (128, 5, 2),
        (64, 5, 2),
        (32, 6, 2),
        (0, 6, 2),  # final features replaced by image_dim
    )


class ImageDecoder84(_ImageDecoderBase):
    """84px decoder (ref :108-160)."""

    layer_defs: Tuple[Tuple[int, int, int], ...] = (
        (128, 3, 2),
        (64, 4, 2),
        (32, 4, 2),
        (16, 6, 2),
        (0, 6, 2),
    )


class ImageDecoder128(_ImageDecoderBase):
    """128px decoder, channel scale 2 (ref :162-229)."""

    layer_defs: Tuple[Tuple[int, int, int], ...] = (
        (256, 6, 2),
        (128, 4, 2),
        (64, 4, 2),
        (32, 4, 2),
        (0, 6, 2),
    )


class ImageDecoder256(_ImageDecoderBase):
    """256px decoder, channel scale 2 (ref :231-378)."""

    layer_defs: Tuple[Tuple[int, int, int], ...] = (
        (256, 6, 2),
        (128, 4, 2),
        (64, 4, 2),
        (32, 4, 2),
        (16, 4, 2),
        (0, 6, 2),
    )


class SoundDecoder(DecoderBase):
    """GLU+BatchNorm ConvTranspose sound decoder (ref :380-416).

    fc: Linear -> tanh -> Linear to 250, seeded as a (C=5, H=10, W=5) map;
    ConvT stack back up to a [128, 20] spectrogram.
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h, s, train: bool = True) -> Dict[str, jnp.ndarray]:
        x, T, B = _fold_sh(h, s)
        x = x.astype(self.dtype)
        x = jnp.tanh(Dense(250, dtype=self.dtype, name="fc1_0")(x))
        x = Dense(250, dtype=self.dtype, name="fc1_1")(x)
        # torch views [T*B, 250] as NCHW (5, 10, 5); go to NHWC.
        x = x.reshape(T * B, 5, 10, 5).transpose(0, 2, 3, 1)
        layer_defs = (
            (64, (5, 5), (3, 1), (1, 2)),
            (128, (5, 5), (1, 1), (1, 2)),
            (64, (4, 8), (2, 2), (1, 3)),
            (32, (4, 8), (2, 2), (1, 3)),
        )
        for i, (features, kernel, stride, pad) in enumerate(layer_defs):
            x = ConvTranspose(features, kernel, strides=stride, padding=pad,
                              use_bias=False, dtype=self.dtype, name=f"deconv{i}")(x)
            x = BatchNorm(use_running_average=not train, dtype=self.dtype,
                          name=f"norm{i}")(x)
            x = glu(x, axis=-1)
        x = ConvTranspose(1, (3, 9), strides=(1, 1), padding=(1, 4),
                          use_bias=False, dtype=self.dtype, name="deconv4")(x)
        x = unfold_tb(x.astype(jnp.float32)[..., 0], T, B).reshape(T, B, 128, 20)
        return {"loc": x, "scale": 1.0}


class PackedSingleChannelConv(nn.Module):
    """k×k, Cout=1 conv reformulated as a width-packed banded conv.

    A 1-output-channel conv utilises <1% of the MXU (the systolic array
    computes 128 output lanes regardless), and profiling showed the sound
    decoder's final 7x7x64->1 conv + its kernel gradient costing ~15% of the
    whole train step.  Packing the (small, static) W axis into the output
    channels with a banded kernel — big[dh, (w_in, c), w_out] =
    k[dh, w_in - w_out + off, c] inside the band — turns it into a dense
    conv with W output channels.  Bit-identical math (validated to ~3e-7
    fwd and grad); parameter stays (kh, kw, Cin, 1) so reference checkpoints
    import unchanged.
    """

    kernel_size: Tuple[int, int] = (7, 7)
    use_bias: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        N, H, W, C = x.shape
        kh, kw = self.kernel_size
        off = kw // 2
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, C, 1),
            self.param_dtype,
        )
        w_in = jnp.arange(W)[:, None]
        w_out = jnp.arange(W)[None, :]
        dw = w_in - w_out + off  # [W, W]
        valid = (dw >= 0) & (dw < kw)
        kd = kernel[..., 0].astype(self.dtype)            # [kh, kw, C]
        big = kd[:, jnp.clip(dw, 0, kw - 1), :]           # [kh, W_in, W_out, C]
        big = jnp.where(valid[None, :, :, None], big, 0.0)
        big = jnp.transpose(big, (0, 1, 3, 2)).reshape(kh, 1, W * C, W)
        xr = x.astype(self.dtype).reshape(N, H, 1, W * C)
        y = jax.lax.conv_general_dilated(
            xr, big, (1, 1), [(kh // 2, kh // 2), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[:, :, 0, :]  # [N, H, W]
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (1,),
                              self.param_dtype)
            y = y + bias.astype(self.dtype)
        return tag_conv_out(y)


class SoundDecoderV2(DecoderBase):
    """StarGAN-VC2-style up-sampling sound decoder (ref :420-472)."""

    channels_base: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h, s, train: bool = True) -> Dict[str, jnp.ndarray]:
        cb = self.channels_base
        x, T, B = _fold_sh(h, s)
        # up_conversion: 1x1 conv1d == Dense, no bias (ref :427-432).
        # The kernel's output columns are stored in (h, w, c) order — the
        # importer permutes torch's (c, h, w) flattening
        # (torch_import.conv1d_1x1_cols_hwc) — so the NHWC reshape below is
        # free.  Reshaping torch's order then transposing used to
        # materialise a 160 MB relayout copy per step (HLO copy profile).
        x = Dense(cb * 2 * 32 * 4, use_bias=False, dtype=self.dtype,
                  name="up_conversion")(x.astype(self.dtype))
        x = x.reshape(T * B, 32, 4, cb * 2)
        layer_defs = (
            (cb * 4, (3, 4), (1, 1), (1, 1)),
            (cb * 2, (4, 4), (2, 2), (1, 1)),
            (cb, (4, 4), (2, 2), (1, 1)),
        )
        for i, (features, kernel, stride, pad) in enumerate(layer_defs):
            x = ConvTranspose(features, kernel, strides=stride, padding=pad,
                              use_bias=False, dtype=self.dtype, name=f"up{i}_deconv")(x)
            x = InstanceNorm(use_running_average=not train, dtype=self.dtype,
                             name=f"up{i}_norm")(x)
            x = glu(x, axis=-1)
        x = PackedSingleChannelConv((7, 7), use_bias=False, dtype=self.dtype,
                                    name="out")(x)
        x = unfold_tb(x.astype(jnp.float32), T, B).reshape(T, B, 128, 20)
        return {"loc": x, "scale": 1.0}


class Discriminator(DecoderBase):
    """Logits head for label modalities like "draw_target" (ref :474-513).

    get_log_prob/get_mse return soft-target cross-entropy over the class
    (last) axis.  Deviation from the reference noted: the reference calls
    F.cross_entropy on [T, B, C] tensors, which misinterprets B as the class
    dim; here CE is computed over the class axis.
    """

    hidden_size: int = 1024
    output_size: int = 2
    activation_function: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h, s, train: bool = True) -> Dict[str, jnp.ndarray]:
        act = act_fn(self.activation_function)
        x, T, B = _fold(h, s)
        x = x.astype(self.dtype)
        x = act(Dense(self.hidden_size, dtype=self.dtype, name="fc1")(x))
        x = act(Dense(self.hidden_size, dtype=self.dtype, name="fc2")(x))
        x = Dense(self.output_size, dtype=self.dtype, name="fc3")(x)
        x = unfold_tb(x.astype(jnp.float32), T, B).reshape(T, B, self.output_size)
        return {"loc": x, "scale": 1.0}

    def _ce(self, h, s, o, train: bool):
        logits = self(h, s, train=train)["loc"]
        return -(o * jax.nn.log_softmax(logits, axis=-1))

    def get_log_prob(self, h, s, o, train: bool = True):
        return self._ce(h, s, o, train)

    def get_mse(self, h, s, o, train: bool = True):
        return self._ce(h, s, o, train)


def build_observation_model(
    name: str,
    observation_shapes: Mapping[str, Sequence[int]],
    belief_size: int,
    state_size: int,
    hidden_size: int,
    embedding_size: Mapping[str, int],
    activation_function: Mapping[str, str],
    normalization: Optional[str],
    dtype: Dtype,
    remat: bool = False,
) -> nn.Module:
    """Name-dispatch decoder factory (ref ``build_ObservationModel``,
    :515-533)."""
    shape = observation_shapes[name]
    if "image" in name:
        size = list(shape[1:])
        cls = {64: ImageDecoder64, 84: ImageDecoder84, 128: ImageDecoder128,
               256: ImageDecoder256}[size[0]]
        return _maybe_remat(cls, remat)(
            embedding_size=embedding_size["image"],
            activation_function=activation_function["cnn"],
            image_dim=shape[0],
            normalization=normalization,
            dtype=dtype,
        )
    if "sound" in name:
        return _maybe_remat(SoundDecoderV2, remat)(dtype=dtype)
    if name == "draw_target":
        return Discriminator(hidden_size=hidden_size, output_size=shape[0], dtype=dtype)
    return DenseDecoder(
        observation_size=shape[0],
        embedding_size=embedding_size["other"],
        activation_function=activation_function["dense"],
        dtype=dtype,
    )


class MultimodalObservationModel(nn.Module):
    """Dict-of-decoders with per-modality likelihoods (ref :537-612)."""

    observation_names_rec: Tuple[str, ...]
    observation_shapes: Mapping[str, Sequence[int]]
    embedding_size: Mapping[str, int]
    belief_size: int
    state_size: int
    hidden_size: int
    activation_function: Mapping[str, str]
    normalization: Optional[str] = None
    dtype: Dtype = jnp.float32
    remat: bool = False

    def setup(self):
        models = {}
        for name in self.observation_names_rec:
            models[name] = build_observation_model(
                name, self.observation_shapes, self.belief_size, self.state_size,
                self.hidden_size, self.embedding_size, self.activation_function,
                self.normalization, self.dtype, remat=self.remat,
            )
        self.models = models

    def __call__(self, h, s, train: bool = True) -> Dict[str, Dict[str, jnp.ndarray]]:
        return {name: self.models[name](h, s, train)
                for name in self.observation_names_rec}

    def get_log_prob(self, h, s, o, train: bool = True):
        return {name: self.models[name].get_log_prob(h, s, o[name], train=train)
                for name in self.observation_names_rec}

    def get_mse(self, h, s, o, train: bool = True):
        return {name: self.models[name].get_mse(h, s, o[name], train=train)
                for name in self.observation_names_rec}

    def get_pred(self, h, s, key: str, train: bool = False):
        """Single-modality prediction (ref get_pred_value, :583-587)."""
        return self.models[key](h, s, train=train)
