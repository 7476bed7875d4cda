"""Observation encoders (per-modality o_t -> embedding).

Re-implements every encoder variant of the reference
(utils/models/encoder.py:282-744) as flax linen modules over NHWC layouts:

- ``SymbolicEncoder``      3-layer MLP                       (ref :282-305)
- ``ImageEncoder64``       4 convs k4 s2, 64px               (ref :307-360)
- ``ImageEncoder84``       k4/k5/k5/k6, 84px                 (ref :362-413)
- ``ImageEncoder128``      5 convs k4 s2                     (ref :415-509)
- ``ImageEncoder256``      6 convs k4 s2                     (ref :511-615)
- ``SoundEncoder``         GLU+BatchNorm conv stack          (ref :617-658)
- ``SoundEncoderV2``       StarGAN-VC2-style GLU downsample  (ref :661-721)
- factories ``build_image_encoder`` / ``build_encoder``      (ref :723-744)
- ``MultimodalEncoder``    dict-of-encoders with the
  "observation" <-> "image" aliasing                         (ref :746-810)
- ``Mixer`` / ``EncoderNN`` concat+Linear single-vector
  fusion ("NN" method's dedicated path)                      (ref :812-880)
- ``MultimodalStochasticEncoder`` per-modality (loc, scale)
  experts for the q(st|ot) expert_dist                       (ref :882-973)

Where the torch code flattens NCHW feature maps to a vector, these modules
transpose NHWC -> NCHW first so the flattened feature order (and therefore
every downstream fully-connected weight) matches the reference bit-for-bit —
required by the PyTorch checkpoint importer.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

def _maybe_remat(cls, remat):
    """Wrap an encoder class in nn.remat (activation rematerialisation):
    backward recomputes the conv stack instead of keeping its activations —
    the HBM-for-FLOPs trade that fits reference-scale batches on a chip
    (``train`` is static arg index 2 of the lifted __call__).

    ``remat == "conv"``: save the tagged conv/matmul outputs
    (layers.tag_conv_out) and recompute only the cheap elementwise tail —
    most of the memory saving at a fraction of the recompute FLOPs.
    """
    if not remat:
        return cls
    policy = None
    if remat == "conv":
        import jax

        policy = jax.checkpoint_policies.save_only_these_names("conv_out")
    return nn.remat(cls, static_argnums=(2,), policy=policy)


from multimodal_rssm_tpu.models.layers import (
    BatchNorm,
    Conv,
    Dense,
    InstanceNorm,
    act_fn,
    glu,
    tag_conv_out,
    torch_padding,
)

Dtype = Any


def flatten_nchw(x: jnp.ndarray) -> jnp.ndarray:
    """Flatten an NHWC feature map in (C, H, W) order — matches torch's
    ``.reshape(-1, 1024)`` on NCHW tensors."""
    return jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)


class SymbolicEncoder(nn.Module):
    """3-layer MLP encoder for low-dimensional modalities (ref :282-305)."""

    embedding_size: int
    activation_function: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        act = act_fn(self.activation_function)
        x = x.astype(self.dtype)
        x = act(Dense(self.embedding_size, dtype=self.dtype, name="fc1")(x))
        x = act(Dense(self.embedding_size, dtype=self.dtype, name="fc2")(x))
        x = act(Dense(self.embedding_size, dtype=self.dtype, name="fc3")(x))
        return x


class _ConvStackEncoder(nn.Module):
    """Shared conv-stack implementation for the image encoder variants.

    ``layer_defs``: sequence of (features, kernel, stride).  With a
    normalization configured, convs drop their bias (ref :325-336).
    Output: flatten to 1024 (in NCHW order), then optional fc+act when
    embedding_size != 1024 (ref :340,348-349).
    """

    layer_defs: Tuple[Tuple[int, int, int], ...] = ()
    embedding_size: int = 1024
    activation_function: str = "relu"
    normalization: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        act = act_fn(self.activation_function)
        x = x.astype(self.dtype)
        use_bias = self.normalization in (None, "None")
        for i, (features, kernel, stride) in enumerate(self.layer_defs):
            x = Conv(
                features,
                (kernel, kernel),
                strides=(stride, stride),
                padding="VALID",
                use_bias=use_bias,
                dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            x = _apply_norm(self, f"norm{i}", self.normalization, x, train, self.dtype)
            x = nn.relu(x)
        x = flatten_nchw(x)
        if self.embedding_size != 1024:
            x = act(Dense(self.embedding_size, dtype=self.dtype, name="fc")(x))
        return x


def _apply_norm(parent, name, normalization, x, train, dtype):
    """Instantiate-and-apply the configured norm as a named child module."""
    if normalization is None or normalization == "None":
        return x
    if normalization == "BatchNorm":
        return BatchNorm(use_running_average=not train, dtype=dtype, name=name)(x)
    if normalization == "InstanceNorm":
        return InstanceNorm(use_running_average=not train, dtype=dtype, name=name)(x)
    if normalization == "GroupNorm":
        return nn.GroupNorm(num_groups=4, epsilon=1e-5, dtype=dtype, name=name)(x)
    raise NotImplementedError(f"normalization {normalization!r}")


class ImageEncoder64(_ConvStackEncoder):
    """64px encoder: ch 32->256, k4 s2 (ref :307-360)."""

    layer_defs: Tuple[Tuple[int, int, int], ...] = (
        (32, 4, 2),
        (64, 4, 2),
        (128, 4, 2),
        (256, 4, 2),
    )


class ImageEncoder84(_ConvStackEncoder):
    """84px encoder: k4/k5/k5/k6 (ref :362-413)."""

    layer_defs: Tuple[Tuple[int, int, int], ...] = (
        (32, 4, 2),
        (64, 5, 2),
        (128, 5, 2),
        (256, 6, 2),
    )


class ImageEncoder128(_ConvStackEncoder):
    """128px encoder: 5 convs ch 16->256 (ref :415-509)."""

    layer_defs: Tuple[Tuple[int, int, int], ...] = (
        (16, 4, 2),
        (32, 4, 2),
        (64, 4, 2),
        (128, 4, 2),
        (256, 4, 2),
    )


class ImageEncoder256(_ConvStackEncoder):
    """256px encoder: 6 convs ch 8->256 (ref :511-615)."""

    layer_defs: Tuple[Tuple[int, int, int], ...] = (
        (8, 4, 2),
        (16, 4, 2),
        (32, 4, 2),
        (64, 4, 2),
        (128, 4, 2),
        (256, 4, 2),
    )


class SoundEncoder(nn.Module):
    """GLU+BatchNorm conv encoder over [128, 20] spectrograms (ref :617-658).

    Input [B, 128, 20] (freq, time); output [B, embedding_size].
    """

    embedding_size: int = 250
    dtype: Dtype = jnp.float32

    # (features, kernel, stride, padding) per conv; each followed by
    # BatchNorm + GLU halving the channels.
    layer_defs: Tuple[Tuple[int, Tuple[int, int], Tuple[int, int], Tuple[int, int]], ...] = (
        (64, (3, 9), (1, 1), (1, 4)),
        (128, (4, 8), (2, 2), (1, 3)),
        (256, (4, 8), (2, 2), (1, 3)),
        (128, (3, 5), (1, 1), (1, 2)),
        (10, (5, 5), (3, 1), (1, 2)),
    )

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x[..., None].astype(self.dtype)  # [B, F, T, 1]
        for i, (features, kernel, stride, pad) in enumerate(self.layer_defs):
            x = Conv(
                features,
                kernel,
                strides=stride,
                padding=torch_padding(pad),
                use_bias=False,
                dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            x = BatchNorm(use_running_average=not train, dtype=self.dtype, name=f"norm{i}")(x)
            x = glu(x, axis=-1)
        x = flatten_nchw(x)  # [B, 250]
        if self.embedding_size != 250:
            x = Dense(self.embedding_size, dtype=self.dtype, name="fc")(x)
        return x


class PackedWidthConv(nn.Module):
    """Stride-1 conv over a 1-input-channel image, width packed into
    channels (input-side analogue of decoders.PackedSingleChannelConv).

    A C_in=1 conv gives the MXU a contraction dim of kh*kw (27 here).
    Reshaping [N, H, W, 1] -> [N, H, 1, W] and banding the kernel —
    big[a, 0, w_in, (w_out, o)] = k[a, w_in - w_out + pw, 0, o] inside the
    band — makes it a dense conv with contraction dim kh*W and a plain
    (N·H)-contracting wgrad.  Bit-identical math; parameter stays
    (kh, kw, 1, O) so reference checkpoints import unchanged.  Measured
    net-neutral end to end at reference scale (the step is not bound by
    this op); kept for the denser MXU shape and cleaner profile.
    """

    features: int
    kernel_size: Tuple[int, int]
    padding: Tuple[int, int]
    use_bias: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from multimodal_rssm_tpu.models.layers import tag_conv_out

        N, H, W, C = x.shape
        assert C == 1, "PackedWidthConv requires a single input channel"
        kh, kw = self.kernel_size
        ph, pw = self.padding
        O = self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, 1, O),
            self.param_dtype,
        )
        # y[n, h, w_out, o] = sum_{a, b} x[n, h + a - ph, w_out + b - pw]
        #                     * k[a, b, 0, o];  b = w_in - w_out + pw
        w_in = jnp.arange(W)[:, None]
        w_out = jnp.arange(W)[None, :]
        b = w_in - w_out + pw                               # [W_in, W_out]
        valid = (b >= 0) & (b < kw)
        kd = kernel[:, :, 0, :].astype(self.dtype)          # [kh, kw, O]
        big = kd[:, jnp.clip(b, 0, kw - 1), :]              # [kh, Wi, Wo, O]
        big = jnp.where(valid[None, :, :, None], big, 0.0)
        big = big.reshape(kh, 1, W, W * O)                  # HWIO, I=W
        xr = x.astype(self.dtype).reshape(N, H, 1, W)
        y = jax.lax.conv_general_dilated(
            xr, big, (1, 1), [(ph, ph), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )                                                   # [N, H, 1, W*O]
        y = y.reshape(N, H, W, O)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (O,),
                              self.param_dtype)
            y = y + bias.astype(self.dtype)
        return tag_conv_out(y)


class GroupedDownConversion(nn.Module):
    """Torch's ``view(N, C*H, W) -> Conv1d(C*H, D, 1)`` (reference
    encoder.py:700-706) without the NCHW transpose: contracts the (h, c)
    axes of an NHWC input against the kernel in place.

    Kernel parameter is the plain Dense [C*H, D] matrix (row index
    c*H + h, exactly torch's channel flattening), so the checkpoint
    importer's ``conv1d_1x1`` mapping and the parameter tree are unchanged;
    only the contraction order differs (einsum, no activation relayout).
    """

    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        N, H, W, C = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (C * H, self.features),
            self.param_dtype,
        )
        # (A full-height VALID-conv formulation of the same contraction was
        # measured equal within noise — 3.941 vs 3.955 steps/s — so the
        # simpler einsum stays.)
        k = kernel.reshape(C, H, self.features)  # free: rows are c*H + h
        y = jnp.einsum(
            "nhwc,chd->nwd", x.astype(self.dtype), k.astype(self.dtype)
        )
        return tag_conv_out(y)


class SoundEncoderV2(nn.Module):
    """StarGAN-VC2-style GLU down-sampling sound encoder (ref :661-721).

    Input [B, 128, 20] spectrogram; output [B, embedding_size].
    NOTE (reference quirk, not replicated as a crash): the reference default
    embbed_size=250 is odd and would break its GLU; the shipped config uses
    256 (config/rssm/multimodal.yaml:28).
    """

    embedding_size: int = 256
    channels_base: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        cb = self.channels_base
        x = x[..., None].astype(self.dtype)  # [B, 128, 20, 1]

        # down_sample_1: conv -> GLU (no norm); width-packed formulation
        # (C_in=1 — see PackedWidthConv)
        x = PackedWidthConv(cb, (3, 9), (1, 4), use_bias=False,
                            dtype=self.dtype, name="down1_conv")(x)
        x = glu(x, axis=-1)
        # down_sample_2..4: conv -> InstanceNorm -> GLU
        for i, (features, kernel, stride, pad) in enumerate(
            [
                (cb * 2, (4, 8), (2, 2), (1, 3)),
                (cb * 4, (4, 8), (2, 2), (1, 3)),
                (cb * 4, (3, 4), (1, 1), (1, 1)),
            ],
            start=2,
        ):
            x = Conv(features, kernel, strides=stride, padding=torch_padding(pad),
                     use_bias=False, dtype=self.dtype, name=f"down{i}_conv")(x)
            x = InstanceNorm(use_running_average=not train, dtype=self.dtype,
                             name=f"down{i}_norm")(x)
            x = glu(x, axis=-1)

        # x: [B, 32, 4, cb*2]; torch groups (C, H) into the conv1d channel:
        # view(-1, cb*64, 4) on NCHW, i.e. conv1d channel k = c*H + h.
        # Contract (h, c) in place via a grouped einsum instead of
        # transposing the activation to NCHW: the Dense kernel [C*H, D]
        # reshapes freely to (C, H, D) because its row index is already
        # c*H + h.  The explicit transpose used to materialise 2x160 MB
        # relayout copies per step (HLO copy profile, round 2).
        B = x.shape[0]

        # down_conversion: grouped 1x1 conv1d -> InstanceNorm1d (no running
        # stats) -> GLU
        x = GroupedDownConversion(self.embedding_size // 2, dtype=self.dtype,
                                  name="down_conversion")(x)
        x = InstanceNorm(track_running_stats=False, dtype=self.dtype,
                         name="down_conversion_norm")(x)
        x = glu(x, axis=-1)
        # [B, 4, emb/4] -> channel-major flatten to [B, emb]
        x = jnp.transpose(x, (0, 2, 1)).reshape(B, self.embedding_size)
        return x


def modality_embedding_size(name: str, embedding_size: Mapping[str, int]) -> int:
    """Embedding width per modality name (ref transition_model.py:171-179)."""
    if "image" in name:
        return embedding_size["image"]
    if "sound" in name:
        return embedding_size["sound"]
    return embedding_size["other"]


def build_image_encoder(
    observation_shape: Sequence[int],
    embedding_size: int,
    activation_function: str,
    normalization: Optional[str],
    dtype: Dtype,
    name: Optional[str] = None,
    remat: bool = False,
) -> nn.Module:
    """Dispatch on image H×W (ref ``build_ImageEncoder``, :723-734)."""
    size = list(observation_shape[1:])
    cls = {64: ImageEncoder64, 84: ImageEncoder84, 128: ImageEncoder128,
           256: ImageEncoder256}[size[0]]
    cls = _maybe_remat(cls, remat)
    return cls(
        embedding_size=embedding_size,
        activation_function=activation_function,
        normalization=normalization,
        dtype=dtype,
        name=name,
    )


def build_encoder(
    name: str,
    observation_shapes: Mapping[str, Sequence[int]],
    embedding_size: Mapping[str, int],
    activation_function: Mapping[str, str],
    normalization: Optional[str],
    dtype: Dtype,
    module_name: Optional[str] = None,
    remat: bool = False,
) -> nn.Module:
    """Name-dispatch encoder factory (ref ``build_Encoder``, :736-744):
    "image" in name -> image encoder; "sound" -> SoundEncoderV2; else MLP."""
    shape = observation_shapes[name]
    if "image" in name:
        return build_image_encoder(
            shape, embedding_size["image"], activation_function["cnn"],
            normalization, dtype, name=module_name, remat=remat,
        )
    if "sound" in name:
        return _maybe_remat(SoundEncoderV2, remat)(
            embedding_size=embedding_size["sound"], dtype=dtype,
            name=module_name)
    return SymbolicEncoder(
        embedding_size=embedding_size["other"],
        activation_function=activation_function["dense"],
        dtype=dtype,
        name=module_name,
    )


def get_obs(observations: Mapping[str, jnp.ndarray], name: str) -> jnp.ndarray:
    """"observation" <-> "image" aliasing (ref MultimodalEncoder.get_obs,
    :764-773)."""
    if name in observations:
        return observations[name]
    if name == "observation" and "image" in observations:
        return observations["image"]
    if name == "image" and "observation" in observations:
        return observations["observation"]
    raise KeyError(f"{name} is missing in {list(observations.keys())}")


class MultimodalEncoder(nn.Module):
    """Dict-in/dict-out multimodal encoder (ref :746-810).

    Child modules are named after their modality so the checkpoint importer
    can map the reference's ``encoder[name]`` state-dicts directly.
    """

    observation_names_enc: Tuple[str, ...]
    observation_shapes: Mapping[str, Sequence[int]]
    embedding_size: Mapping[str, int]
    activation_function: Mapping[str, str]
    normalization: Optional[str] = None
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self, observations: Mapping[str, jnp.ndarray], train: bool = True
    ) -> Dict[str, jnp.ndarray]:
        out = {}
        for name in self.observation_names_enc:
            enc = build_encoder(
                name, self.observation_shapes, self.embedding_size,
                self.activation_function, self.normalization, self.dtype,
                module_name=name, remat=self.remat,
            )
            out[name] = enc(get_obs(observations, name), train)
        return out


class Mixer(nn.Module):
    """Concat + Linear + act fusion head (ref :812-828)."""

    output_size: int
    activation_function: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hiddens: Mapping[str, jnp.ndarray]) -> jnp.ndarray:
        act = act_fn(self.activation_function)
        x = jnp.concatenate([hiddens[k] for k in hiddens.keys()], axis=-1)
        return act(Dense(self.output_size, dtype=self.dtype, name="fc")(x))


class EncoderNN(nn.Module):
    """Multimodal encoder + Mixer producing a single fused embedding — the
    "NN" fusion method's dedicated single-vector path (ref
    ``MultimodalEncoderNN``, :830-880; note the reference class is dead code
    with an undefined-attribute bug at :848 — fixed here)."""

    observation_names_enc: Tuple[str, ...]
    observation_shapes: Mapping[str, Sequence[int]]
    embedding_size: Mapping[str, int]
    activation_function: Mapping[str, str]
    normalization: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, observations: Mapping[str, jnp.ndarray], train: bool = True
    ) -> jnp.ndarray:
        hiddens = MultimodalEncoder(
            observation_names_enc=self.observation_names_enc,
            observation_shapes=self.observation_shapes,
            embedding_size=self.embedding_size,
            activation_function=self.activation_function,
            normalization=self.normalization,
            dtype=self.dtype,
            name="multimodal_encoder",
        )(observations, train=train)
        return Mixer(
            output_size=self.embedding_size["fusion"],
            activation_function=self.activation_function["fusion"],
            dtype=self.dtype,
            name="mixer",
        )(hiddens)


class MultimodalStochasticEncoder(nn.Module):
    """Per-modality stochastic experts q(s_t | o_t): encoder followed by an
    (loc, scale) head per modality (ref :882-973).  Used when
    ``expert_dist == "q(st|ot)"``.
    """

    observation_names_enc: Tuple[str, ...]
    observation_shapes: Mapping[str, Sequence[int]]
    embedding_size: Mapping[str, int]
    state_size: int
    hidden_size: int
    activation_function: Mapping[str, str]
    normalization: Optional[str] = None
    min_std_dev: float = 0.1
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self, observations: Mapping[str, jnp.ndarray], train: bool = True
    ) -> Dict[str, Dict[str, jnp.ndarray]]:
        from multimodal_rssm_tpu.models.heads import ObsEncoderNoBelief

        out = {}
        for name in self.observation_names_enc:
            enc = build_encoder(
                name, self.observation_shapes, self.embedding_size,
                self.activation_function, self.normalization, self.dtype,
                module_name=name, remat=self.remat,
            )
            hid = enc(get_obs(observations, name), train)
            head = ObsEncoderNoBelief(
                state_size=self.state_size,
                hidden_size=self.hidden_size,
                activation_function=self.activation_function["dense"],
                min_std_dev=self.min_std_dev,
                dtype=self.dtype,
                name=f"{name}_head",
            )
            out[name] = head(hid)
        return out
