"""Fused conv + InstanceNorm + GLU Pallas kernels for the sound codec's
stride-1 stages (SoundEncoderV2 ``down4``, SoundDecoderV2 ``up0``).

Motivation (round-2 profile): the training step's residual data-formatting
time concentrates around the sound codec — XLA materialises relayout
copies between its conv layouts and the elementwise/dot layouts of the
norm/GLU/conversion ops that surround them.  Keeping one whole
conv->InstanceNorm->GLU stage inside a single Pallas kernel removes those
boundaries for the fused stage: one read of the input block, MXU tap-dots
for the conv, in-VMEM per-instance statistics, and one write each of the
gated output and the (backward-needed) pre-norm conv result.

Scope: stride 1, symmetric torch-style padding, full spatial extent per
sample resident in VMEM (true for every sound-codec stage: H' x W' <=
32 x 5).  The decoder's stride-1 ConvTranspose ``up0`` reduces to this
kernel with a flipped kernel and adjusted padding (see
``conv_transpose_in_glu``).  Strided stages (down2/3, up1/2) stay on XLA —
Mosaic supports no strided value slicing (probed), and phase-decomposing
them through HBM was measured a loss in round 1.

Semantics match models/layers.{Conv + InstanceNorm(train) + glu} exactly:
conv accumulates in f32 over bf16 taps, InstanceNorm uses per-instance
spatial statistics with ``var = max(E[z^2] - mean^2, 0)`` and eps inside
rsqrt, GLU gates the first half of the channels by the sigmoid of the
second.  The returned per-instance (mean, var) let the caller update the
norm's running statistics (module side), so train-mode batch_stats evolve
identically to the unfused path.

Reference op spec: /root/reference/utils/models/encoder.py:694-699
(down_sample_4) and observation_model.py:437-443 (up_sample_0).

MEASURED OUTCOME (v5e, batch 2450, bf16 — scripts/verify_fused_codec.py):
numerics match the XLA composition fwd + all four gradients (rel <= 6e-3
at bf16), but the fused grad-step LOSES to XLA's native convolutions:
down4 37.0 ms vs 25.0 ms, up0 37.5 ms vs 29.8 ms.  Two kernel strategies
were tried — per-tap K=Cin dots (31.6 ms) and one large im2col GEMM
through VMEM scratch (37.0 ms); XLA's conv emitter beats both at these
small-W shapes, and the hoped-for layout-copy savings do not materialise
because the pallas custom-call boundary forces its operands/results into
HBM default layouts anyway (same effect measured for the pallas
normalize, DESIGN.md round-2 table).  The op is therefore NOT wired into
the sound codec modules: it stays as a verified, tested building block
and a recorded negative result so later rounds don't re-attempt it.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_BLOCK = 25          # batch rows per grid step (VMEM budget)
# raise mosaic's conservative scoped-vmem cap: the fused stage keeps the
# padded input + f32 conv accumulator + normalised copy live at once
_COMPILER_PARAMS = None


def _compiler_params():
    global _COMPILER_PARAMS
    if _COMPILER_PARAMS is None:
        _COMPILER_PARAMS = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    return _COMPILER_PARAMS


_SCRATCH_BUDGET = 20 * 1024 * 1024   # per-kernel im2col scratch cap (bytes)


def _block_n(n: int, scratch_row_bytes: int = 0) -> int:
    """Largest divisor of ``n`` that is <= _MAX_BLOCK and whose im2col
    scratch ([nb * rows-per-sample, K] at ``scratch_row_bytes`` per sample)
    fits the VMEM budget — the dgrad kernel's K = kh*kw*Cout scratch at
    nb=25 (47 MB) exhausted v5e scoped VMEM, and the up0-shape fwd kernel
    (160 output rows/sample) needed 105.8 MB total scoped at nb=25 with a
    24.6 MB scratch; the 20 MB cap drops it to nb=14, which fits, while
    down4 (128 rows/sample, 19.7 MB at nb=25) keeps its full block
    (both probed on v5e)."""
    best = 1
    d = 1
    while d * d <= n:
        if n % d == 0:
            for cand in (d, n // d):
                if cand <= _MAX_BLOCK and (
                    scratch_row_bytes * cand <= _SCRATCH_BUDGET
                ):
                    best = max(best, cand)
        d += 1
    return best


def _out_size(h: int, k: int, p: int) -> int:
    return h + 2 * p - k + 1


def _pad_block(x, ph: int, pw: int):
    """Zero-pad the H/W dims of a [nb, H, W, C] value (leading dims only
    touch the untiled axes for H; W padding pads the sublane dim)."""
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))


def _im2col(xp, col_ref, nb: int, ho: int, wo: int, kh: int, kw: int,
            cin: int):
    """Write the im2col matrix of the padded block ``xp`` [nb, Hp, Wp, Cin]
    into the VMEM scratch ``col_ref`` [nb*ho*wo, kh*kw*cin].

    Row index is (n, h', w') contiguous; tap columns are (dh, dw)
    lexicographic.  Assembly goes through explicit scratch *stores* (one
    [nb*ho*wo, cin] store per tap at lane offset t*cin) rather than a
    lane-axis ``jnp.concatenate``: the tap slices carry differing sublane
    offsets and Mosaic's tpu.concatenate rejects offset mismatch on the
    non-concat dim ("Not implemented", probed on v5e), while stores
    relayout freely."""
    for dh in range(kh):
        for dw in range(kw):
            t = dh * kw + dw
            part = xp[:, dh:dh + ho, dw:dw + wo, :].reshape(nb * ho * wo, cin)
            col_ref[:, t * cin:(t + 1) * cin] = part


def _conv_taps(xp, w, col_ref, nb: int, ho: int, wo: int, kh: int, kw: int,
               cin: int, cout: int):
    """Stride-1 valid conv of the padded block ``xp`` [nb, Hp, Wp, Cin]
    with ``w`` [kh, kw, Cin, Cout] -> f32 [nb, ho, wo, cout].

    One MXU GEMM per block over the scratch im2col matrix:
    [nb*ho*wo, kh*kw*cin] x [kh*kw*cin, cout] (M=4000, K=3072 for down4).
    Large-K/M GEMMs keep the MXU fed where per-tap K=Cin dots ran at ~50%
    utilisation (measured: the per-tap form benched 31.6 ms vs XLA's 24.9
    for the down4 grad-step)."""
    _im2col(xp, col_ref, nb, ho, wo, kh, kw, cin)
    wf = w.reshape(kh * kw * cin, cout)
    d = jnp.dot(col_ref[:], wf, preferred_element_type=jnp.float32)
    return d.reshape(nb, ho, wo, cout)


def _fwd_kernel(x_ref, w_ref, scale_ref, bias_ref,
                y_ref, z_ref, mean_ref, var_ref, col_ref, *,
                nb, ho, wo, kh, kw, cin, cout, ph, pw, eps, out_dtype):
    xp = _pad_block(x_ref[:], ph, pw)
    z = _conv_taps(xp, w_ref[:], col_ref, nb, ho, wo, kh, kw, cin, cout)

    mean = jnp.mean(z, axis=(1, 2))                          # [nb, cout] f32
    var = jnp.maximum(jnp.mean(z * z, axis=(1, 2)) - mean * mean, 0.0)
    a = scale_ref[:].astype(jnp.float32) * jax.lax.rsqrt(var + eps)
    b = bias_ref[:].astype(jnp.float32) - mean * a
    zn = z * a[:, None, None, :] + b[:, None, None, :]

    c2 = cout // 2
    y = zn[..., :c2] * jax.nn.sigmoid(zn[..., c2:])

    y_ref[:] = y.astype(out_dtype)
    z_ref[:] = z.astype(out_dtype)
    # stats are [1, nb, cout] blocks: a 2-D [nb, cout] block with nb not a
    # multiple of 8 violates the mosaic block-shape rule (N=2450 has no
    # 8-divisible factor), but a leading grid axis with full-dim tail is OK
    mean_ref[:] = mean[None]
    var_ref[:] = var[None]


def _bwd_dz_kernel_full(dy_ref, z_ref, mean_ref, var_ref, scale_ref,
                        bias_ref, dz_ref, dsb_ref, *, cout, eps):
    """GLU + affine + InstanceNorm backward for one block: dy -> dz, plus
    this block's (dscale, dbias) partials [1, 2, cout]."""
    z = z_ref[:].astype(jnp.float32)
    mean = mean_ref[:][0]                                    # [nb, cout]
    rstd = jax.lax.rsqrt(var_ref[:][0] + eps)
    scale = scale_ref[:].astype(jnp.float32)
    bias = bias_ref[:].astype(jnp.float32)

    zhat = (z - mean[:, None, None, :]) * rstd[:, None, None, :]
    zn = zhat * scale[None, None, None, :] + bias[None, None, None, :]

    c2 = cout // 2
    a_half = zn[..., :c2]
    sig = jax.nn.sigmoid(zn[..., c2:])
    dy = dy_ref[:].astype(jnp.float32)
    dzn_a = dy * sig
    dzn_b = dy * a_half * sig * (1.0 - sig)
    dzn = jnp.concatenate([dzn_a, dzn_b], axis=-1)           # [nb,ho,wo,cout]

    dscale = jnp.sum(dzn * zhat, axis=(0, 1, 2))             # [cout]
    dbias = jnp.sum(dzn, axis=(0, 1, 2))
    dsb_ref[:] = jnp.stack([dscale, dbias])[None]            # [1, 2, cout]

    dzhat = dzn * scale[None, None, None, :]
    m1 = jnp.mean(dzhat, axis=(1, 2))                        # [nb, cout]
    m2 = jnp.mean(dzhat * zhat, axis=(1, 2))
    dz = rstd[:, None, None, :] * (
        dzhat - m1[:, None, None, :] - zhat * m2[:, None, None, :]
    )
    dz_ref[:] = dz.astype(dz_ref.dtype)


def _dgrad_kernel(dz_ref, w2_ref, dx_ref, col_ref, *,
                  nb, hi, wi_, kh, kw, cin, cout, ph, pw):
    """dx = stride-1 valid conv of padded dz with the flipped/transposed
    kernel ``w2`` [kh, kw, Cout, Cin] and padding (kh-1-ph, kw-1-pw)."""
    dzp = _pad_block(dz_ref[:], kh - 1 - ph, kw - 1 - pw)
    dx = _conv_taps(dzp, w2_ref[:], col_ref, nb, hi, wi_, kh, kw, cout, cin)
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _wgrad_kernel(x_ref, dz_ref, dw_ref, col_ref, *,
                  nb, ho, wo, kh, kw, cin, cout, ph, pw):
    """dw[dh, dw] += sum_n,h',w' xp[n, h'+dh, w'+dw, ci] dz[n, h', w', co],
    accumulated across grid steps into the single [kh*kw, cin, cout]
    output block (revisited every step).  One batch-contracting GEMM per
    block: im2col^T [kh*kw*cin, nb*ho*wo] x dz rows [nb*ho*wo, cout]
    (K = 4000 for down4)."""
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    xp = _pad_block(x_ref[:], ph, pw)
    _im2col(xp, col_ref, nb, ho, wo, kh, kw, cin)
    rhs = dz_ref[:].reshape(nb * ho * wo, cout)
    d = jax.lax.dot_general(
        col_ref[:], rhs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # [kh*kw*cin,cout]
    dw_ref[:] += d.reshape(kh * kw, cin, cout)


def _specs_nb(nb, shape_tail):
    return pl.BlockSpec((nb, *shape_tail), lambda i: (i, *([0] * len(shape_tail))),
                        memory_space=pltpu.VMEM)


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple([0] * len(shape)),
                        memory_space=pltpu.VMEM)


def _fwd_impl(x, w, scale, bias, padding, eps, interpret):
    n, h, wdim, cin = x.shape
    kh, kw, _, cout = w.shape
    ph, pw = padding
    ho, wo = _out_size(h, kh, ph), _out_size(wdim, kw, pw)
    isz = jnp.dtype(x.dtype).itemsize
    nb = _block_n(n, ho * wo * kh * kw * cin * isz)
    grid = n // nb
    kern = functools.partial(
        _fwd_kernel, nb=nb, ho=ho, wo=wo, kh=kh, kw=kw, cin=cin, cout=cout,
        ph=ph, pw=pw, eps=eps, out_dtype=x.dtype,
    )
    y, z, mean, var = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            _specs_nb(nb, (h, wdim, cin)),
            _full_spec((kh, kw, cin, cout)),
            _full_spec((cout,)),
            _full_spec((cout,)),
        ],
        out_specs=[
            _specs_nb(nb, (ho, wo, cout // 2)),
            _specs_nb(nb, (ho, wo, cout)),
            pl.BlockSpec((1, nb, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, ho, wo, cout // 2), x.dtype),
            jax.ShapeDtypeStruct((n, ho, wo, cout), x.dtype),
            jax.ShapeDtypeStruct((grid, nb, cout), jnp.float32),
            jax.ShapeDtypeStruct((grid, nb, cout), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((nb * ho * wo, kh * kw * cin), x.dtype)],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(x, w.astype(x.dtype), scale, bias)
    return y, z, mean.reshape(n, cout), var.reshape(n, cout)


def _bwd_impl(res, dy, padding, eps, interpret):
    x, w, scale, bias, z, mean, var = res
    n, h, wdim, cin = x.shape
    kh, kw, _, cout = w.shape
    ph, pw = padding
    ho, wo = _out_size(h, kh, ph), _out_size(wdim, kw, pw)
    isz = jnp.dtype(x.dtype).itemsize
    nb = _block_n(n)                 # dz kernel: no im2col scratch
    grid = n // nb

    # 1) dy -> dz (+ per-block dscale/dbias partials)
    dz, dsb = pl.pallas_call(
        functools.partial(_bwd_dz_kernel_full, cout=cout, eps=eps),
        grid=(grid,),
        in_specs=[
            _specs_nb(nb, (ho, wo, cout // 2)),
            _specs_nb(nb, (ho, wo, cout)),
            pl.BlockSpec((1, nb, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _full_spec((cout,)),
            _full_spec((cout,)),
        ],
        out_specs=[
            _specs_nb(nb, (ho, wo, cout)),
            pl.BlockSpec((1, 2, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, ho, wo, cout), x.dtype),
            jax.ShapeDtypeStruct((grid, 2, cout), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(dy, z, mean.reshape(grid, nb, cout), var.reshape(grid, nb, cout),
      scale, bias)
    dscale = dsb[:, 0].sum(0).astype(scale.dtype)
    dbias = dsb[:, 1].sum(0).astype(bias.dtype)

    # 2) dgrad: dx = conv(pad(dz), flip(w)^T)
    nb_d = _block_n(n, h * wdim * kh * kw * cout * isz)
    w2 = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)      # [kh,kw,cout,cin]
    dx = pl.pallas_call(
        functools.partial(_dgrad_kernel, nb=nb_d, hi=h, wi_=wdim, kh=kh, kw=kw,
                          cin=cin, cout=cout, ph=ph, pw=pw),
        grid=(n // nb_d,),
        in_specs=[
            _specs_nb(nb_d, (ho, wo, cout)),
            _full_spec((kh, kw, cout, cin)),
        ],
        out_specs=_specs_nb(nb_d, (h, wdim, cin)),
        out_shape=jax.ShapeDtypeStruct((n, h, wdim, cin), x.dtype),
        scratch_shapes=[pltpu.VMEM((nb_d * h * wdim, kh * kw * cout), x.dtype)],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(dz, w2.astype(x.dtype))

    # 3) wgrad: accumulate [kh*kw, cin, cout] across grid steps
    nb_w = _block_n(n, ho * wo * kh * kw * cin * isz)
    dw_flat = pl.pallas_call(
        functools.partial(_wgrad_kernel, nb=nb_w, ho=ho, wo=wo, kh=kh, kw=kw,
                          cin=cin, cout=cout, ph=ph, pw=pw),
        grid=(n // nb_w,),
        in_specs=[
            _specs_nb(nb_w, (h, wdim, cin)),
            _specs_nb(nb_w, (ho, wo, cout)),
        ],
        out_specs=_full_spec((kh * kw, cin, cout)),
        out_shape=jax.ShapeDtypeStruct((kh * kw, cin, cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nb_w * ho * wo, kh * kw * cin), x.dtype)],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(x, dz)
    dw = dw_flat.reshape(kh, kw, cin, cout).astype(w.dtype)
    return dx, dw, dscale, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def conv_in_glu(x, w, scale, bias, padding: Tuple[int, int],
                eps: float = 1e-5, interpret: bool = False):
    """Fused stride-1 conv + train-mode InstanceNorm + GLU.

    x [N, H, W, Cin], w [kh, kw, Cin, Cout] (Cout even), scale/bias [Cout].
    Returns (y [N, H', W', Cout/2], mean [N, Cout], var [N, Cout]); the
    per-instance stats carry no gradient (InstanceNorm buffers).
    """
    y, z, mean, var = _fwd_impl(x, w, scale, bias, padding, eps, interpret)
    return y, jax.lax.stop_gradient(mean), jax.lax.stop_gradient(var)


def _vjp_fwd(x, w, scale, bias, padding, eps, interpret):
    y, z, mean, var = _fwd_impl(x, w, scale, bias, padding, eps, interpret)
    return ((y, jax.lax.stop_gradient(mean), jax.lax.stop_gradient(var)),
            (x, w, scale, bias, z, mean, var))


def _vjp_bwd(padding, eps, interpret, res, cts):
    dy, _dmean, _dvar = cts
    return _bwd_impl(res, dy, padding, eps, interpret)


conv_in_glu.defvjp(_vjp_fwd, _vjp_bwd)


def conv_transpose_in_glu(x, w, scale, bias, padding: Tuple[int, int],
                          eps: float = 1e-5, interpret: bool = False):
    """Fused stride-1 ConvTranspose + InstanceNorm + GLU.

    ``w`` in this framework's ConvTranspose layout [kh, kw, Cin, Cout]
    (models/layers.ConvTranspose); a stride-1 transposed conv is the plain
    conv of the input with the spatially flipped kernel and padding
    (kh-1-ph, kw-1-pw).
    """
    kh, kw = w.shape[0], w.shape[1]
    ph, pw = padding
    wf = jnp.flip(w, axis=(0, 1))
    return conv_in_glu(x, wf, scale, bias, (kh - 1 - ph, kw - 1 - pw),
                       eps, interpret)
