"""Pallas TPU kernels for the input pipeline.

``normalize_image_pallas`` fuses the bit-depth quantisation, dequantisation
noise (on-core PRNG — no separate jax.random.uniform tensor materialised in
HBM) and the [-0.5, 0.5] mapping of ops/image.normalize_image into one VPU
pass over the uint8 batch: one read of the uint8 input, one write of the
f32 output, nothing else touches HBM.  The batch is processed as a 1-D grid
of (rows, 512)-element VMEM blocks; each grid step seeds the per-core PRNG
with (seed, program_id) so blocks draw independent noise.

This is the framework's pallas showcase; the conv/matmul hot path is left
to XLA (its TPU conv kernels are already MXU-optimal — profiled in
DESIGN.md).  The jax.random-based path in ops/image.py remains the default
(keyed, reproducible across backends); this kernel is distribution-
equivalent and selected when shapes allow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 512
_MAX_BLOCK_ROWS = 2048


def _block_rows(rows: int) -> int:
    """Largest divisor of ``rows`` not exceeding the VMEM-friendly cap."""
    best = 1
    d = 1
    while d * d <= rows:
        if rows % d == 0:
            for cand in (d, rows // d):
                if cand <= _MAX_BLOCK_ROWS:
                    best = max(best, cand)
        d += 1
    return best


def _normalize_kernel(seed_ref, x_ref, out_ref, *, bit_depth: int):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    # mosaic has no direct uint8->f32 cast; hop through int32
    x = x_ref[:].astype(jnp.int32).astype(jnp.float32)
    q = jnp.floor(x / (2 ** (8 - bit_depth))) / (2**bit_depth) - 0.5
    # uniform [0, 1): random mantissa with exponent pinned to [1, 2)
    bits = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
    fbits = (bits >> 9) | jnp.uint32(0x3F800000)
    u = pltpu.bitcast(fbits, jnp.float32) - 1.0
    out_ref[:] = q + u / (2**bit_depth)


def supports_shape(shape) -> bool:
    total = 1
    for d in shape:
        total *= d
    return total % _LANES == 0


def normalize_image_pallas(
    observation: jnp.ndarray, bit_depth: int, seed: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused bit-depth normalise (ops/image.normalize_image semantics:
    quantise to ``bit_depth`` bits, map to [-0.5, 0.5], add uniform dequant
    noise) in a single pallas pass.  Requires total elements % 512 == 0
    (every image batch shape in the shipped configs qualifies)."""
    orig_shape = observation.shape
    total = 1
    for d in orig_shape:
        total *= d
    if total % _LANES != 0:
        raise ValueError(f"shape {orig_shape} not divisible into lanes")
    rows = total // _LANES
    br = _block_rows(rows)
    grid = rows // br
    x = observation.reshape(rows, _LANES)
    out = pl.pallas_call(
        functools.partial(_normalize_kernel, bit_depth=bit_depth),
        grid=(grid,),
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((br, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(seed.reshape(1).astype(jnp.int32), x)
    return out.reshape(orig_shape)
