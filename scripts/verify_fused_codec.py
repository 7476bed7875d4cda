#!/usr/bin/env python
"""On-TPU verification of the fused conv+IN+GLU kernels (ops/fused_codec)
at the real down4 / up0 stage shapes: compiled (non-interpret) kernels vs
the XLA composition, forward + full gradients, plus a microbenchmark.

    python scripts/verify_fused_codec.py [--n 2450]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_rssm_tpu.core.runtime import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from multimodal_rssm_tpu.ops import fused_codec  # noqa: E402
from tests.test_fused_codec import ref_conv_in_glu  # noqa: E402


def check(name, n, h, wd, cin, kh, kw, cout, ph, pw, dtype, bench_steps=30):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, h, wd, cin)).astype(np.float32) * 0.3,
                    dtype)
    w = jnp.asarray(rng.normal(size=(kh, kw, cin, cout)).astype(np.float32)
                    * 0.05, dtype)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, cout).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=cout).astype(np.float32) * 0.1)
    ho, wo = h + 2 * ph - kh + 1, wd + 2 * pw - kw + 1
    r = jnp.asarray(rng.normal(size=(n, ho, wo, cout // 2))
                    .astype(np.float32), dtype)

    fused = jax.jit(lambda *a: fused_codec.conv_in_glu(*a, (ph, pw), 1e-5))
    ref = jax.jit(lambda x, w, s, b: ref_conv_in_glu(
        x.astype(jnp.float32), w.astype(jnp.float32), s, b, (ph, pw)))

    y, mean, var = fused(x, w, scale, bias)
    y_r, mean_r, var_r = ref(x, w, scale, bias)
    tol = 3e-2 if dtype == jnp.bfloat16 else 2e-4
    for a, b_, nm in ((y, y_r, "y"), (mean, mean_r, "mean"), (var, var_r, "var")):
        d = np.abs(np.asarray(a, np.float32) - np.asarray(b_, np.float32))
        denom = np.abs(np.asarray(b_, np.float32)).max() + 1e-6
        print(f"  {name} {nm}: max_abs={d.max():.5f} rel={d.max()/denom:.5f}")
        assert d.max() / denom < tol, f"{name} {nm} mismatch"

    gf = jax.jit(jax.grad(lambda *a: jnp.sum(
        fused_codec.conv_in_glu(*a, (ph, pw), 1e-5)[0].astype(jnp.float32)
        * r.astype(jnp.float32)), argnums=(0, 1, 2, 3)))
    gr = jax.jit(jax.grad(lambda x, w, s, b: jnp.sum(
        ref_conv_in_glu(x.astype(jnp.float32), w.astype(jnp.float32), s, b,
                        (ph, pw))[0] * r.astype(jnp.float32)),
        argnums=(0, 1, 2, 3)))
    for a, b_, nm in zip(gf(x, w, scale, bias), gr(x, w, scale, bias),
                         ("dx", "dw", "dscale", "dbias")):
        d = np.abs(np.asarray(a, np.float32) - np.asarray(b_, np.float32))
        denom = np.abs(np.asarray(b_, np.float32)).max() + 1e-6
        print(f"  {name} {nm}: max_abs={d.max():.5f} rel={d.max()/denom:.5f}")
        assert d.max() / denom < tol, f"{name} {nm} mismatch"

    # microbench fwd+bwd (scalar fetch as barrier — tunnel quirk)
    def timed(fn):
        out = fn(x, w, scale, bias)
        float(jnp.sum(out[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(bench_steps):
            out = fn(x, w, scale, bias)
        float(jnp.sum(out[0].astype(jnp.float32)))
        return (time.perf_counter() - t0) / bench_steps * 1e3

    t_fused, t_ref = timed(gf), timed(gr)
    print(f"  {name} grad-step: fused {t_fused:.2f} ms vs xla {t_ref:.2f} ms")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=2450)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    print("down4 stage:")
    check("down4", args.n, 32, 5, 256, 3, 4, 512, 1, 1, dtype)
    print("up0 stage (conv-equivalent):")
    check("up0", args.n, 32, 4, 256, 3, 4, 512, 1, 2, dtype)
    print("OK")


if __name__ == "__main__":
    main()
