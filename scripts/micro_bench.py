#!/usr/bin/env python
"""Per-module fwd / fwd+bwd timing at reference scale (T*B = 2450 frames).

Attributes the train step's wall-clock to individual codecs so kernel work
targets the real hotspots.  Run on TPU.

    python scripts/micro_bench.py [--modules sound_enc,sound_dec,...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, n=10, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    # scalar fetch as the barrier (block_until_ready can return early
    # through the remote-TPU tunnel)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jax.device_get(leaf.sum() if hasattr(leaf, "sum") else leaf))
    return (time.perf_counter() - t0) / n


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=2450)
    parser.add_argument("--modules", type=str, default="")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodal_rssm_tpu.core.runtime import enable_persistent_cache

    enable_persistent_cache()

    from multimodal_rssm_tpu.models import decoders as dec
    from multimodal_rssm_tpu.models import encoders as enc

    N = args.frames
    T, B = 49, N // 49
    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16

    sound = jax.random.normal(key, (N, 128, 20), jnp.float32)
    image = jax.random.normal(key, (N, 64, 64, 3), jnp.float32)
    h = jax.random.normal(key, (T, B, 1024), jnp.float32)
    s = jax.random.normal(key, (T, B, 128), jnp.float32)

    cases = {}

    def add(name, module, *xs, method=None):
        variables = module.init(jax.random.PRNGKey(1), *xs)

        def fwd(v, *xs):
            out = module.apply(v, *xs, mutable=["batch_stats"])[0]
            if isinstance(out, dict) and "loc" in out:
                out = out["loc"]
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

        def fwdbwd(v, *xs):
            return jax.grad(lambda vv: fwd({"params": vv,
                                            "batch_stats": v.get("batch_stats", {})},
                                           *xs))(v["params"])

        cases[name] = (jax.jit(fwd), jax.jit(fwdbwd), variables, xs)

    add("sound_enc_v2", enc.SoundEncoderV2(embedding_size=256, dtype=dtype), sound)
    add("sound_dec_v2", dec.SoundDecoderV2(dtype=dtype), h, s)
    add("sound_enc_v1", enc.SoundEncoder(embedding_size=256, dtype=dtype), sound)
    add("sound_dec_v1", dec.SoundDecoder(dtype=dtype), h, s)
    add("image_enc_64", enc.ImageEncoder64(embedding_size=1024,
                                           activation_function="relu",
                                           normalization="BatchNorm",
                                           dtype=dtype), image)
    add("image_dec_64", dec.ImageDecoder64(embedding_size=1024,
                                           activation_function="relu",
                                           normalization="BatchNorm",
                                           dtype=dtype), h, s)

    only = [m for m in args.modules.split(",") if m]
    for name, (fwd, fwdbwd, variables, xs) in cases.items():
        if only and name not in only:
            continue
        t_f = timeit(fwd, variables, *xs) * 1e3
        t_fb = timeit(fwdbwd, variables, *xs) * 1e3
        print(f"{name:16s} fwd {t_f:7.2f} ms   fwd+bwd {t_fb:7.2f} ms   "
              f"(bwd ~ {t_fb - t_f:7.2f})")


if __name__ == "__main__":
    main()
