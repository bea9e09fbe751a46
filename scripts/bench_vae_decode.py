#!/usr/bin/env python
"""VAE decode batch-scaling attribution (serving regression, round 2).

Measured: decode b1 = 19.9 ms but b4 = 194 ms (9.8x for 4x work). Suspects:
(a) the d=512 mid-attn flash kernel at bh=4, (b) activation pressure from
batched 512x512 conv stacks. Variants: batched decode with ours vs stock
flash vs XLA attention, and per-image lax.map decode. Slope-method timing.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K1 = int(os.environ.get("BENCH_K1", 2))
K2 = int(os.environ.get("BENCH_K2", 42))


def slope(make, args, args2, name):
    import jax

    try:
        f1, f2 = make(K1), make(K2)
        t0 = time.time()
        jax.block_until_ready(f1(*args)); jax.block_until_ready(f2(*args))
        compile_s = time.time() - t0
        t0 = time.time()
        jax.block_until_ready(f1(*args2))
        t1 = time.time()
        jax.block_until_ready(f2(*args2))
        t2 = time.time()
        dt = ((t2 - t1) - (t1 - t0)) / (K2 - K1)
        print(json.dumps({"component": name, "ms": round(dt * 1000, 2),
                          "compile_s": round(compile_s, 1)}))
    except Exception as e:
        print(json.dumps({"component": name, "error": str(e)[:200]}))
    sys.stdout.flush()


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from controllora_tpu.models.vae import AutoencoderKL, VAEConfig
    from controllora_tpu.models.zoo import cast_tree

    dtype = jnp.bfloat16
    vae = AutoencoderKL(VAEConfig(), dtype=dtype)
    t0 = time.time()
    vae_params = cast_tree(
        jax.jit(vae.init)(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))["params"],
        dtype)
    print(f"init {time.time()-t0:.1f}s", file=sys.stderr)

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    lat = jnp.zeros((b, 64, 64, 4), jnp.bfloat16)
    lat2 = jnp.asarray(np.full((b, 64, 64, 4), 0.1, np.float32), jnp.bfloat16)

    def make_batched(K, impl):
        def f(vp, z):
            def step(c, _):
                img = vae.apply({"params": vp}, c, method=vae.decode)
                return c + 1e-3 * jnp.mean(img).astype(c.dtype), None

            c, _ = jax.lax.scan(step, z, None, length=K)
            return c

        return jax.jit(f)

    # ours (current default path)
    os.environ.pop("CONTROLLORA_FLASH_IMPL", None)
    slope(lambda K: make_batched(K, "ours"), (vae_params, lat), (vae_params, lat2),
          f"decode_b{b}_batched_ours")

    # stock flash kernel
    os.environ["CONTROLLORA_FLASH_IMPL"] = "stock"
    slope(lambda K: make_batched(K, "stock"), (vae_params, lat), (vae_params, lat2),
          f"decode_b{b}_batched_stock")
    os.environ.pop("CONTROLLORA_FLASH_IMPL", None)

    # per-image sequential decode (activation footprint = batch 1)
    def make_map(K):
        def f(vp, z):
            def step(c, _):
                img = jax.lax.map(
                    lambda zi: vae.apply({"params": vp}, zi[None],
                                         method=vae.decode)[0], c)
                return c + 1e-3 * jnp.mean(img).astype(c.dtype), None

            c, _ = jax.lax.scan(step, z, None, length=K)
            return c

        return jax.jit(f)

    slope(make_map, (vae_params, lat), (vae_params, lat2), f"decode_b{b}_laxmap")


if __name__ == "__main__":
    main()
