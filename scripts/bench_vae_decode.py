#!/usr/bin/env python
"""VAE decode batch-scaling attribution (serving, round 2).

Measured (bench_serving_components.py): decode b1 = 19.9 ms, b4 = 194 ms -
2.4x per image. Variants here: batched decode with ours vs stock flash
mid-attention, and per-image lax.map decode (activation footprint = batch 1).

Methodology: in-graph scan slope (K2-K1 extra iterations, data-dependent carry)
- the only repeat-timing immune to the tunnel's dispatch result cache. MUST run
uncontended: host CPU contention poisons the slope into +-0 (BENCHMARKS.md
"measurement traps"). Fences via float() scalar fetch.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K1 = int(os.environ.get("BENCH_K1", 2))
K2 = int(os.environ.get("BENCH_K2", 10))


def slope(make, args, args2, name):
    try:
        f1, f2 = make(K1), make(K2)
        t0 = time.time()
        float(f1(*args)); float(f2(*args))
        compile_s = time.time() - t0
        t0 = time.time()
        float(f1(*args2))
        t1 = time.time()
        float(f2(*args2))
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

    def make(decode_body):
        def mk(K):
            def f(vp, z):
                def step(c, _):
                    img = decode_body(vp, c)
                    # mix must survive bf16 rounding (0.3*tanh, not 1e-3*mean)
                    return c + jnp.tanh(img[:, ::8, ::8, :1]) * 0.3, None

                c, _ = jax.lax.scan(step, z, None, length=K)
                return jnp.sum(c.astype(jnp.float32))

            return jax.jit(f)

        return mk

    batched = lambda vp, c: vae.apply({"params": vp}, c, method=vae.decode)
    permap = lambda vp, c: jax.lax.map(
        lambda ci: vae.apply({"params": vp}, ci[None], method=vae.decode)[0], c)

    os.environ.pop("CONTROLLORA_FLASH_IMPL", None)
    slope(make(batched), (vae_params, lat), (vae_params, lat2),
          f"decode_b{b}_batched_ours")

    os.environ["CONTROLLORA_FLASH_IMPL"] = "stock"
    slope(make(batched), (vae_params, lat), (vae_params, lat2),
          f"decode_b{b}_batched_stock")
    os.environ.pop("CONTROLLORA_FLASH_IMPL", None)

    slope(make(permap), (vae_params, lat), (vae_params, lat2),
          f"decode_b{b}_laxmap")


if __name__ == "__main__":
    main()
