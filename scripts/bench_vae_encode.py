#!/usr/bin/env python
"""VAE encode batch-scaling: batched vs per-image lax.map at training batch 8.

Companion to bench_vae_decode.py (decode measured 2.4x superlinear at b4).
The training step encodes b8 512^2 pixels every step; if the batched encoder
suffers the same XLA scheduling pathology, per-image encode is a direct
train-step win. Scan-slope timing, scalar fence, run uncontended.
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

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    px = jnp.zeros((b, 512, 512, 3), jnp.bfloat16)
    px2 = jnp.asarray(np.full((b, 512, 512, 3), 0.1, np.float32), jnp.bfloat16)

    def make(encode_body):
        def mk(K):
            def f(vp, x):
                def step(c, _):
                    mean, logvar = encode_body(vp, c)
                    # upsample the 64^2 latent mean back to pixel space so the
                    # carry changes meaningfully (survives bf16 rounding)
                    up = jnp.repeat(jnp.repeat(mean[..., :3], 8, 1), 8, 2)
                    return c + jnp.tanh(up) * 0.3, None

                c, _ = jax.lax.scan(step, x, None, length=K)
                return jnp.sum(c.astype(jnp.float32))

            return jax.jit(f)

        return mk

    batched = lambda vp, x: vae.apply({"params": vp}, x,
                                      method=vae.encode_moments)
    permap = lambda vp, x: jax.lax.map(
        lambda xi: tuple(m[0] for m in vae.apply(
            {"params": vp}, xi[None], method=vae.encode_moments)), x)

    slope(make(batched), (vae_params, px), (vae_params, px2),
          f"encode_b{b}_batched")
    slope(make(permap), (vae_params, px), (vae_params, px2),
          f"encode_b{b}_laxmap")
    # batch-1 anchor for the linearity check
    px1 = px[:1]
    px1b = px2[:1]
    slope(make(batched), (vae_params, px1), (vae_params, px1b), "encode_b1")


if __name__ == "__main__":
    main()
