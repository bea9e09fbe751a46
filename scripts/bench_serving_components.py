#!/usr/bin/env python
"""Serving-step cost attribution: one UNet CFG eval (folded path), VAE decode,
hint-encode+fold — at batch 1 and batch 4. Slope-method timing (in-graph scan
K1/K2 reps, data-dependent carry; see bench_flash_blocks.py) so tunnel dispatch
caching and async overlap cannot lie. Use to localize serving regressions.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K1, K2 = 2, 10


def slope(make, args, args2, name):
    import jax

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
    sys.stdout.flush()


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from controllora_tpu.config import get_preset
    from controllora_tpu.models.control_lora import ControlLoRA
    from controllora_tpu.models.unet import UNet2DConditionModel, UNetConfig
    from controllora_tpu.models.vae import AutoencoderKL, VAEConfig
    from controllora_tpu.models.zoo import cast_tree
    from controllora_tpu.ops.folding import fold_adapters

    dtype = jnp.bfloat16
    unet = UNet2DConditionModel(UNetConfig(), dtype=dtype)
    vae = AutoencoderKL(VAEConfig(), dtype=dtype)
    control = ControlLoRA(get_preset("base"), dtype=dtype)

    lat1 = jnp.zeros((1, 64, 64, 4), jnp.bfloat16)
    ctx1 = jnp.zeros((2, 77, 768), dtype)
    guide = jnp.zeros((1, 512, 512, 3), jnp.float32)

    t0 = time.time()
    unet_params = cast_tree(
        jax.jit(unet.init)(jax.random.PRNGKey(0), lat1, jnp.zeros((1,), jnp.int32),
                           ctx1[:1])["params"], dtype)
    vae_params = cast_tree(
        jax.jit(vae.init)(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))["params"],
        dtype)
    control_params = control.init(jax.random.PRNGKey(2), image_size=512)
    print(f"init {time.time()-t0:.1f}s", file=sys.stderr)

    # hint encode + fold (runs once per sampler call)
    def make_fold(K):
        def f(up, cp, g):
            def step(c, _):
                adapters = control(cp, c[1], unet.config)
                fup, fad = fold_adapters(c[0], adapters)
                mix = 1e-6 * jnp.mean(jax.tree.leaves(fad)[0].q_bias
                                      if hasattr(jax.tree.leaves(fad)[0], "q_bias")
                                      else 0.0)
                return (c[0], c[1] + mix), None

            c, _ = jax.lax.scan(step, (up, g), None, length=K)
            return c[1]

        return jax.jit(f)

    g2 = jnp.asarray(np.full((1, 512, 512, 3), 0.05, np.float32))
    slope(make_fold, (unet_params, control_params, guide),
          (unet_params, control_params, g2), "hint_encode+fold")

    # folded CFG UNet eval + VAE decode per image batch
    for nimg in (1, 4):
        lat = jnp.zeros((nimg, 64, 64, 4), jnp.bfloat16)
        lat_b = jnp.asarray(np.full((nimg, 64, 64, 4), 0.1, np.float32), jnp.bfloat16)
        ctx = jnp.zeros((2 * nimg, 77, 768), dtype)
        t = jnp.zeros((2 * nimg,), jnp.int32)

        adapters = control(control_params, guide, unet.config)
        fup, fad = jax.jit(lambda up, ad: fold_adapters(up, ad))(unet_params, adapters)

        def make_unet(K, nimg=nimg, fad=fad, ctx=ctx, t=t):
            def f(up, lat):
                def step(c, _):
                    lat2 = jnp.concatenate([c, c], 0)
                    eps = unet.apply({"params": up}, lat2, t, ctx, fad)
                    eu, ec = jnp.split(eps, 2, 0)
                    return c + 1e-3 * (eu + 9.0 * (ec - eu)).astype(c.dtype), None

                c, _ = jax.lax.scan(step, lat, None, length=K)
                return c

            return jax.jit(f)

        slope(make_unet, (fup, lat), (fup, lat_b), f"unet_cfg_eval_b{nimg}")

        def make_dec(K, nimg=nimg):
            def f(vp, z):
                def step(c, _):
                    img = vae.apply({"params": vp}, c, method=vae.decode)
                    return c + 1e-3 * jnp.mean(img).astype(c.dtype), None

                c, _ = jax.lax.scan(step, z, None, length=K)
                return c

            return jax.jit(f)

        slope(make_dec, (vae_params, lat), (vae_params, lat_b), f"vae_decode_b{nimg}")


if __name__ == "__main__":
    main()
