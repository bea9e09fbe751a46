#!/usr/bin/env python
"""768² serving pass (apps' slider max): full guided sampler at 768², batch 1.

Round-1 measurement: 1368 ms → 0.73 img/s/chip (old 512-block kernels, eager
chain mixing). This re-measures with the round-2 stack: 1024-block flash
(L=9216 tiles), head-dim-aware VAE mid-attn blocks, in-graph chain mixing,
scalar fencing. Same chained methodology as bench.py.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from controllora_tpu.config import get_preset
    from controllora_tpu.models.control_lora import ControlLoRA
    from controllora_tpu.models.unet import UNet2DConditionModel, UNetConfig
    from controllora_tpu.models.vae import AutoencoderKL, VAEConfig, decode_per_image
    from controllora_tpu.models.zoo import cast_tree
    from controllora_tpu.ops.folding import fold_adapters
    from controllora_tpu.schedulers import DPMSolverMultistepScheduler

    res = int(sys.argv[1]) if len(sys.argv) > 1 else 768
    lh = res // 8
    dtype = jnp.bfloat16
    unet = UNet2DConditionModel(UNetConfig(), dtype=dtype)
    vae = AutoencoderKL(VAEConfig(), dtype=dtype)
    control = ControlLoRA(get_preset("base"), dtype=dtype)

    t0 = time.time()
    unet_params = cast_tree(
        jax.jit(unet.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 4), jnp.bfloat16),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768), dtype)
        )["params"], dtype)
    vae_params = cast_tree(
        jax.jit(vae.init)(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))["params"],
        dtype)
    control_params = control.init(jax.random.PRNGKey(2), image_size=res)
    print(f"init: {time.time()-t0:.1f}s", file=sys.stderr)

    steps = 20
    sch = DPMSolverMultistepScheduler()
    tables = sch.tables(steps)
    ts = tables[0]
    guide = jnp.zeros((1, res, res, 3), jnp.float32)
    ctx = jnp.zeros((2, 77, 768), dtype)

    def sample(unet_params, vae_params, control_params, lat0, ctx, guide, gscale):
        lat0 = jnp.tanh(lat0)
        adapters = control(control_params, guide, unet.config)
        up, adapters = fold_adapters(unet_params, adapters)
        state = sch.init_state(lat0)

        def body(state, i):
            lat2 = jnp.concatenate([state.sample, state.sample], 0).astype(dtype)
            t = jnp.broadcast_to(ts[i], (2,))
            eps = unet.apply({"params": up}, lat2, t, ctx, adapters)
            eu, ec = jnp.split(eps, 2, 0)
            return sch.step(state, eu + gscale * (ec - eu), i, steps, tables), None

        state, _ = jax.lax.scan(body, state, jnp.arange(steps))
        img = decode_per_image(vae, vae_params, state.sample)
        return img, state.sample, jnp.sum(img.astype(jnp.float32))

    fn = jax.jit(sample)
    lat0 = jnp.zeros((1, lh, lh, 4), jnp.float32)
    t0 = time.time()
    img, lat, chk = fn(unet_params, vae_params, control_params, lat0, ctx, guide,
                       jnp.float32(9.0))
    float(chk)
    print(f"compile+first {time.time()-t0:.1f}s out {img.shape}", file=sys.stderr)
    n = 5
    t0 = time.time()
    lat_in = lat0
    for _ in range(n):
        img, lat, chk = fn(unet_params, vae_params, control_params, lat_in, ctx,
                           guide, jnp.float32(9.0))
        lat_in = lat
    float(chk)
    dt = (time.time() - t0) / n
    print(json.dumps({
        "metric": f"images/sec/chip ({res}^2, 20-step CFG, batch 1)",
        "ms_per_image": round(dt * 1000, 1),
        "value": round(1.0 / dt, 3),
    }))


if __name__ == "__main__":
    main()
