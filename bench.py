#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json): images/sec/chip — SD1.5 + ControlLoRA, 512², 20-step
CFG guided sampling. The driver-set serving target is >=2 images/sec/chip on v5e;
`vs_baseline` reports value/2.0. Weights are random (no pretrained checkpoints in this
container) — throughput is weight-agnostic.

Extra metrics (train steps/sec/chip) go to stderr; stdout carries exactly one line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from controllora_tpu.config import get_preset
    from controllora_tpu.models.control_lora import ControlLoRA
    from controllora_tpu.models.unet import UNet2DConditionModel, UNetConfig
    from controllora_tpu.models.vae import AutoencoderKL, VAEConfig
    from controllora_tpu.models.zoo import cast_tree
    from controllora_tpu.schedulers import DPMSolverMultistepScheduler

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    dtype = jnp.bfloat16
    unet = UNet2DConditionModel(UNetConfig(), dtype=dtype)
    vae = AutoencoderKL(VAEConfig(), dtype=dtype)
    control = ControlLoRA(get_preset("base"), dtype=jnp.float32)

    latents0 = jnp.zeros((1, 64, 64, 4), jnp.float32)
    ctx2 = jnp.zeros((2, 77, 768), dtype)
    guide = jnp.zeros((1, 512, 512, 3), jnp.float32)

    t0 = time.time()
    unet_params = cast_tree(
        jax.jit(unet.init)(
            jax.random.PRNGKey(0), latents0, jnp.zeros((1,), jnp.int32), ctx2[:1]
        )["params"],
        dtype,
    )
    # decoder only (encode not needed for sampling)
    vae_params = cast_tree(
        jax.jit(vae.init)(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))["params"],
        dtype,
    )
    control_params = control.init(jax.random.PRNGKey(2), image_size=512)
    print(f"init: {time.time()-t0:.1f}s", file=sys.stderr)

    steps = 20
    sch = DPMSolverMultistepScheduler()
    tables = sch.tables(steps)
    ts = tables[0]

    def sample(unet_params, vae_params, control_params, lat0, ctx, guide, gscale):
        from controllora_tpu.ops.folding import fold_adapters

        adapters = control(control_params, guide, unet.config)
        unet_params, adapters = fold_adapters(unet_params, adapters)
        state = sch.init_state(lat0)

        def body(state, i):
            lat2 = jnp.concatenate([state.sample, state.sample], axis=0).astype(dtype)
            t = jnp.broadcast_to(ts[i], (2,))
            eps = unet.apply({"params": unet_params}, lat2, t, ctx, adapters)
            eps_u, eps_c = jnp.split(eps, 2, axis=0)
            eps_g = eps_u + gscale * (eps_c - eps_u)
            return sch.step(state, eps_g, i, steps, tables), None

        state, _ = jax.lax.scan(body, state, jnp.arange(steps))
        return vae.apply({"params": vae_params}, state.sample, method=vae.decode)

    fn = jax.jit(sample)
    args = (unet_params, vae_params, control_params, latents0, ctx2, guide,
            jnp.float32(9.0))

    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    print(f"compile+first run: {time.time()-t0:.1f}s, out {out.shape}", file=sys.stderr)

    n = 5
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    ips = 1.0 / dt
    print(f"sample latency: {dt*1000:.1f} ms -> {ips:.3f} img/s", file=sys.stderr)

    print(json.dumps({
        "metric": "images/sec/chip (SD1.5+ControlLoRA, 512^2, 20-step CFG)",
        "value": round(ips, 4),
        "unit": "images/sec",
        "vs_baseline": round(ips / 2.0, 4),
    }))


if __name__ == "__main__":
    main()
