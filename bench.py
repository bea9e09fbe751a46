#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "train_steps_per_sec_chip": N, "train_imgs_per_sec_chip": N,
   "train_cached_steps_per_sec_chip": N, "train_cached_imgs_per_sec_chip": N,
   "train_batch": N}

Headline metric (BASELINE.json): images/sec/chip — SD1.5 + ControlLoRA guided sampling,
512², 20-step CFG, DPM-Solver++ 2M. The driver-set serving target is >=2 images/sec/chip
on v5e; `vs_baseline` = value / 2.0. Weights are random (no pretrained checkpoints in
this container) — throughput is weight-agnostic. The train_* fields carry the secondary
BASELINE target (train steps/sec/chip, 512² batch 8, encode-per-step, best measured
config: no remat + bf16 hint compute — see docs/BENCHMARKS.md).

Measurement methodology: N sampler invocations are CHAINED (each consumes the previous
output as its initial latents), so asynchronous dispatch cannot overlap or hide latency;
one block_until_ready at the end. Batch-1 (app latency) and batch-4 (serving) configs
are measured on the folded + fused-kernel path and the better throughput is reported.

Diagnostics go to stderr; stdout carries exactly one JSON line.
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
    from controllora_tpu.ops.folding import fold_adapters
    from controllora_tpu.schedulers import DPMSolverMultistepScheduler

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    dtype = jnp.bfloat16
    unet = UNet2DConditionModel(UNetConfig(), dtype=dtype)
    vae = AutoencoderKL(VAEConfig(), dtype=dtype)
    # bf16 hint encoding for inference (+16% at batch 1; fp32 is the
    # reference TRAINING policy — adapters still train fp32)
    control = ControlLoRA(get_preset("base"), dtype=dtype)

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

    def make_sampler(nimg: int):
        def sample(unet_params, vae_params, control_params, lat0, ctx, guide, gscale):
            # in-graph chain mixing: each bench call feeds the previous call's
            # latents back in; tanh re-normalizes INSIDE the jit (an eager host-side
            # op here would add a full tunnel round trip per call — see
            # docs/BENCHMARKS.md "measurement traps")
            lat0 = jnp.tanh(lat0)
            adapters = control(control_params, guide, unet.config)
            up, adapters = fold_adapters(unet_params, adapters)
            state = sch.init_state(lat0)

            def body(state, i):
                lat2 = jnp.concatenate([state.sample, state.sample], 0).astype(dtype)
                t = jnp.broadcast_to(ts[i], (2 * nimg,))
                eps = unet.apply({"params": up}, lat2, t, ctx, adapters)
                eu, ec = jnp.split(eps, 2, 0)
                return sch.step(state, eu + gscale * (ec - eu), i, steps, tables), None

            state, _ = jax.lax.scan(body, state, jnp.arange(steps))
            from controllora_tpu.models.vae import decode_per_image

            img = decode_per_image(vae, vae_params, state.sample)
            # return the image, latents for chaining, and an in-graph checksum:
            # float(checksum) is the only reliable execution fence on the remote
            # tunnel (block_until_ready does not fence; an eager reduce would add
            # a full round trip) — docs/BENCHMARKS.md "measurement traps"
            return img, state.sample, jnp.sum(img.astype(jnp.float32))

        return jax.jit(sample)

    results = {}
    n = 6
    # batch 1 = the apps' per-sample latency config; batch 4 = serving throughput
    # (BENCH_NIMGS env overrides, e.g. BENCH_NIMGS=8 for batch exploration)
    nimgs = tuple(int(x) for x in os.environ.get("BENCH_NIMGS", "1,4").split(","))
    for nimg in nimgs:
        fn = make_sampler(nimg)
        lat0 = jnp.zeros((nimg, 64, 64, 4), jnp.float32)
        ctx = jnp.zeros((2 * nimg, 77, 768), dtype)
        t0 = time.time()
        img, lat, chk = fn(unet_params, vae_params, control_params, lat0, ctx,
                           guide, jnp.float32(9.0))
        float(chk)
        print(f"batch{nimg}: compile+first {time.time()-t0:.1f}s out {img.shape}",
              file=sys.stderr)
        t0 = time.time()
        lat_in = lat0
        for _ in range(n):
            img, lat, chk = fn(unet_params, vae_params, control_params,
                               lat_in, ctx, guide, jnp.float32(9.0))
            lat_in = lat  # chain: next call depends on this output (device-resident)
        float(chk)  # scalar fetch = execution fence
        dt = (time.time() - t0) / n
        results[nimg] = nimg / dt
        print(f"batch{nimg}: {dt*1000:.1f} ms -> {nimg/dt:.3f} img/s/chip",
              file=sys.stderr)

    best = max(results.values())
    del unet_params, vae_params, control_params  # free HBM for the training stack

    # ---- training metric (BASELINE secondary target): fused train step at 512^2,
    # best measured config (no remat, bf16 hint compute), encode-per-step.
    from controllora_tpu.models import zoo
    from controllora_tpu.training.trainer import ControlLoRATrainer, make_optimizer

    tb = 8
    t_unet, t_vae, t_text = zoo.build_models("sd15", dtype=dtype)
    t_frozen = zoo.random_frozen(jax.random.PRNGKey(0), t_unet, t_vae, t_text,
                                 latent_size=64, param_dtype=dtype)
    trainer = ControlLoRATrainer(
        control_lora=ControlLoRA(get_preset("base"), dtype=dtype),
        unet=t_unet, vae=t_vae, text_encoder=t_text, frozen=t_frozen,
        optimizer=make_optimizer(), remat_unet=False,
    )
    tstate = trainer.init_state(jax.random.PRNGKey(1), image_size=512)
    batch = {
        "pixel_values": jnp.zeros((tb, 512, 512, 3), jnp.float32),
        "guide_values": jnp.zeros((tb, 512, 512, 3), jnp.float32),
        "input_ids": jnp.zeros((tb, 77), jnp.int32),
    }
    step_fn = trainer.make_train_step()
    rng = jax.random.PRNGKey(2)
    t0 = time.time()
    tstate, m = step_fn(tstate, batch, rng)
    float(m["loss"])  # scalar fetch = execution fence (see serving note above)
    print(f"train: compile+first {time.time()-t0:.1f}s", file=sys.stderr)
    rngs = [jax.block_until_ready(jax.random.fold_in(rng, i)) for i in range(6)]
    t0 = time.time()
    for i in range(6):
        tstate, m = step_fn(tstate, batch, rngs[i])  # state-chained: serializes
    float(m["loss"])
    tdt = (time.time() - t0) / 6
    print(f"train: {tdt*1000:.1f} ms/step -> {1/tdt:.2f} steps/s "
          f"({tb/tdt:.1f} img/s)", file=sys.stderr)

    # cached-latents config (--cache_latents): precomputed VAE posterior moments
    # replace the per-step encode — the deterministic-dataset fast path
    cbatch = {
        "latent_mean": jnp.zeros((tb, 64, 64, 4), jnp.float32),
        "latent_logvar": jnp.zeros((tb, 64, 64, 4), jnp.float32),
        "guide_values": batch["guide_values"],
        "input_ids": batch["input_ids"],
    }
    t0 = time.time()
    tstate, m = step_fn(tstate, cbatch, rng)
    float(m["loss"])
    print(f"train(cached): compile+first {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    for i in range(6):
        tstate, m = step_fn(tstate, cbatch, rngs[i])
    float(m["loss"])
    cdt = (time.time() - t0) / 6
    print(f"train(cached): {cdt*1000:.1f} ms/step -> {1/cdt:.2f} steps/s "
          f"({tb/cdt:.1f} img/s)", file=sys.stderr)

    # Training anchor (BASELINE.md: "≥3× A100 steps/sec/chip"). Preference order:
    # a MEASURED reference number (BASELINE_TORCH.json, produced by
    # scripts/bench_reference_torch.py in a GPU reference environment), else the
    # documented public-report estimate — fp16+xformers SD1.5 adapter training at
    # 512^2 b8 clusters around 2–3 it/s on A100 (docs/BENCHMARKS.md), midpoint 2.5.
    anchor_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE_TORCH.json")
    if os.path.exists(anchor_path):
        with open(anchor_path) as f:
            ref = json.load(f)
        anchor = float(ref["steps_per_sec"])
        provenance = f"measured ({ref.get('device', 'reference GPU')})"
    else:
        anchor = 2.5
        provenance = ("public-report estimate, A100 fp16+xformers 512^2 b8 "
                      "(docs/BENCHMARKS.md); replace via "
                      "scripts/bench_reference_torch.py")

    print(json.dumps({
        "metric": "images/sec/chip (SD1.5+ControlLoRA, 512^2, 20-step CFG)",
        "value": round(best, 4),
        "unit": "images/sec",
        "vs_baseline": round(best / 2.0, 4),
        "train_steps_per_sec_chip": round(1.0 / tdt, 3),
        "train_imgs_per_sec_chip": round(tb / tdt, 2),
        "train_cached_steps_per_sec_chip": round(1.0 / cdt, 3),
        "train_cached_imgs_per_sec_chip": round(tb / cdt, 2),
        "train_batch": tb,
        # ratio vs the ANCHOR (A100 steps/s); the BASELINE target is 3.0x
        "train_vs_baseline": round((1.0 / tdt) / anchor, 3),
        "train_baseline_anchor_steps_per_sec": anchor,
        "train_baseline_provenance": provenance,
    }))


if __name__ == "__main__":
    main()
