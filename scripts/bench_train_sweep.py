#!/usr/bin/env python
"""Training-step performance attribution + variant sweep (VERDICT r1 item 2).

Measures, on the real chip with chained-dependency timing:
  1. component costs: VAE encode / CLIP / hint encode / UNet fwd / fwd+bwd
  2. full-train-step variants: remat policy x hint-encoder compute dtype

Prints one JSON line per measurement to stdout (diagnostics on stderr).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch_size=8, steps=6):
    import jax
    import jax.numpy as jnp

    from controllora_tpu.config import get_preset
    from controllora_tpu.models import zoo
    from controllora_tpu.models.control_lora import ControlLoRA
    from controllora_tpu.training.trainer import ControlLoRATrainer, make_optimizer

    dtype = jnp.bfloat16
    unet, vae, text_encoder = zoo.build_models("sd15", dtype=dtype)
    frozen = zoo.random_frozen(jax.random.PRNGKey(0), unet, vae, text_encoder,
                               latent_size=64, param_dtype=dtype)
    px = jnp.zeros((batch_size, 512, 512, 3), jnp.float32)
    ids = jnp.zeros((batch_size, 77), jnp.int32)
    rng = jax.random.PRNGKey(2)

    # ---------------------------------------------------------------- full steps
    # (per-component attribution lives in scripts/bench_components.py — its
    # scan-based methodology is safe against the tunnel's dispatch caching)
    pixel_batch = {"pixel_values": px, "guide_values": px, "input_ids": ids}
    latent_batch = {
        "latent_mean": jnp.zeros((batch_size, 64, 64, 4), jnp.float32),
        "latent_logvar": jnp.zeros((batch_size, 64, 64, 4), jnp.float32),
        "guide_values": px,
        "input_ids": ids,
    }
    variants = [
        ("remat-nothing_hint-fp32", dict(remat_unet=True, remat_policy="nothing"), jnp.float32, False),
        ("remat-dots_hint-fp32", dict(remat_unet=True, remat_policy="dots"), jnp.float32, False),
        ("noremat_hint-fp32", dict(remat_unet=False), jnp.float32, False),
        ("noremat_hint-bf16", dict(remat_unet=False), jnp.bfloat16, False),
        ("remat-dots_hint-bf16", dict(remat_unet=True, remat_policy="dots"), jnp.bfloat16, False),
        ("noremat_hint-bf16_cached-latents", dict(remat_unet=False), jnp.bfloat16, True),
        ("remat-dots_hint-bf16_cached-latents", dict(remat_unet=True, remat_policy="dots"), jnp.bfloat16, True),
        # VERDICT r2 #8: the first-party block-wise int8 Adam on-chip
        ("noremat_hint-bf16_adam8bit", dict(remat_unet=False, use_8bit=True),
         jnp.bfloat16, False),
        ("noremat_hint-bf16_cached-latents_adam8bit",
         dict(remat_unet=False, use_8bit=True), jnp.bfloat16, True),
        # VERDICT r4 #3: bf16 adapter COMPUTE over fp32 masters
        # (--adapter_compute_bf16): every lora/control matmul joins the frozen
        # stack on the bf16 MXU path instead of fp32 at quarter rate
        ("noremat_hint-bf16_adapter-bf16",
         dict(remat_unet=False, adapter_compute_dtype=jnp.bfloat16),
         jnp.bfloat16, False),
        ("noremat_hint-bf16_cached-latents_adapter-bf16",
         dict(remat_unet=False, adapter_compute_dtype=jnp.bfloat16),
         jnp.bfloat16, True),
    ]
    only = os.environ.get("SWEEP_ONLY", "")
    for name, kw, hdt, use_latents in variants:
        if only and only not in name:
            continue
        kw = dict(kw)
        use_8bit = kw.pop("use_8bit", False)
        batch = latent_batch if use_latents else pixel_batch
        control = ControlLoRA(get_preset("base"), dtype=hdt)
        trainer = ControlLoRATrainer(
            control_lora=control, unet=unet, frozen=frozen, vae=vae,
            text_encoder=text_encoder,
            optimizer=make_optimizer(use_8bit=use_8bit), **kw)
        state = trainer.init_state(jax.random.PRNGKey(1), image_size=512)
        step_fn = trainer.make_train_step()
        try:
            t0 = time.time()
            state, m = step_fn(state, batch, rng)
            jax.block_until_ready(m["loss"])
            print(f"  {name}: compile+first {time.time()-t0:.1f}s", file=sys.stderr)
            # pre-derive step keys: eager fold_in inside the timed loop would add
            # a host->tunnel round trip per step and inflate the measurement
            rngs = [jax.block_until_ready(jax.random.fold_in(rng, i))
                    for i in range(steps)]
            t0 = time.time()
            for i in range(steps):
                state, m = step_fn(state, batch, rngs[i])
            jax.block_until_ready(m["loss"])
            dt = (time.time() - t0) / steps
            print(json.dumps({
                "variant": name, "batch": batch_size,
                "step_ms": round(dt * 1000, 1),
                "steps_per_sec": round(1.0 / dt, 3),
                "imgs_per_sec": round(batch_size / dt, 2),
            }))
        except Exception as e:  # OOM etc — record and continue
            print(json.dumps({"variant": name, "error": str(e)[:200]}))
        sys.stdout.flush()


if __name__ == "__main__":
    main(batch_size=int(sys.argv[1]) if len(sys.argv) > 1 else 8)
