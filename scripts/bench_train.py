#!/usr/bin/env python
"""Training-throughput benchmark: fused train step (full SD1.5 frozen stack + base
ControlLoRA) at 512², chained-dependency timing. Secondary headline next to bench.py's
serving metric (BASELINE.md: train steps/sec/chip)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch_size: int = 8, steps: int = 8):
    import jax
    import jax.numpy as jnp

    from controllora_tpu.config import get_preset
    from controllora_tpu.models import zoo
    from controllora_tpu.models.control_lora import ControlLoRA
    from controllora_tpu.training.trainer import ControlLoRATrainer, make_optimizer

    dtype = jnp.bfloat16
    unet, vae, text_encoder = zoo.build_models("sd15", dtype=dtype)
    t0 = time.time()
    frozen = zoo.random_frozen(jax.random.PRNGKey(0), unet, vae, text_encoder,
                               latent_size=64, param_dtype=dtype)
    control = ControlLoRA(get_preset("base"), dtype=dtype)
    trainer = ControlLoRATrainer(
        control_lora=control, unet=unet, frozen=frozen, vae=vae,
        text_encoder=text_encoder, optimizer=make_optimizer(), remat_unet=False,
    )
    state = trainer.init_state(jax.random.PRNGKey(1), image_size=512)
    print(f"init {time.time()-t0:.1f}s", file=sys.stderr)

    batch = {
        "pixel_values": jnp.zeros((batch_size, 512, 512, 3), jnp.float32),
        "guide_values": jnp.zeros((batch_size, 512, 512, 3), jnp.float32),
        "input_ids": jnp.zeros((batch_size, 77), jnp.int32),
    }
    step_fn = trainer.make_train_step()
    rng = jax.random.PRNGKey(2)

    t0 = time.time()
    state, metrics = step_fn(state, batch, rng)
    print(f"compile+first {time.time()-t0:.1f}s loss={float(metrics['loss']):.3f}",
          file=sys.stderr)

    # chained: state dependency forces sequential execution; rngs pre-materialized
    # (an eager fold_in inside the loop costs a tunnel round trip per step) and
    # the fence is a scalar fetch — docs/BENCHMARKS.md "measurement traps"
    rngs = [jax.block_until_ready(jax.random.fold_in(rng, i)) for i in range(steps)]
    t0 = time.time()
    for i in range(steps):
        state, metrics = step_fn(state, batch, rngs[i])
    float(metrics["loss"])
    dt = (time.time() - t0) / steps
    print(json.dumps({
        "metric": "train steps/sec/chip (SD1.5+ControlLoRA base, 512^2, "
                  f"batch {batch_size}, no-remat, bf16 hint)",
        "value": round(1.0 / dt, 4),
        "unit": "steps/sec",
        "imgs_per_sec": round(batch_size / dt, 3),
        "step_ms": round(dt * 1000, 1),
    }))


if __name__ == "__main__":
    main(batch_size=int(sys.argv[1]) if len(sys.argv) > 1 else 8)
