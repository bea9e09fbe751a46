#!/usr/bin/env python
"""DreamBooth-LoRA trainer CLI — the reference's train_dreambooth_lora.py equivalent
(SURVEY.md §3.4): per-layer plain LoRA fine-tune with optional prior preservation;
artifacts saved in diffusers attn-procs format (loadable by `unet.load_attn_procs`).

Smoke run:
    python scripts/train_dreambooth.py --model_variant smoke \
        --instance_data_dir <dir-with-images> --instance_prompt "a sks toy" \
        --resolution 64 --max_train_steps 5 --output_dir /tmp/db
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained_model_name_or_path", type=str, default=None)
    p.add_argument("--model_variant", type=str, default="sd15", choices=["sd15", "smoke"])
    p.add_argument("--instance_data_dir", type=str, required=True)
    p.add_argument("--instance_prompt", type=str, required=True)
    p.add_argument("--class_data_dir", type=str, default=None)
    p.add_argument("--class_prompt", type=str, default=None)
    p.add_argument("--with_prior_preservation", action="store_true")
    p.add_argument("--prior_loss_weight", type=float, default=1.0)
    p.add_argument("--num_class_images", type=int, default=100)
    p.add_argument("--lora_rank", type=int, default=4)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--center_crop", action="store_true")
    p.add_argument("--train_batch_size", type=int, default=1)
    p.add_argument("--max_train_steps", type=int, default=500)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--mixed_precision", type=str, default="bf16", choices=["no", "bf16"])
    p.add_argument("--output_dir", type=str, default="dreambooth-lora")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--sample_class_images", action="store_true",
                   help="generate missing class images with the base pipeline "
                        "(reference train_dreambooth_lora.py:580-637)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from controllora_tpu.data.dreambooth import DreamBoothDataset
    from controllora_tpu.data.registry import batch_iterator
    from controllora_tpu.data.tokenizer import default_tokenizer
    from controllora_tpu.models import zoo
    from controllora_tpu.parallel import make_mesh, replicate, shard_batch
    from controllora_tpu.training.dreambooth import DreamBoothLoRATrainer
    from controllora_tpu.training.trainer import make_optimizer
    from controllora_tpu.utils.logging import MetricsLogger
    from controllora_tpu.utils.torch_compat import attn_procs_to_torch, save_state_dict

    dtype = jnp.bfloat16 if args.mixed_precision == "bf16" else jnp.float32
    n_dev = len(jax.devices())
    mesh = make_mesh() if n_dev > 1 else None

    unet, vae, text_encoder = zoo.build_models(args.model_variant, dtype=dtype)
    rng = jax.random.PRNGKey(args.seed)
    if args.pretrained_model_name_or_path:
        frozen = zoo.load_frozen(args.pretrained_model_name_or_path, param_dtype=dtype)
    else:
        frozen = zoo.random_frozen(rng, unet, vae, text_encoder,
                                   latent_size=args.resolution // 8, param_dtype=dtype)
        print("WARNING: random frozen stack (hermetic smoke mode)")

    tokenizer = default_tokenizer(require_clip=bool(args.pretrained_model_name_or_path))

    if args.with_prior_preservation and args.sample_class_images:
        # generate class images with the frozen base (reference :580-637)
        from controllora_tpu.pipelines import StableDiffusionControlLoRAPipeline

        os.makedirs(args.class_data_dir, exist_ok=True)
        existing = len(os.listdir(args.class_data_dir))
        if existing < args.num_class_images:
            pipe = StableDiffusionControlLoRAPipeline(
                unet, vae, text_encoder, tokenizer, frozen
            )
            from PIL import Image

            k = jax.random.PRNGKey(args.seed)
            for i in range(existing, args.num_class_images):
                k, sub = jax.random.split(k)
                img = pipe(args.class_prompt, num_inference_steps=25,
                           height=args.resolution, width=args.resolution, rng=sub)[0]
                Image.fromarray(img).save(
                    os.path.join(args.class_data_dir, f"class-{i}.png"))
            print(f"generated {args.num_class_images - existing} class images")

    dataset = DreamBoothDataset(
        tokenizer,
        instance_data_dir=args.instance_data_dir,
        instance_prompt=args.instance_prompt,
        class_data_dir=args.class_data_dir if args.with_prior_preservation else None,
        class_prompt=args.class_prompt if args.with_prior_preservation else None,
        resolution=args.resolution,
        center_crop=args.center_crop,
        seed=args.seed,
    )
    batches = batch_iterator(dataset, args.train_batch_size * n_dev, seed=args.seed)

    trainer = DreamBoothLoRATrainer(
        unet=unet, frozen=frozen, vae=vae, text_encoder=text_encoder,
        rank=args.lora_rank,
        optimizer=make_optimizer(learning_rate=args.learning_rate),
        mesh=mesh,
        with_prior_preservation=args.with_prior_preservation,
        prior_loss_weight=args.prior_loss_weight,
    )
    state = trainer.init_state(jax.random.PRNGKey(args.seed))
    if mesh is not None:
        state = replicate(state, mesh)
        trainer.frozen = replicate(trainer.frozen, mesh)
    step_fn = trainer.make_train_step()
    logger = MetricsLogger(args.output_dir)
    run_key = jax.random.PRNGKey(args.seed + 1)
    t_last = time.time()

    for step in range(args.max_train_steps):
        raw = next(batches)
        if args.with_prior_preservation:
            batch = {
                "pixel_values": np.concatenate(
                    [raw["pixel_values"], raw["class_pixel_values"]]),
                "input_ids": np.concatenate([raw["input_ids"], raw["class_input_ids"]]),
            }
        else:
            batch = {"pixel_values": raw["pixel_values"], "input_ids": raw["input_ids"]}
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        step_rng = jax.random.fold_in(run_key, step)
        if mesh is not None:
            step_rng = replicate(step_rng, mesh)
        state, metrics = step_fn(state, batch, step_rng)
        if (step + 1) % args.log_every == 0:
            dt = (time.time() - t_last) / args.log_every
            t_last = time.time()
            logger.log(step + 1, {"train_loss": float(metrics["loss"]),
                                  "steps_per_sec": 1.0 / max(dt, 1e-9)})
            print(f"step {step+1}: loss={float(metrics['loss']):.4f}")

    # save in diffusers attn-procs format (reference :987-994)
    os.makedirs(args.output_dir, exist_ok=True)
    params = jax.device_get(state).params
    sd = attn_procs_to_torch(params)
    save_state_dict(sd, os.path.join(args.output_dir, "pytorch_lora_weights.safetensors"))
    save_state_dict(sd, os.path.join(args.output_dir, "pytorch_lora_weights.bin"))
    print(f"saved LoRA weights to {args.output_dir}")
    logger.close()


if __name__ == "__main__":
    main()
