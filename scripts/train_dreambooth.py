#!/usr/bin/env python
"""DreamBooth-LoRA trainer CLI — the reference's train_dreambooth_lora.py equivalent
(SURVEY.md §3.4): per-layer plain LoRA fine-tune with optional prior preservation;
artifacts saved in diffusers attn-procs format (loadable by `unet.load_attn_procs`).

Full reference CLI surface (train_dreambooth_lora.py:116-384): epochs/steps
interplay, mid-training checkpointing + resume, lr schedules incl.
cosine_with_restarts/polynomial (`--lr_num_cycles`/`--lr_power`, reference
:790-796), gradient accumulation, 8-bit Adam, per-epoch validation sampling
(:940-963) and a final inference pass (:997-1027). Step accounting follows the
reference: `--max_train_steps` counts OPTIMIZER updates; with
`--gradient_accumulation_steps N` each update consumes N micro-batches
(accelerator.sync_gradients, reference :913-924).

Smoke run:
    python scripts/train_dreambooth.py --model_variant smoke \
        --instance_data_dir <dir-with-images> --instance_prompt "a sks toy" \
        --resolution 64 --max_train_steps 5 --output_dir /tmp/db
"""

from __future__ import annotations

import argparse
import math
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    # model
    p.add_argument("--pretrained_model_name_or_path", type=str, default=None)
    p.add_argument("--model_variant", type=str, default="sd15",
                   choices=["sd15", "sd21", "sdxl", "smoke", "smoke2", "smokexl"])
    p.add_argument("--lora_rank", type=int, default=4)
    p.add_argument("--mixed_precision", type=str, default="bf16", choices=["no", "bf16"])
    # data
    p.add_argument("--instance_data_dir", type=str, required=True)
    p.add_argument("--instance_prompt", type=str, required=True)
    p.add_argument("--class_data_dir", type=str, default=None)
    p.add_argument("--class_prompt", type=str, default=None)
    p.add_argument("--with_prior_preservation", action="store_true")
    p.add_argument("--prior_loss_weight", type=float, default=1.0)
    p.add_argument("--num_class_images", type=int, default=100)
    p.add_argument("--sample_class_images", action="store_true",
                   help="generate missing class images with the base pipeline "
                        "(reference train_dreambooth_lora.py:580-637)")
    p.add_argument("--sample_batch_size", type=int, default=4,
                   help="batch size for class-image generation (reference :229)")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--center_crop", action="store_true")
    # optimization (reference defaults :226-324)
    p.add_argument("--train_batch_size", type=int, default=1, help="per-device")
    p.add_argument("--num_train_epochs", type=int, default=1)
    p.add_argument("--max_train_steps", type=int, default=None,
                   help="optimizer updates; overrides --num_train_epochs when set")
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--gradient_checkpointing", action="store_true",
                   help="remat the UNet on backward (reference :274-277)")
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--scale_lr", action="store_true")
    p.add_argument("--lr_scheduler", type=str, default="constant",
                   choices=["constant", "constant_with_warmup", "linear", "cosine",
                            "cosine_with_restarts", "polynomial"])
    p.add_argument("--lr_warmup_steps", type=int, default=500)
    p.add_argument("--lr_num_cycles", type=int, default=1,
                   help="hard restarts in cosine_with_restarts (reference :303-307)")
    p.add_argument("--lr_power", type=float, default=1.0,
                   help="polynomial schedule power (reference :308)")
    p.add_argument("--use_8bit_adam", action="store_true",
                   help="block-wise int8-quantized Adam moments (reference :318; "
                        "first-party JAX impl, training/adam8bit.py)")
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_weight_decay", type=float, default=1e-2)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    # bookkeeping
    p.add_argument("--output_dir", type=str, default="dreambooth-lora")
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--checkpoints_total_limit", type=int, default=None)
    p.add_argument("--resume_from_checkpoint", type=str, default=None,
                   help="'latest' or a path; restores optimizer state and "
                        "fast-forwards the data stream (reference :846-867)")
    p.add_argument("--validation_prompt", type=str, default=None)
    p.add_argument("--num_validation_images", type=int, default=4)
    p.add_argument("--validation_epochs", type=int, default=50,
                   help="sample every N epochs (reference :176-183)")
    p.add_argument("--report_to", type=str, default="jsonl",
                   help="jsonl | tensorboard | wandb | comet_ml | all")
    p.add_argument("--push_to_hub", action="store_true")
    p.add_argument("--hub_model_id", type=str, default=None)
    p.add_argument("--hub_token", type=str, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--log_every", type=int, default=10)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax

    from controllora_tpu.parallel.distributed import maybe_initialize_distributed

    if maybe_initialize_distributed():
        print(f"multi-host: process {jax.process_index()}/{jax.process_count()}")

    import jax.numpy as jnp

    from controllora_tpu.data.dreambooth import DreamBoothDataset
    from controllora_tpu.data.registry import batch_iterator
    from controllora_tpu.data.tokenizer import default_tokenizer
    from controllora_tpu.models import zoo
    from controllora_tpu.models.lora import AttnAdapter
    from controllora_tpu.parallel import make_mesh, replicate, shard_batch
    from controllora_tpu.training.checkpoint import (
        finalize_checkpoints,
        restore_train_state,
        save_train_state,
    )
    from controllora_tpu.training.dreambooth import DreamBoothLoRATrainer
    from controllora_tpu.training.trainer import make_optimizer
    from controllora_tpu.utils.logging import MetricsLogger
    from controllora_tpu.utils.torch_compat import attn_procs_to_torch, save_state_dict

    dtype = jnp.bfloat16 if args.mixed_precision == "bf16" else jnp.float32
    n_dev = len(jax.devices())
    mesh = make_mesh() if n_dev > 1 else None
    is_main = jax.process_index() == 0
    accum = max(args.gradient_accumulation_steps, 1)

    unet, vae, text_encoder = zoo.build_models(args.model_variant, dtype=dtype)
    rng = jax.random.PRNGKey(args.seed)
    if args.pretrained_model_name_or_path:
        frozen = zoo.load_frozen(args.pretrained_model_name_or_path, param_dtype=dtype)
    else:
        frozen = zoo.random_frozen(rng, unet, vae, text_encoder,
                                   latent_size=args.resolution // 8, param_dtype=dtype)
        print("WARNING: random frozen stack (hermetic smoke mode)")

    tokenizer = default_tokenizer(require_clip=bool(args.pretrained_model_name_or_path))

    def build_pipeline():
        from controllora_tpu.pipelines import StableDiffusionControlLoRAPipeline

        return StableDiffusionControlLoRAPipeline(
            unet, vae, text_encoder, tokenizer, frozen
        )

    if args.with_prior_preservation and args.sample_class_images:
        # generate missing class images with the frozen base (reference :580-637)
        os.makedirs(args.class_data_dir, exist_ok=True)
        existing = len(os.listdir(args.class_data_dir))
        if existing < args.num_class_images and is_main:
            from PIL import Image

            pipe = build_pipeline()
            k = jax.random.PRNGKey(args.seed)
            i = existing
            while i < args.num_class_images:
                k, sub = jax.random.split(k)
                n = min(args.sample_batch_size, args.num_class_images - i)
                imgs = pipe(args.class_prompt, num_images=n, num_inference_steps=25,
                            height=args.resolution, width=args.resolution, rng=sub)
                for img in imgs:
                    Image.fromarray(img).save(
                        os.path.join(args.class_data_dir, f"class-{i}.png"))
                    i += 1
            print(f"generated {i - existing} class images")

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
    global_batch = args.train_batch_size * n_dev

    # epochs ↔ steps interplay (reference :825-833): an epoch is one pass over the
    # instance images; max_train_steps (updates) wins when given
    steps_per_epoch = max(math.ceil(len(dataset) / global_batch / accum), 1)
    max_steps = args.max_train_steps or args.num_train_epochs * steps_per_epoch

    lr = args.learning_rate
    if args.scale_lr:
        lr = lr * accum * args.train_batch_size * n_dev
    trainer = DreamBoothLoRATrainer(
        unet=unet, frozen=frozen, vae=vae, text_encoder=text_encoder,
        rank=args.lora_rank,
        optimizer=make_optimizer(
            learning_rate=lr,
            beta1=args.adam_beta1,
            beta2=args.adam_beta2,
            weight_decay=args.adam_weight_decay,
            eps=args.adam_epsilon,
            max_grad_norm=args.max_grad_norm,
            lr_schedule=args.lr_scheduler,
            warmup_steps=args.lr_warmup_steps,
            total_steps=max_steps,
            grad_accumulation_steps=accum,
            use_8bit=args.use_8bit_adam,
            num_cycles=args.lr_num_cycles,
            power=args.lr_power,
        ),
        mesh=mesh,
        with_prior_preservation=args.with_prior_preservation,
        prior_loss_weight=args.prior_loss_weight,
        remat_unet=args.gradient_checkpointing,
    )
    state = trainer.init_state(jax.random.PRNGKey(args.seed))

    # ---- resume (reference :846-867): restore params+optimizer, fast-forward data
    start_step = 0
    if args.resume_from_checkpoint:
        where = (args.output_dir if args.resume_from_checkpoint == "latest"
                 else args.resume_from_checkpoint)
        restored, at = restore_train_state(where, state, step="latest")
        if restored is not None:
            state, start_step = restored, at
            print(f"resumed from step {at}")
        else:
            print("no checkpoint found; starting fresh")

    batches = batch_iterator(dataset, global_batch, seed=args.seed,
                             start_step=start_step * accum)

    if mesh is not None:
        state = replicate(state, mesh)
        trainer.frozen = replicate(trainer.frozen, mesh)
    step_fn = trainer.make_train_step()
    logger = MetricsLogger(args.output_dir, args.report_to, enabled=is_main)
    run_key = jax.random.PRNGKey(args.seed + 1)

    def current_loras(params):
        host = jax.device_get(params)
        return {k: AttnAdapter(params=p, spec=trainer._specs[k])
                for k, p in host.items()}

    def run_validation(tag, at, params, n_images):
        # per-epoch / final validation (reference :940-963, :1007-1013): render
        # n images from the current LoRA composed onto the frozen UNet
        pipe = build_pipeline()
        extra = current_loras(params)
        k = jax.random.PRNGKey(args.seed)
        for i in range(n_images):
            k, sub = jax.random.split(k)
            img = pipe(args.validation_prompt, num_inference_steps=25,
                       height=args.resolution, width=args.resolution, rng=sub,
                       extra_loras=extra)[0]
            logger.log_image(at, f"{tag}_{i}", img)
        print(f"{tag}: {n_images} images at step {at}")

    def save_lora(out_dir, params, formats=("safetensors", "bin")):
        # diffusers attn-procs format (reference :987-994)
        os.makedirs(out_dir, exist_ok=True)
        sd = attn_procs_to_torch(jax.device_get(params))
        if "safetensors" in formats:
            save_state_dict(sd, os.path.join(out_dir, "pytorch_lora_weights.safetensors"))
        if "bin" in formats:
            save_state_dict(sd, os.path.join(out_dir, "pytorch_lora_weights.bin"))

    last_saved = {"step": start_step if args.resume_from_checkpoint else -1}

    def save_checkpoint(at_step):
        last_saved["step"] = at_step
        path = save_train_state(args.output_dir, at_step, jax.device_get(state),
                                keep=args.checkpoints_total_limit)
        # each checkpoint carries the loadable attn-procs artifact so
        # `sample.py --lora_weights <ckpt>/pytorch_lora_weights.safetensors`
        # works mid-training (same contract as the ControlLoRA trainer)
        save_lora(path, state.params, formats=("safetensors",))
        print(f"saved checkpoint-{at_step}", flush=True)

    # preemption-safe shutdown, same contract as scripts/train.py
    stop = {"sig": None}

    def _request_stop(signum, frame):
        if stop["sig"] is not None:
            raise KeyboardInterrupt(f"second signal {signum}; aborting")
        stop["sig"] = signum
        print(f"received {signal.Signals(signum).name}; checkpointing and exiting "
              "after the current step", flush=True)

    prev_handlers = {s: signal.signal(s, _request_stop)
                     for s in (signal.SIGTERM, signal.SIGINT)}

    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"LoRA params: {n_params/1e6:.2f}M | global batch {global_batch} | "
          f"lr {lr} | {max_steps} updates ({steps_per_epoch}/epoch)")
    t_last = time.time()
    seen_epochs = set()

    for micro in range(start_step * accum, max_steps * accum):
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
        step_rng = jax.random.fold_in(run_key, micro)
        if mesh is not None:
            step_rng = replicate(step_rng, mesh)
        state, metrics = step_fn(state, batch, step_rng)

        if (micro + 1) % accum:
            continue  # mid-accumulation micro-batch; no optimizer update yet
        step = (micro + 1) // accum

        if step % args.log_every == 0:
            dt = (time.time() - t_last) / args.log_every / accum
            t_last = time.time()
            logger.log(step, {"train_loss": float(metrics["loss"]),
                              "steps_per_sec": 1.0 / max(dt * accum, 1e-9)})
            print(f"step {step}: loss={float(metrics['loss']):.4f}")

        if is_main and args.checkpointing_steps and step % args.checkpointing_steps == 0:
            save_checkpoint(step)

        # reference validates at the END of each epoch with epoch % N == 0
        # (0-indexed, so the first epoch validates too; reference :940)
        epoch = step // steps_per_epoch - 1
        if (is_main and args.validation_prompt and step % steps_per_epoch == 0
                and epoch % max(args.validation_epochs, 1) == 0
                and epoch not in seen_epochs):
            seen_epochs.add(epoch)
            run_validation("validation", step, state.params,
                           args.num_validation_images)

        if stop["sig"] is not None:
            if is_main and last_saved["step"] != step:
                save_checkpoint(step)
            finalize_checkpoints()
            logger.close()
            for s, h in prev_handlers.items():
                signal.signal(s, h)
            print(f"preempted at step {step}; relaunch with "
                  "--resume_from_checkpoint latest to continue", flush=True)
            return

    for s, h in prev_handlers.items():
        signal.signal(s, h)
    finalize_checkpoints()
    if not is_main:
        logger.close()
        return

    # final artifact (reference :985-994) + final inference pass (:997-1013)
    save_lora(args.output_dir, state.params)
    print(f"saved LoRA weights to {args.output_dir}")
    if args.validation_prompt and args.num_validation_images > 0:
        run_validation("test", max_steps, state.params, args.num_validation_images)
    if args.push_to_hub:
        from controllora_tpu.utils.hub import push_to_hub

        url = push_to_hub(args.output_dir, repo_id=args.hub_model_id,
                          token=args.hub_token)
        print(f"pushed to {url}")
    logger.close()


if __name__ == "__main__":
    main()
