#!/usr/bin/env python
"""ControlLoRA trainer CLI.

TPU-native rebuild of the reference trainer entry point
(reference train_text_to_image_control_lora.py, see SURVEY.md §3.1). Flag names follow
the reference CLI where the concept carries over; `accelerate launch` is replaced by the
jax runtime (single process drives all local devices through the mesh; multi-host via
`jax.distributed.initialize` when JAX_COORDINATOR_ADDRESS is set).

Hermetic smoke run (no pretrained weights needed):
    python scripts/train.py --model_variant smoke --dataset_name process/fill50k \
        --resolution 64 --train_batch_size 2 --max_train_steps 10 --output_dir /tmp/run
"""

from __future__ import annotations

import argparse
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    # model
    p.add_argument("--pretrained_model_name_or_path", type=str, default=None,
                   help="local diffusers-layout dir with unet/vae/text_encoder weights")
    p.add_argument("--model_variant", type=str, default="sd15",
                   choices=["sd15", "sd21", "sdxl", "smoke", "smoke2", "smokexl"])
    p.add_argument("--control_lora_config", type=str, default="base",
                   help="preset name or reference-format JSON path")
    p.add_argument("--mixed_precision", type=str, default="bf16",
                   choices=["no", "bf16"],
                   help="compute/frozen-weight dtype (adapters always fp32)")
    p.add_argument("--adapter_compute_bf16", action="store_true",
                   help="cast the adapter pytree to bf16 for the forward/backward "
                        "(fp32 master params + optimizer state). Beyond-reference "
                        "mixed-precision mode — measured in docs/BENCHMARKS.md")
    p.add_argument("--prediction_type", type=str, default=None)
    p.add_argument("--snr_gamma", type=float, default=None)
    # data
    p.add_argument("--dataset_name", type=str, default="process/fill50k",
                   help="process/<registry name>, a hub dataset id, or a local "
                        "imagefolder directory (reference column conventions)")
    p.add_argument("--dataset_config_name", type=str, default=None)
    p.add_argument("--image_column", type=str, default=None)
    p.add_argument("--guide_column", type=str, default=None)
    p.add_argument("--caption_column", type=str, default=None)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--max_train_samples", type=int, default=None)
    # optimization (reference defaults: train:188, 209-255)
    p.add_argument("--train_batch_size", type=int, default=16, help="per-device")
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--num_train_epochs", type=int, default=100)
    p.add_argument("--max_train_steps", type=int, default=None,
                   help="overrides --num_train_epochs when set (reference "
                        "train:190-195; the reference tasks pin 30000)")
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--scale_lr", action="store_true")
    p.add_argument("--lr_scheduler", type=str, default="constant")
    p.add_argument("--lr_warmup_steps", type=int, default=0)
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_weight_decay", type=float, default=1e-2)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--use_8bit_adam", action="store_true",
                   help="block-wise int8-quantized Adam moments (reference "
                        "train:500-508 / bitsandbytes; first-party JAX impl)")
    p.add_argument("--gradient_checkpointing", action="store_true",
                   help="remat the UNet on backward (reference train:240 flag; "
                        "default OFF — at 512^2 b8 the backward fits HBM and remat "
                        "costs 1.8x, docs/BENCHMARKS.md)")
    p.add_argument("--no_remat", action="store_true",
                   help="deprecated: remat is off by default; use "
                        "--gradient_checkpointing to enable it")
    p.add_argument("--remat_policy", type=str, default="dots",
                   choices=["nothing", "dots", "dots_all"],
                   help="what the UNet remat keeps resident (see docs/BENCHMARKS.md)")
    p.add_argument("--cache_latents", action="store_true",
                   help="precompute VAE posterior moments once and skip the per-step "
                        "encode (deterministic datasets only; data/latent_cache.py)")
    p.add_argument("--latent_cache_path", type=str, default=None,
                   help="npz file to persist/load the latent cache")
    # bookkeeping
    p.add_argument("--output_dir", type=str, default="control-lora-model")
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--checkpoints_total_limit", type=int, default=None)
    p.add_argument("--no_async_checkpointing", action="store_true",
                   help="block the train loop during checkpoint saves (async "
                        "orbax background commit is the default; beyond-reference)")
    p.add_argument("--resume_from_checkpoint", type=str, default=None)
    p.add_argument("--validation_steps", type=int, default=0,
                   help="sample a validation image every N steps (0 = off)")
    p.add_argument("--validation_prompt", type=str, default=None)
    p.add_argument("--report_to", type=str, default="jsonl",
                   help="jsonl | tensorboard | wandb | comet_ml | all "
                        "(reference train:284-292)")
    p.add_argument("--push_to_hub", action="store_true",
                   help="push the final artifact to the hub (reference train:931-939)")
    p.add_argument("--hub_model_id", type=str, default=None)
    p.add_argument("--hub_token", type=str, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of steps 3..8 to "
                        "<output_dir>/profile (view with tensorboard)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax

    # Multi-host: connect processes over DCN before any backend/device access
    # (replaces the reference's `accelerate launch` env plumbing, train:293, 318-320).
    from controllora_tpu.parallel.distributed import maybe_initialize_distributed

    if maybe_initialize_distributed():
        print(f"multi-host: process {jax.process_index()}/{jax.process_count()}")

    import jax.numpy as jnp

    from controllora_tpu.config import load_config
    from controllora_tpu.data.registry import DatasetBase, batch_iterator
    from controllora_tpu.data.tokenizer import default_tokenizer
    from controllora_tpu.models.control_lora import ControlLoRA
    from controllora_tpu.models import zoo
    from controllora_tpu.parallel import make_mesh, replicate, shard_batch
    from controllora_tpu.training.checkpoint import (
        finalize_checkpoints,
        restore_train_state,
        save_control_lora,
        save_train_state,
    )
    from controllora_tpu.training.trainer import ControlLoRATrainer, make_optimizer
    from controllora_tpu.utils.logging import MetricsLogger

    dtype = jnp.bfloat16 if args.mixed_precision == "bf16" else jnp.float32
    devices = jax.devices()
    n_dev = len(devices)
    mesh = make_mesh() if n_dev > 1 else None
    is_main = jax.process_index() == 0  # gate host-side writes in multi-host runs
    print(f"devices: {n_dev} ({devices[0].platform}), mesh={'data' if mesh else None}")

    # ---- models
    unet, vae, text_encoder = zoo.build_models(args.model_variant, dtype=dtype)
    rng = jax.random.PRNGKey(args.seed)
    if args.pretrained_model_name_or_path:
        frozen = zoo.load_frozen(args.pretrained_model_name_or_path, param_dtype=dtype)
    else:
        latent = args.resolution // 8
        frozen = zoo.random_frozen(rng, unet, vae, text_encoder, latent_size=latent,
                                   param_dtype=dtype)
        print("WARNING: no --pretrained_model_name_or_path; frozen stack is random "
              "(hermetic smoke mode)")

    ccfg = load_config(args.control_lora_config)
    if args.model_variant in ("sd21", "sdxl"):
        # the reference configs hand-list SD1.5's bucket layout (768 cross dims,
        # 4 levels); re-derive for the chosen UNet family — SD2.1: 1024-d context,
        # same 32-processor layout; SDXL: 3 levels (level 0 adapter-free),
        # 2048-d context, depth-weighted 140-processor layout
        import dataclasses as _dc

        from controllora_tpu.models.unet import derive_cross_attention_dims

        n_lvl = len(unet.config.block_out_channels)
        ccfg = _dc.replace(
            ccfg,
            lora_block_out_channels=unet.config.block_out_channels,
            lora_block_in_channels=ccfg.lora_block_in_channels[:n_lvl],
            lora_control_channels=ccfg.lora_control_channels[:n_lvl],
            lora_cross_attention_dims=derive_cross_attention_dims(unet.config),
        )
    if args.model_variant.startswith("smoke"):
        from controllora_tpu.config import ControlLoRAConfig
        from controllora_tpu.models.unet import derive_cross_attention_dims

        ccfg = ControlLoRAConfig(
            block_out_channels=(8, 16, 16, 32),
            lora_block_in_channels=(32, 32, 32, 32),
            lora_block_out_channels=unet.config.block_out_channels,
            # derived, not hand-listed: adapter-slot counts must cover every UNet
            # attention layer (build_adapters hard-errors on shortfall)
            lora_cross_attention_dims=derive_cross_attention_dims(unet.config),
            lora_control_version=ccfg.lora_control_version,
        )
    # hint-encoder COMPUTE follows --mixed_precision (params stay fp32) — the
    # reference trains the whole graph under accelerate fp16 autocast (train:437-447);
    # bf16 compute here measured 309 vs 337 ms/step at 512^2 b8 (docs/BENCHMARKS.md)
    control_lora = ControlLoRA(ccfg, dtype=dtype)

    # ---- data
    tokenizer = default_tokenizer(require_clip=bool(args.pretrained_model_name_or_path))
    if args.dataset_name.startswith("process/"):
        ds_cls = DatasetBase.from_name(args.dataset_name)
        dataset = ds_cls(tokenizer, resolution=args.resolution)
        if args.max_train_samples:
            dataset.size = min(len(dataset), args.max_train_samples)
    else:
        # hub dataset / local imagefolder with (image, guide, text) columns
        # (reference train:553-566, 592-635)
        from controllora_tpu.data.hf_dataset import HFImageGuideDataset

        dataset = HFImageGuideDataset(
            tokenizer,
            dataset_name=args.dataset_name,
            dataset_config_name=args.dataset_config_name,
            resolution=args.resolution,
            image_column=args.image_column,
            guide_column=args.guide_column,
            caption_column=args.caption_column,
            seed=args.seed,
            max_train_samples=args.max_train_samples,
        )
    if args.cache_latents:
        from controllora_tpu.data.latent_cache import LatentCachedDataset

        dataset = LatentCachedDataset(
            dataset, vae, frozen["vae"], cache_path=args.latent_cache_path
        )
    global_batch = args.train_batch_size * n_dev

    # epochs ↔ steps interplay (reference train:190-195, 669-690):
    # --max_train_steps (optimizer updates) wins when given
    if args.max_train_steps is None:
        import math

        steps_per_epoch = max(math.ceil(
            len(dataset) / global_batch / args.gradient_accumulation_steps), 1)
        args.max_train_steps = args.num_train_epochs * steps_per_epoch
        print(f"training {args.num_train_epochs} epochs = "
              f"{args.max_train_steps} steps")

    lr = args.learning_rate
    if args.scale_lr:
        lr = lr * args.gradient_accumulation_steps * args.train_batch_size * n_dev
    optimizer = make_optimizer(
        learning_rate=lr,
        beta1=args.adam_beta1,
        beta2=args.adam_beta2,
        weight_decay=args.adam_weight_decay,
        eps=args.adam_epsilon,
        max_grad_norm=args.max_grad_norm,
        lr_schedule=args.lr_scheduler,
        warmup_steps=args.lr_warmup_steps,
        total_steps=args.max_train_steps,
        grad_accumulation_steps=args.gradient_accumulation_steps,
        use_8bit=args.use_8bit_adam,
    )
    trainer = ControlLoRATrainer(
        control_lora=control_lora,
        unet=unet,
        frozen=frozen,
        vae=vae,
        text_encoder=text_encoder,
        optimizer=optimizer,
        mesh=mesh,
        prediction_type=args.prediction_type,
        snr_gamma=args.snr_gamma,
        remat_unet=args.gradient_checkpointing,
        remat_policy=args.remat_policy,
        adapter_compute_dtype=jnp.bfloat16 if args.adapter_compute_bf16 else None,
    )

    # ---- state (+ resume) — restored BEFORE the data iterator exists so the stream
    # can fast-forward to start_step (reference skip_first_batches, train:745-749)
    state = trainer.init_state(jax.random.PRNGKey(args.seed), image_size=args.resolution)
    start_step = 0
    data_seed = args.seed
    meta_path = os.path.join(args.output_dir, "run_meta.json")
    if args.resume_from_checkpoint:
        where = (args.output_dir if args.resume_from_checkpoint == "latest"
                 else args.resume_from_checkpoint)
        restored, at = restore_train_state(where, state, step="latest")
        if restored is not None:
            state, start_step = restored, at
            print(f"resumed from step {at}")
            # run provenance: the RNG/data streams are pure functions of the
            # original run's seed — a resume with a different --seed must keep the
            # recorded one for step↔data reproducibility
            if os.path.exists(meta_path):
                import json as _json

                with open(meta_path) as f:
                    meta = _json.load(f)
                if meta.get("seed") != args.seed:
                    print(f"WARNING: resuming with --seed {args.seed} but the run was "
                          f"started with seed {meta['seed']}; using the recorded seed "
                          "for data order and noise streams")
                data_seed = meta.get("seed", args.seed)
                if meta.get("global_batch") not in (None, global_batch):
                    print(f"WARNING: global batch changed ({meta['global_batch']} -> "
                          f"{global_batch}); the resumed data stream will not match "
                          "the original run's")
        else:
            print("no checkpoint found; starting fresh")
    if is_main and start_step == 0:
        import json as _json

        os.makedirs(args.output_dir, exist_ok=True)
        with open(meta_path, "w") as f:
            _json.dump({"seed": args.seed, "global_batch": global_batch,
                        "dataset_name": args.dataset_name,
                        "resolution": args.resolution}, f)

    batches = None
    if not args.cache_latents:
        # native C data plane + background prefetch: full fill50k synthesis in C
        # (11x the python batcher at 512^2), or batched C normalize for any
        # dataset exposing uint8 samples (HF adapter)
        from controllora_tpu.data.fastloader import (
            NativeFill50kBatcher,
            NativeNormalizeBatcher,
            Prefetcher,
            native_available,
        )

        if native_available():
            if args.dataset_name == "process/fill50k":
                batches = iter(Prefetcher(
                    iter(NativeFill50kBatcher(dataset, global_batch, seed=data_seed,
                                              start_step=start_step))
                ))
                print("using native fastloader data plane")
            elif hasattr(dataset, "getitem_u8"):
                batches = iter(Prefetcher(
                    iter(NativeNormalizeBatcher(dataset, global_batch,
                                                seed=data_seed,
                                                start_step=start_step))
                ))
                print("using native batch-normalize data plane")
    if batches is None:
        batches = batch_iterator(dataset, global_batch, seed=data_seed,
                                 start_step=start_step)

    if mesh is not None:
        state = replicate(state, mesh)
        trainer.frozen = replicate(trainer.frozen, mesh)

    train_step = trainer.make_train_step()
    logger = MetricsLogger(args.output_dir, args.report_to, enabled=is_main)
    run_key = jax.random.PRNGKey(data_seed + 1)

    # in-training validation sampling (reference train:816-861): render a guided
    # sample from a fixed dataset item every --validation_steps
    val_pipe = None
    if args.validation_steps:
        from controllora_tpu.pipelines import StableDiffusionControlLoRAPipeline

        # the montage needs pixel_values — unwrap a latent-cached dataset
        val_item = (dataset.dataset if hasattr(dataset, "dataset") else dataset)[0]
        val_pipe = StableDiffusionControlLoRAPipeline(
            unet, vae, text_encoder, tokenizer, frozen, control_lora, None,
        )

    def run_validation(step, params):
        import numpy as _np

        val_pipe.control_params = jax.device_get(params)
        img = val_pipe(
            args.validation_prompt or "validation sample",
            guide=val_item["guide_values"].astype(np.float32),
            num_inference_steps=25,
            guidance_scale=9.0,
            rng=jax.random.PRNGKey(args.seed),
            return_array=True,
        )[0]
        montage = DatasetBase.cat_input(
            val_item["pixel_values"], val_item["guide_values"], img
        )
        logger.log_image(step, "validation", montage)
        print(f"validation image at step {step}")

    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"ControlLoRA params: {n_params/1e6:.2f}M | global batch {global_batch} | lr {lr}")

    last_saved = {"step": start_step if args.resume_from_checkpoint else -1}

    def save_checkpoint(at_step):
        last_saved["step"] = at_step
        ckpt_path = save_train_state(args.output_dir, at_step,
                                     jax.device_get(state),
                                     keep=args.checkpoints_total_limit,
                                     wait=args.no_async_checkpointing)
        # each checkpoint also carries the reference-format adapter artifact so
        # eval can sample any mid-training step without reconstructing optimizer
        # state (the reference eval loads checkpoints and re-saves weights,
        # test_text_to_image_control_lora.py:706-731)
        save_control_lora(os.path.join(ckpt_path, "control_lora"),
                          jax.device_get(state).params, ccfg,
                          formats=("safetensors",))
        print(f"saved checkpoint-{at_step}", flush=True)

    # Preemption-safe shutdown (beyond-reference; SURVEY §5: the reference has no
    # failure handling beyond resume-latest). SIGTERM/SIGINT — what a TPU-VM
    # maintenance event or batch scheduler delivers — requests a graceful stop:
    # the loop finishes the in-flight step, saves a resumable checkpoint-<step>,
    # and exits 0 so a supervisor relaunch with `--resume_from_checkpoint latest`
    # continues the run exactly (data-stream fast-forward included). A second
    # signal aborts immediately.
    stop = {"sig": None}

    def _request_stop(signum, frame):
        if stop["sig"] is not None:
            raise KeyboardInterrupt(f"second signal {signum}; aborting")
        stop["sig"] = signum
        print(f"received {signal.Signals(signum).name}; checkpointing and exiting "
              "after the current step", flush=True)

    prev_handlers = {s: signal.signal(s, _request_stop)
                     for s in (signal.SIGTERM, signal.SIGINT)}

    t_last = time.time()
    for step in range(start_step, args.max_train_steps):
        if args.profile and step == start_step + 3:
            jax.profiler.start_trace(os.path.join(args.output_dir, "profile"))
        if args.profile and step == start_step + 8:
            jax.profiler.stop_trace()
            print(f"profiler trace written to {args.output_dir}/profile")
        batch = next(batches)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        step_rng = jax.random.fold_in(run_key, step)
        if mesh is not None:
            step_rng = replicate(step_rng, mesh)
        state, metrics = train_step(state, batch, step_rng)

        if (step + 1) % args.log_every == 0:
            loss = float(metrics["loss"])
            dt = (time.time() - t_last) / args.log_every
            t_last = time.time()
            logger.log(step + 1, {
                "train_loss": loss,
                "grad_norm": float(metrics["grad_norm"]),
                "steps_per_sec": 1.0 / max(dt, 1e-9),
                "imgs_per_sec": global_batch / max(dt, 1e-9),
            })
            print(f"step {step+1}: loss={loss:.4f} {1.0/max(dt,1e-9):.2f} steps/s")

        if (is_main and args.checkpointing_steps
                and (step + 1) % args.checkpointing_steps == 0):
            save_checkpoint(step + 1)

        if (is_main and val_pipe is not None
                and (step + 1) % args.validation_steps == 0):
            run_validation(step + 1, state.params)

        if stop["sig"] is not None:
            if is_main and last_saved["step"] != step + 1:
                save_checkpoint(step + 1)
            finalize_checkpoints()
            logger.close()
            for s, h in prev_handlers.items():
                signal.signal(s, h)
            print(f"preempted at step {step + 1}; relaunch with "
                  "--resume_from_checkpoint latest to continue", flush=True)
            return

    for s, h in prev_handlers.items():
        signal.signal(s, h)
    finalize_checkpoints()  # drain any in-flight async checkpoint save
    # final artifact (reference train:922-929)
    if not is_main:
        logger.close()
        return
    save_control_lora(args.output_dir, jax.device_get(state).params, ccfg)
    # model card (reference save_model_card, train:54-81)
    with open(os.path.join(args.output_dir, "README.md"), "w") as f:
        f.write(
            f"""---
license: creativeml-openrail-m
base_model: {args.pretrained_model_name_or_path or 'runwayml/stable-diffusion-v1-5'}
tags: [stable-diffusion, controllora, control-lora, jax, tpu]
---
# ControlLoRA — {os.path.basename(args.output_dir)}

ControlLoRA adapter trained with controllora_tpu (JAX/TPU) on `{args.dataset_name}`
at {args.resolution}px for {args.max_train_steps} steps (lr {args.learning_rate},
global batch {global_batch}, config `{args.control_lora_config}`).
Load with `controllora_tpu.training.checkpoint.load_control_lora` or the PyTorch
reference's `ControlLoRA.from_pretrained`.
"""
        )
    print(f"saved final ControlLoRA to {args.output_dir}")
    if args.push_to_hub:
        from controllora_tpu.utils.hub import push_to_hub

        url = push_to_hub(args.output_dir, repo_id=args.hub_model_id,
                          token=args.hub_token)
        print(f"pushed to {url}")
    logger.close()


if __name__ == "__main__":
    main()
