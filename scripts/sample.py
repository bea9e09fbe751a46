#!/usr/bin/env python
"""Guided-sampling eval CLI — the reference's test_text_to_image_control_lora.py
equivalent: load a trained ControlLoRA, render N guided samples from a dataset as
3-panel montages (target | guide | sample) under samples/<run>/ (reference
test_text_to_image_control_lora.py:772-789, process/base.py:27-38).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained_model_name_or_path", type=str, default=None)
    p.add_argument("--model_variant", type=str, default="sd15",
                   choices=["sd15", "sd21", "sdxl", "smoke", "smoke2", "smokexl"])
    p.add_argument("--control_lora_dir", type=str, default=None,
                   help="directory with config.json + diffusion_pytorch_model.safetensors")
    p.add_argument("--resume_from_checkpoint", type=str, default=None,
                   help="'latest' or a step number: sample from a mid-training "
                        "checkpoint-N under --control_lora_dir (a training "
                        "output_dir) and re-save the final-format artifact there — "
                        "the reference eval's checkpoint path "
                        "(test_text_to_image_control_lora.py:706-731)")
    p.add_argument("--lora_weights", type=str, default=None,
                   help="DreamBooth attn-procs LoRA: a pytorch_lora_weights.safetensors "
                        "file or a training output_dir (combine with "
                        "--resume_from_checkpoint to sample a mid-training step and "
                        "re-save the run-root artifact, reference "
                        "test_dreambooth_lora.py:824-851). Composes with a ControlLoRA")
    p.add_argument("--prompt", type=str, default=None,
                   help="fixed prompt (required for --lora_weights-only sampling)")
    p.add_argument("--dataset_name", type=str, default="process/fill50k")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--num_validation_images", type=int, default=4)
    p.add_argument("--num_inference_steps", type=int, default=30)
    p.add_argument("--scheduler", type=str, default="dpm++",
                   choices=["dpm++", "ddim", "pndm", "euler", "unipc"])
    p.add_argument("--guidance_scale", type=float, default=9.0)
    p.add_argument("--init_image", type=str, default=None,
                   help="img2img: path to an init image (resized to --resolution)")
    p.add_argument("--strength", type=float, default=0.8,
                   help="img2img repaint strength in [0,1]: fraction of the "
                        "schedule actually run")
    p.add_argument("--mask_image", type=str, default=None,
                   help="inpainting: grayscale mask path, white = repaint "
                        "(requires --init_image)")
    p.add_argument("--prediction_type", type=str, default="epsilon",
                   choices=["epsilon", "v_prediction"],
                   help="v_prediction for SD2.x-style checkpoints")
    p.add_argument("--refiner_variant", type=str, default=None,
                   choices=["sdxl-refiner", "smokeref"],
                   help="two-stage SDXL render: the base model runs "
                        "[0, denoising_split) and the refiner continues the "
                        "trajectory to the end (ensemble of experts)")
    p.add_argument("--refiner_model_path", type=str, default=None,
                   help="diffusers-layout checkpoint dir for the refiner "
                        "(random weights if omitted, like the base)")
    p.add_argument("--denoising_split", type=float, default=0.8,
                   help="base/refiner handoff point as a schedule fraction")
    p.add_argument("--aesthetic_score", type=float, default=6.0)
    p.add_argument("--negative_aesthetic_score", type=float, default=2.5)
    p.add_argument("--tome_ratio", type=float, default=0.0,
                   help="token-merging ratio (ops/tome.py; 0 = exact path, "
                        "0.5 = published speed/quality sweet spot at 512^2)")
    p.add_argument("--deepcache_interval", type=int, default=1,
                   help="DeepCache: deep UNet levels run every N-th step, "
                        "cached in between (1 = exact path; 2-3 = published "
                        "speed/quality range; composes with --tome_ratio)")
    p.add_argument("--serving_mesh", type=str, default=None,
                   help="multi-chip serving axes, e.g. 'data' (shard the image "
                        "batch), 'cfg' (split the guidance pair, halves batch-1 "
                        "latency on 2 chips), 'cfg,model=2' (additionally "
                        "tensor-parallel the UNet transformer blocks — "
                        "parallel/tp.py). Since this script renders one image "
                        "per call, prefer the latency axes (cfg/model); a "
                        "'data' axis requires the batch to divide across it")
    p.add_argument("--output_dir", type=str, default="samples/run")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def build_serving_mesh(spec):
    """--serving_mesh 'data'|'cfg'|'cfg,model=K'|'data,cfg,model=K' -> Mesh|None.

    With 'data' listed, spare devices fall to the data axis ('data,cfg,model=2'
    on a v5e-8 = data 2 × cfg 2 × model 2 — needs the batch to divide by 2).
    Without it, only the latency axes claim devices (data stays 1), so the
    one-image-per-call eval loop shards without batch constraints."""
    if not spec:
        return None
    import jax

    from controllora_tpu.parallel import make_mesh, make_serving_mesh

    cfg, model, saw_data = False, 1, False
    for t in (t.strip() for t in spec.split(",") if t.strip()):
        if t == "data":
            saw_data = True
        elif t == "cfg":
            cfg = True
        elif t.startswith("model="):
            model = int(t.split("=", 1)[1])
        elif t == "model":
            model = 2
        else:
            raise SystemExit(f"unknown serving mesh axis {t!r} "
                             "(want data | cfg | model=K)")
    if not cfg and model == 1:
        return make_mesh()  # pure data-parallel
    devices = None
    if not saw_data:
        need = (2 if cfg else 1) * model
        avail = jax.devices()
        if len(avail) < need:
            raise SystemExit(
                f"serving mesh '{spec}' needs {need} devices, have {len(avail)}")
        devices = avail[:need]
    return make_serving_mesh(devices=devices, cfg=cfg, model=model)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from controllora_tpu.data.registry import DatasetBase
    from controllora_tpu.data.tokenizer import default_tokenizer
    from controllora_tpu.models import zoo
    from controllora_tpu.models.control_lora import ControlLoRA
    from controllora_tpu.pipelines import StableDiffusionControlLoRAPipeline
    from controllora_tpu.training.checkpoint import load_control_lora

    dtype = jnp.bfloat16 if args.model_variant in ("sd15", "sd21", "sdxl") else jnp.float32
    unet, vae, text_encoder = zoo.build_models(args.model_variant, dtype=dtype)
    rng = jax.random.PRNGKey(args.seed)
    if args.pretrained_model_name_or_path:
        frozen = zoo.load_frozen(args.pretrained_model_name_or_path, param_dtype=dtype)
    else:
        frozen = zoo.random_frozen(rng, unet, vae, text_encoder,
                                   latent_size=args.resolution // 8, param_dtype=dtype)
        print("WARNING: random frozen stack (no pretrained weights)")

    tokenizer = default_tokenizer(require_clip=bool(args.pretrained_model_name_or_path))

    def resolve_checkpoint(run_dir):
        """--resume_from_checkpoint 'latest'|N -> (step, checkpoint dir)."""
        from controllora_tpu.training.checkpoint import checkpoint_step_dirs

        dirs = checkpoint_step_dirs(run_dir)
        if not dirs:
            raise SystemExit(f"no checkpoint-* under {run_dir}")
        if args.resume_from_checkpoint == "latest":
            return dirs[-1]
        match = {s: p for s, p in dirs}
        step_num = int(args.resume_from_checkpoint)
        if step_num not in match:
            raise SystemExit(f"checkpoint-{step_num} not found; have {sorted(match)}")
        return step_num, match[step_num]

    control_lora = control_params = None
    load_dir = args.control_lora_dir
    if args.control_lora_dir and args.resume_from_checkpoint:
        step_num, ckpt = resolve_checkpoint(args.control_lora_dir)
        load_dir = os.path.join(ckpt, "control_lora")
        print(f"sampling from training checkpoint-{step_num}")
    if args.control_lora_dir:
        control_params, ccfg = load_control_lora(load_dir)
        if args.resume_from_checkpoint:
            # re-save the final-format artifact at the run root, like the
            # reference eval (test_text_to_image_control_lora.py:727-731)
            from controllora_tpu.training.checkpoint import save_control_lora

            save_control_lora(args.control_lora_dir, control_params, ccfg)
            print(f"re-saved final artifact to {args.control_lora_dir}")
        if (args.model_variant.startswith("smoke")
                and ccfg.lora_block_out_channels != unet.config.block_out_channels):
            raise SystemExit("checkpoint was not trained against the smoke UNet")
        control_lora = ControlLoRA(ccfg, dtype=dtype)  # bf16 inference hint encoding
    extra_loras = None
    if args.lora_weights:
        from controllora_tpu.models.lora import AdapterSpec, AttnAdapter
        from controllora_tpu.utils.torch_compat import (
            attn_procs_from_torch,
            load_state_dict,
            save_state_dict,
        )

        lw = args.lora_weights
        if os.path.isdir(lw):
            # a DreamBooth training output_dir: resolve the artifact, optionally
            # from a mid-training checkpoint (the reference eval loads
            # --resume_from_checkpoint and re-saves the run-root weights,
            # test_dreambooth_lora.py:824-851)
            run_dir = lw
            if args.resume_from_checkpoint and not args.control_lora_dir:
                step_num, ckpt = resolve_checkpoint(run_dir)
                lw = os.path.join(ckpt, "pytorch_lora_weights.safetensors")
                print(f"sampling LoRA from training checkpoint-{step_num}")
            else:
                lw = os.path.join(run_dir, "pytorch_lora_weights.safetensors")
        sd = load_state_dict(lw)
        if os.path.isdir(args.lora_weights) and lw != os.path.join(
                args.lora_weights, "pytorch_lora_weights.safetensors"):
            for fname in ("pytorch_lora_weights.safetensors",
                          "pytorch_lora_weights.bin"):
                save_state_dict(sd, os.path.join(args.lora_weights, fname))
            print(f"re-saved final artifact to {args.lora_weights}")
        spec = AdapterSpec(kind="lora")
        extra_loras = {
            name: AttnAdapter(params=p, spec=spec)
            for name, p in attn_procs_from_torch(sd).items()
        }
        print(f"loaded {len(extra_loras)} plain LoRA adapters")
    if control_lora is None and extra_loras is None:
        raise SystemExit("need --control_lora_dir and/or --lora_weights")

    from controllora_tpu.schedulers import (
        DDIMScheduler, DPMSolverMultistepScheduler, EulerDiscreteScheduler,
        PNDMScheduler, UniPCMultistepScheduler,
    )

    from controllora_tpu.schedulers.common import DiffusionSchedule

    schedule = DiffusionSchedule.create(prediction_type=args.prediction_type)
    scheduler = {"dpm++": DPMSolverMultistepScheduler, "ddim": DDIMScheduler,
                 "pndm": PNDMScheduler, "euler": EulerDiscreteScheduler,
                 "unipc": UniPCMultistepScheduler}[args.scheduler](schedule)
    mesh = build_serving_mesh(args.serving_mesh)
    if mesh is not None:
        print(f"serving mesh: {dict(mesh.shape)}")
    pipe = StableDiffusionControlLoRAPipeline(
        unet, vae, text_encoder, tokenizer, frozen, control_lora, control_params,
        scheduler=scheduler, mesh=mesh,
    )

    # two-stage SDXL ensemble: a second pipeline continues the base trajectory
    refiner_pipe = None
    if args.refiner_variant:
        if args.mask_image:
            raise SystemExit(
                "--refiner_variant with --mask_image is unsupported: the refiner "
                "stage would repaint the preserved region"
            )
        r_unet, r_vae, r_text = zoo.build_models(args.refiner_variant, dtype=dtype)
        if args.refiner_model_path:
            r_frozen = zoo.load_frozen(args.refiner_model_path, param_dtype=dtype)
        else:
            r_frozen = zoo.random_frozen(
                jax.random.PRNGKey(args.seed + 1), r_unet, r_vae, r_text,
                latent_size=args.resolution // 8, param_dtype=dtype)
            print("WARNING: random frozen refiner (no pretrained weights)")
        refiner_pipe = StableDiffusionControlLoRAPipeline(
            r_unet, r_vae, r_text, tokenizer, r_frozen,
            scheduler=scheduler, mesh=mesh,
        )
        print(f"two-stage render: base [0, {args.denoising_split}) -> refiner")

    def render(prompt, k, return_array=False, **kw):
        kw.setdefault("tome_ratio", args.tome_ratio)
        kw.setdefault("deepcache_interval", args.deepcache_interval)
        if refiner_pipe is None:
            return pipe(prompt, rng=k, return_array=return_array, **kw)[0]
        lat = pipe(prompt, rng=k, denoising_end=args.denoising_split,
                   return_latents=True, **kw)[0]
        return refiner_pipe(
            prompt,
            latents=jnp.asarray(lat)[None],
            num_inference_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale,
            denoising_start=args.denoising_split,
            aesthetic_score=args.aesthetic_score,
            negative_aesthetic_score=args.negative_aesthetic_score,
            rng=k, return_array=return_array,
        )[0]

    os.makedirs(args.output_dir, exist_ok=True)
    sample_rng = jax.random.PRNGKey(args.seed)

    # img2img / inpainting inputs (beyond-reference; pipeline docstring)
    init_image = mask_arr = None
    if args.init_image:
        im = Image.open(args.init_image).convert("RGB").resize(
            (args.resolution, args.resolution), Image.BICUBIC)
        init_image = np.asarray(im, np.float32) / 127.5 - 1.0
    if args.mask_image:
        mm = Image.open(args.mask_image).convert("L").resize(
            (args.resolution, args.resolution), Image.BICUBIC)
        mask_arr = np.asarray(mm, np.float32) / 255.0
    paint_kwargs = dict(image=init_image, strength=args.strength, mask=mask_arr)

    if control_lora is None:
        # plain-LoRA sampling (reference test_dreambooth_lora.py:824-888)
        for i in range(args.num_validation_images):
            sample_rng, k = jax.random.split(sample_rng)
            img = render(
                args.prompt or f"sample {i}", k,
                num_inference_steps=args.num_inference_steps,
                guidance_scale=args.guidance_scale,
                height=args.resolution, width=args.resolution,
                extra_loras=extra_loras, **paint_kwargs,
            )
            Image.fromarray(img).save(os.path.join(args.output_dir, f"{i}.png"))
            print(f"wrote {args.output_dir}/{i}.png")
        return

    ds_cls = DatasetBase.from_name(args.dataset_name)
    dataset = ds_cls(tokenizer, resolution=args.resolution)

    for i in range(args.num_validation_images):
        item = dataset[i]
        caption = args.prompt or f"sample {i}"
        sample_rng, k = jax.random.split(sample_rng)
        img = render(
            caption, k,
            guide=item["guide_values"].astype(np.float32),
            num_inference_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale,
            return_array=True,
            extra_loras=extra_loras,
            **paint_kwargs,
        )
        montage = DatasetBase.cat_input(item["pixel_values"], item["guide_values"], img)
        Image.fromarray(montage).save(os.path.join(args.output_dir, f"{i}.png"))
        print(f"wrote {args.output_dir}/{i}.png")


if __name__ == "__main__":
    main()
