#!/usr/bin/env python
"""Canny-to-image demo app — reference apps/gradio_canny2image.py equivalent.

Serves a gradio UI when gradio is installed; otherwise runs a one-shot CLI
(`--input image.png --prompt "..."`). The processing pipeline reproduces the reference
`process()` exactly (apps/gradio_canny2image.py:66-92): resize to a x64 multiple at the
chosen resolution, Canny with threshold sliders, **BGR flip of the guide** (a reference
quirk preserved for checkpoint parity — training data was not flipped, the app guide
is), [-1,1] normalize, CFG sampling per sample.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_processor(args):
    import jax

    from controllora_tpu.annotators import CannyDetector, HWC3, resize_image
    from controllora_tpu.data.tokenizer import default_tokenizer
    from controllora_tpu.models import zoo
    from controllora_tpu.models.control_lora import ControlLoRA
    from controllora_tpu.pipelines import StableDiffusionControlLoRAPipeline
    from controllora_tpu.training.checkpoint import load_control_lora
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.model_variant == "sd15" else jnp.float32
    unet, vae, text_encoder = zoo.build_models(args.model_variant, dtype=dtype)
    if args.pretrained_model_name_or_path:
        frozen = zoo.load_frozen(args.pretrained_model_name_or_path, param_dtype=dtype)
    else:
        frozen = zoo.random_frozen(
            jax.random.PRNGKey(0), unet, vae, text_encoder, latent_size=8,
            param_dtype=dtype,
        )
        print("WARNING: random frozen stack (no pretrained weights)")
    control_params, ccfg = load_control_lora(args.control_lora_dir)
    pipe = StableDiffusionControlLoRAPipeline(
        unet, vae, text_encoder, default_tokenizer(require_clip=bool(args.pretrained_model_name_or_path)), frozen,
        ControlLoRA(ccfg, dtype=dtype), control_params,
    )
    apply_canny = CannyDetector()

    def process(input_image, prompt, a_prompt, n_prompt, num_samples,
                image_resolution, ddim_steps, scale, seed, eta,
                low_threshold, high_threshold):
        img = resize_image(HWC3(np.asarray(input_image)), image_resolution)
        detected_map = apply_canny(img, low_threshold, high_threshold)
        detected_map = HWC3(detected_map)
        # reference quirk: BGR-flip the guide before the hint encoder (apps:74)
        control = detected_map[:, :, ::-1].astype(np.float32) / 127.5 - 1.0
        results = pipe(
            prompt + ", " + a_prompt if a_prompt else prompt,
            guide=control,
            negative_prompt=n_prompt,
            num_inference_steps=ddim_steps,
            guidance_scale=scale,
            num_images=num_samples,
            rng=__import__("jax").random.PRNGKey(seed),
        )
        return [255 - detected_map] + results

    return process


DEFAULTS = dict(
    a_prompt="best quality, extremely detailed",
    n_prompt="longbody, lowres, bad anatomy, bad hands, missing fingers, "
             "extra digit, fewer digits, cropped, worst quality, low quality",
    num_samples=1, image_resolution=512, ddim_steps=20, scale=9.0, seed=42,
    eta=0.0, low_threshold=100, high_threshold=200,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained_model_name_or_path", type=str, default=None)
    p.add_argument("--model_variant", type=str, default="sd15", choices=["sd15", "smoke"])
    p.add_argument("--control_lora_dir", type=str, required=True)
    p.add_argument("--input", type=str, default=None, help="CLI mode: input image")
    p.add_argument("--prompt", type=str, default=None)
    p.add_argument("--output_dir", type=str, default="samples/canny2image")
    p.add_argument("--share", action="store_true")
    p.add_argument("--port", type=int, default=7860,
                   help="port for the web UI (gradio or the stdlib fallback)")
    for k, v in DEFAULTS.items():
        p.add_argument(f"--{k}", type=type(v), default=v)
    args = p.parse_args()

    process = build_processor(args)

    try:
        import gradio as gr

        have_gradio = args.input is None
    except ImportError:
        have_gradio = False

    if not have_gradio and args.input is None:
        # no gradio, no CLI input: stdlib web UI over the SAME process() callback
        from apps._webui import serve_app

        serve_app("Control Stable Diffusion with Canny Edge Maps (TPU)",
                  process, DEFAULTS, port=args.port)
        return

    if have_gradio:
        with gr.Blocks() as demo:
            gr.Markdown("## Control Stable Diffusion with Canny Edge Maps (TPU)")
            with gr.Row():
                with gr.Column():
                    input_image = gr.Image(sources=["upload"], type="numpy")
                    prompt = gr.Textbox(label="Prompt")
                    run = gr.Button("Run")
                    with gr.Accordion("Advanced options", open=False):
                        num_samples = gr.Slider(1, 12, value=1, step=1, label="Images")
                        image_resolution = gr.Slider(256, 768, value=512, step=64,
                                                     label="Image Resolution")
                        low_threshold = gr.Slider(1, 255, value=100, step=1,
                                                  label="Canny low threshold")
                        high_threshold = gr.Slider(1, 255, value=200, step=1,
                                                   label="Canny high threshold")
                        ddim_steps = gr.Slider(1, 100, value=20, step=1, label="Steps")
                        scale = gr.Slider(0.1, 30.0, value=9.0, step=0.1,
                                          label="Guidance Scale")
                        seed = gr.Slider(-1, 2**31, value=42, step=1, label="Seed")
                        eta = gr.Number(value=0.0, label="eta (DDIM)")
                        a_prompt = gr.Textbox(label="Added Prompt",
                                              value=DEFAULTS["a_prompt"])
                        n_prompt = gr.Textbox(label="Negative Prompt",
                                              value=DEFAULTS["n_prompt"])
                with gr.Column():
                    gallery = gr.Gallery(label="Output", columns=2)
            run.click(
                fn=process,
                inputs=[input_image, prompt, a_prompt, n_prompt, num_samples,
                        image_resolution, ddim_steps, scale, seed, eta,
                        low_threshold, high_threshold],
                outputs=[gallery],
            )
        demo.launch(server_name="0.0.0.0", share=args.share)
    else:
        from PIL import Image

        img = np.asarray(Image.open(args.input).convert("RGB"))
        outs = process(img, args.prompt, args.a_prompt, args.n_prompt,
                       args.num_samples, args.image_resolution, args.ddim_steps,
                       args.scale, args.seed, args.eta,
                       args.low_threshold, args.high_threshold)
        os.makedirs(args.output_dir, exist_ok=True)
        for i, o in enumerate(outs):
            Image.fromarray(o).save(os.path.join(args.output_dir, f"{i}.png"))
            print(f"wrote {args.output_dir}/{i}.png")


if __name__ == "__main__":
    main()
