#!/usr/bin/env python
"""Reference-side parity-fixture dumper (runs where diffusers/torch are installed —
NOT in this container; see scripts/dump_fixtures.py for the JAX side and the compare
mode).

Produces the same npz schema from the PyTorch/diffusers stack on identical
deterministic inputs, so
    python scripts/dump_fixtures.py --compare ours.npz theirs.npz
establishes cross-framework numerics for CLIP / VAE / UNet / ControlLoRA / schedulers.

Usage (reference environment):
    python scripts/dump_fixtures_torch.py \
        --pretrained runwayml/stable-diffusion-v1-5 \
        [--control_lora HighCWu/ControlLoRA --subfolder sd-control-lora-canny] \
        --out theirs.npz
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dump_fixtures import deterministic_inputs  # same input derivation


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained", required=True)
    p.add_argument("--control_lora", default=None)
    p.add_argument("--subfolder", default=None)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", default="theirs.npz")
    args = p.parse_args()

    import torch
    from diffusers import AutoencoderKL, DDPMScheduler, UNet2DConditionModel
    from transformers import CLIPTextModel

    torch.set_grad_enabled(False)
    dev = "cuda" if torch.cuda.is_available() else "cpu"

    text = CLIPTextModel.from_pretrained(args.pretrained, subfolder="text_encoder")
    vae = AutoencoderKL.from_pretrained(args.pretrained, subfolder="vae")
    unet = UNet2DConditionModel.from_pretrained(args.pretrained, subfolder="unet")
    for m in (text, vae, unet):
        m.to(dev).eval().float()

    x = deterministic_inputs(args.seed, args.resolution)
    out = {k: v for k, v in x.items()}

    def t(a, nchw=False):
        v = torch.from_numpy(np.asarray(a)).to(dev)
        return v.permute(0, 3, 1, 2).contiguous() if nchw else v

    out["clip_hidden"] = text(t(x["ids"]).long())[0].cpu().numpy()

    moments = vae.quant_conv(vae.encoder(t(x["pixels"], nchw=True)))
    mean, logvar = moments.chunk(2, dim=1)
    out["vae_mean"] = mean.permute(0, 2, 3, 1).cpu().numpy()
    out["vae_logvar"] = logvar.clamp(-30, 20).permute(0, 2, 3, 1).cpu().numpy()
    # JAX side does decode(latents * scaling_factor) with an internal divide —
    # net effect equals diffusers' decode(latents) on the raw latents
    dec = vae.decode(t(x["latents"], nchw=True)).sample
    out["vae_decode"] = dec.permute(0, 2, 3, 1).cpu().numpy()

    eps = unet(
        t(x["latents"], nchw=True),
        torch.from_numpy(x["t"]).to(dev),
        encoder_hidden_states=torch.from_numpy(out["clip_hidden"]).to(dev),
    ).sample
    out["unet_eps"] = eps.permute(0, 2, 3, 1).cpu().numpy()

    if args.control_lora:
        # requires the reference repo on sys.path (models.py with ControlLoRA)
        from models import ControlLoRA  # reference models.py

        cl = ControlLoRA.from_pretrained(
            args.control_lora, subfolder=args.subfolder
        ).to(dev).eval().float()
        controls = cl(t(x["guide"], nchw=True)).control_states
        for i, c in enumerate(controls):
            arr = c.cpu().numpy()
            if arr.ndim == 4:  # NCHW -> NLC to match the JAX dump
                n, ch, hh, ww = arr.shape
                arr = arr.transpose(0, 2, 3, 1).reshape(n, hh * ww, ch)
            out[f"control_{i}"] = arr
        # install processors per the reference protocol and run the controlled unet
        n_ch = len(unet.config.block_out_channels)
        control_ids = list(range(n_ch))
        lora_layers_list = [list(l) for l in cl.lora_layers]
        procs = {}
        for name in unet.attn_processors.keys():
            if name.startswith("mid_block"):
                cid = control_ids[-1]
            elif name.startswith("up_blocks"):
                cid = list(reversed(control_ids))[int(name[len("up_blocks.")])]
            else:
                cid = control_ids[int(name[len("down_blocks.")])]
            if lora_layers_list[cid]:
                procs[name] = lora_layers_list[cid].pop(0)
        unet.set_attn_processor(procs)
        cl(t(x["guide"], nchw=True))  # re-inject control states
        eps_c = unet(
            t(x["latents"], nchw=True),
            torch.from_numpy(x["t"]).to(dev),
            encoder_hidden_states=torch.from_numpy(out["clip_hidden"]).to(dev),
        ).sample
        out["unet_eps_controlled"] = eps_c.permute(0, 2, 3, 1).cpu().numpy()

    sch = DDPMScheduler.from_pretrained(args.pretrained, subfolder="scheduler")
    noisy = sch.add_noise(
        t(x["latents"], nchw=True), t(x["noise"], nchw=True),
        torch.from_numpy(x["t"]),
    )
    out["ddpm_noisy"] = noisy.permute(0, 2, 3, 1).cpu().numpy()

    np.savez_compressed(args.out, **out)
    print(f"wrote {len(out)} arrays to {args.out}")


if __name__ == "__main__":
    main()
