#!/usr/bin/env python
"""Reference-side parity-fixture dumper (runs where diffusers/torch are installed —
NOT in this container; see scripts/dump_fixtures.py for the JAX side and the compare
mode).

Produces the same npz schema from the PyTorch/diffusers stack on identical
deterministic inputs, so
    python scripts/dump_fixtures.py --compare ours.npz theirs.npz
establishes cross-framework numerics for CLIP / VAE / UNet / ControlLoRA /
schedulers / HED.

Usage (reference environment):
    python scripts/dump_fixtures_torch.py \
        --pretrained runwayml/stable-diffusion-v1-5 \
        [--control_lora HighCWu/ControlLoRA --subfolder sd-control-lora-canny] \
        [--hed_weights <annotator_ckpts>/network-bsds500.pth] \
        --out theirs.npz

Self-test (runs HERE, CI-covered): `--selftest` exercises the full dump plumbing —
input derivation, NCHW/NHWC permutes, the pop-based processor install loop, npz
schema — against shape-faithful stub modules, so the one-shot run in a reference
environment cannot fail on script bugs (torch is in-container; diffusers is not).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dump_fixtures import deterministic_inputs  # same input derivation


def run(args, mods) -> dict:
    """Dump all fixture arrays using the module bundle `mods` (real diffusers
    modules or selftest stubs). Every tensor-layout decision lives here so the
    selftest covers it."""
    import torch

    torch.set_grad_enabled(False)
    dev = args.device
    x = deterministic_inputs(args.seed, args.resolution)
    out = {k: v for k, v in x.items()}

    def t(a, nchw=False):
        v = torch.from_numpy(np.asarray(a)).to(dev)
        return v.permute(0, 3, 1, 2).contiguous() if nchw else v

    def hwc(v):
        return v.permute(0, 2, 3, 1).cpu().numpy()

    out["clip_hidden"] = mods.text(t(x["ids"]).long())[0].cpu().numpy()

    moments = mods.vae.quant_conv(mods.vae.encoder(t(x["pixels"], nchw=True)))
    mean, logvar = moments.chunk(2, dim=1)
    out["vae_mean"] = hwc(mean)
    out["vae_logvar"] = hwc(logvar.clamp(-30, 20))
    # JAX side does decode(latents * scaling_factor) with an internal divide —
    # net effect equals diffusers' decode(latents) on the raw latents
    out["vae_decode"] = hwc(mods.vae.decode(t(x["latents"], nchw=True)).sample)

    ctx = torch.from_numpy(out["clip_hidden"]).to(dev)
    eps = mods.unet(
        t(x["latents"], nchw=True), torch.from_numpy(x["t"]).to(dev),
        encoder_hidden_states=ctx,
    ).sample
    out["unet_eps"] = hwc(eps)

    if mods.control is not None:
        cl = mods.control
        controls = cl(t(x["guide"], nchw=True)).control_states
        for i, c in enumerate(controls):
            arr = c.cpu().numpy()
            if arr.ndim == 4:  # NCHW -> NLC to match the JAX dump
                n, ch, hh, ww = arr.shape
                arr = arr.transpose(0, 2, 3, 1).reshape(n, hh * ww, ch)
            out[f"control_{i}"] = arr
        # install processors per the reference protocol and run the controlled unet
        # (reference train_text_to_image_control_lora.py:471-487)
        n_ch = len(mods.unet.config.block_out_channels)
        control_ids = list(range(n_ch))
        lora_layers_list = [list(l) for l in cl.lora_layers]
        procs = {}
        for name in mods.unet.attn_processors.keys():
            if name.startswith("mid_block"):
                cid = control_ids[-1]
            elif name.startswith("up_blocks"):
                cid = list(reversed(control_ids))[int(name[len("up_blocks.")])]
            else:
                cid = control_ids[int(name[len("down_blocks.")])]
            if lora_layers_list[cid]:
                procs[name] = lora_layers_list[cid].pop(0)
        assert not any(lora_layers_list), "unconsumed adapter slots after install"
        mods.unet.set_attn_processor(procs)
        cl(t(x["guide"], nchw=True))  # re-inject control states
        eps_c = mods.unet(
            t(x["latents"], nchw=True), torch.from_numpy(x["t"]).to(dev),
            encoder_hidden_states=ctx,
        ).sample
        out["unet_eps_controlled"] = hwc(eps_c)

    if mods.hed is not None:
        # HED sigmoid probability on the uint8-quantized guide (contract:
        # docs/PARITY.md; reference annotator/hed/__init__.py:88-116 — BGR flip,
        # /255, NCHW). Quantize exactly like the detector entry point does.
        img_u8 = np.clip((x["guide"][0] + 1.0) * 127.5, 0, 255).astype(np.uint8)
        bgr = img_u8[:, :, ::-1].astype(np.float32) / 255.0
        prob = mods.hed(t(bgr[None], nchw=True))
        out["hed_prob"] = hwc(prob)

    noisy = mods.sch.add_noise(
        t(x["latents"], nchw=True), t(x["noise"], nchw=True),
        torch.from_numpy(x["t"]),
    )
    out["ddpm_noisy"] = hwc(noisy)
    return out


class _Mods:
    def __init__(self, **kw):
        self.control = None
        self.hed = None
        self.__dict__.update(kw)


def load_real(args) -> "_Mods":
    import torch
    from diffusers import AutoencoderKL, DDPMScheduler, UNet2DConditionModel
    from transformers import CLIPTextModel

    torch.set_grad_enabled(False)
    text = CLIPTextModel.from_pretrained(args.pretrained, subfolder="text_encoder")
    vae = AutoencoderKL.from_pretrained(args.pretrained, subfolder="vae")
    unet = UNet2DConditionModel.from_pretrained(args.pretrained, subfolder="unet")
    for m in (text, vae, unet):
        m.to(args.device).eval().float()
    mods = _Mods(text=text, vae=vae, unet=unet,
                 sch=DDPMScheduler.from_pretrained(args.pretrained,
                                                   subfolder="scheduler"))
    if args.control_lora:
        # requires the reference repo on sys.path (models.py with ControlLoRA)
        from models import ControlLoRA  # reference models.py

        mods.control = ControlLoRA.from_pretrained(
            args.control_lora, subfolder=args.subfolder
        ).to(args.device).eval().float()
    if args.hed_weights:
        from annotator.hed import Network  # reference annotator

        mods.hed = Network(args.hed_weights).to(args.device).eval().float()
    return mods


# ------------------------------------------------------------------ selftest stubs

def build_stubs(resolution: int) -> "_Mods":
    """Shape-faithful stand-ins for the diffusers/reference modules: every API
    surface `run()` touches exists here with the right tensor layouts, so the
    dump plumbing is executable (and CI-tested) without diffusers."""
    import torch

    lat = resolution // 8

    class Out:
        def __init__(self, sample):
            self.sample = sample

    class Text(torch.nn.Module):
        def forward(self, ids):
            return (torch.zeros(ids.shape[0], ids.shape[1], 16) + ids[..., None], )

    class VAE(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = torch.nn.Conv2d(3, 8, 8, stride=8)
            self.quant_conv = torch.nn.Conv2d(8, 8, 1)

        def decode(self, z):
            return Out(torch.nn.functional.interpolate(z[:, :3], scale_factor=8))

    class AttnProc:
        pass

    class UNetConfigStub:
        block_out_channels = (4, 8, 8, 8)

    class UNet(torch.nn.Module):
        config = UNetConfigStub()

        def __init__(self):
            super().__init__()
            self.conv = torch.nn.Conv2d(4, 4, 3, padding=1)
            # SD1.5's 32-processor name layout (12 down + 2 mid + 18 up)
            names = []
            for b in range(3):
                for l in range(2):
                    for a in ("attn1", "attn2"):
                        names.append(
                            f"down_blocks.{b}.attentions.{l}"
                            f".transformer_blocks.0.{a}.processor")
            for a in ("attn1", "attn2"):
                names.append(f"mid_block.attentions.0.transformer_blocks.0.{a}.processor")
            for b in range(1, 4):
                for l in range(3):
                    for a in ("attn1", "attn2"):
                        names.append(
                            f"up_blocks.{b}.attentions.{l}"
                            f".transformer_blocks.0.{a}.processor")
            self.attn_processors = {n: AttnProc() for n in names}

        def forward(self, x, t, encoder_hidden_states=None):
            return Out(self.conv(x) + t.float().view(-1, 1, 1, 1) * 0
                       + encoder_hidden_states.mean() * 0)

        def set_attn_processor(self, procs):
            if len(procs) != len(self.attn_processors):
                raise ValueError(
                    f"processor count mismatch: {len(procs)} vs "
                    f"{len(self.attn_processors)}")
            self.attn_processors = dict(procs)

    class ControlOut:
        def __init__(self, states):
            self.control_states = states

    class Control(torch.nn.Module):
        def __init__(self):
            super().__init__()
            # base-layout slot counts per bucket (10/10/10/2)
            self.lora_layers = [[AttnProc() for _ in range(n)]
                                for n in (10, 10, 10, 2)]

        def forward(self, guide):
            b = guide.shape[0]
            return ControlOut([torch.zeros(b, 4, lat, lat),
                               torch.zeros(b, 8, lat // 2, lat // 2),
                               torch.zeros(b, 8, lat // 4, lat // 4),
                               torch.zeros(b, 8, lat // 8, lat // 8)])

    class HED(torch.nn.Module):
        def forward(self, x):
            return torch.sigmoid(x.mean(dim=1, keepdim=True))

    class Sch:
        def add_noise(self, x, n, t):
            return x + 0.5 * n

    return _Mods(text=Text(), vae=VAE(), unet=UNet(), sch=Sch(),
                 control=Control(), hed=HED())


EXPECTED_BASE_KEYS = {
    "latents", "noise", "guide", "pixels", "ids", "t",
    "clip_hidden", "vae_mean", "vae_logvar", "vae_decode", "unet_eps", "ddpm_noisy",
}
EXPECTED_CONTROL_KEYS = {"control_0", "control_1", "control_2", "control_3",
                         "unet_eps_controlled"}


def selftest(resolution: int = 64, out_path: str = None) -> dict:
    """Run the dumper end-to-end on stubs; validate the npz schema + layouts."""
    args = argparse.Namespace(seed=42, resolution=resolution, device="cpu")
    out = run(args, build_stubs(resolution))
    keys = set(out)
    missing = (EXPECTED_BASE_KEYS | EXPECTED_CONTROL_KEYS | {"hed_prob"}) - keys
    assert not missing, f"selftest: missing fixture keys {missing}"
    lat = resolution // 8
    assert out["vae_mean"].shape == (1, lat, lat, 4), out["vae_mean"].shape
    assert out["vae_decode"].shape[1:3] == (resolution, resolution)
    assert out["unet_eps"].shape == (1, lat, lat, 4)
    assert out["unet_eps_controlled"].shape == (1, lat, lat, 4)
    assert out["hed_prob"].shape == (1, resolution, resolution, 1)
    assert out["control_0"].shape == (1, lat * lat, 4)  # NLC flattening
    np.testing.assert_allclose(
        out["ddpm_noisy"], out["latents"] + 0.5 * out["noise"], atol=1e-6)
    if out_path:
        np.savez_compressed(out_path, **out)
    print(f"selftest ok: {len(out)} arrays, schema + NHWC/NLC layouts verified")
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained")
    p.add_argument("--control_lora", default=None)
    p.add_argument("--subfolder", default=None)
    p.add_argument("--hed_weights", default=None,
                   help="path to network-bsds500.pth for the HED fixture")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", default="theirs.npz")
    p.add_argument("--selftest", action="store_true",
                   help="exercise the dump plumbing against stub modules (no "
                        "diffusers needed); writes --out if given")
    args = p.parse_args()

    if args.selftest:
        selftest(64, args.out if args.out != "theirs.npz" else None)
        return
    if not args.pretrained:
        p.error("--pretrained is required (or use --selftest)")

    import torch

    args.device = "cuda" if torch.cuda.is_available() else "cpu"
    out = run(args, load_real(args))
    np.savez_compressed(args.out, **out)
    print(f"wrote {len(out)} arrays to {args.out}")


if __name__ == "__main__":
    main()
