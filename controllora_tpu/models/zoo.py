"""Model zoo: build the SD1.5 stack (or reduced smoke variants) and load frozen weights.

The reference pulls its substrate from the HF hub (reference
train_text_to_image_control_lora.py:399-409). Here: explicit builders + local
safetensors loading (no network in this environment); `--pretrained_model` points at a
directory with diffusers-layout subfolders {unet,vae,text_encoder}/*.safetensors.
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from controllora_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from controllora_tpu.models.unet import UNet2DConditionModel, UNetConfig
from controllora_tpu.models.vae import AutoencoderKL, VAEConfig
from controllora_tpu.utils.torch_compat import (
    load_state_dict,
    translate_clip_text,
    translate_unet,
    translate_vae,
)

# Reduced architecture for hermetic smoke runs (no pretrained weights in-container).
SMOKE_UNET = UNetConfig(
    block_out_channels=(32, 64, 96, 96), layers_per_block=1, attention_head_dim=4
)
SMOKE_VAE = VAEConfig(block_out_channels=(16, 16, 32, 32), layers_per_block=1,
                      norm_num_groups=8)
SMOKE_CLIP = CLIPTextConfig(vocab_size=49408, hidden_size=768, num_layers=2, num_heads=8,
                            intermediate_size=1536)


@dataclasses.dataclass
class SDStack:
    unet: UNet2DConditionModel
    vae: AutoencoderKL
    text_encoder: CLIPTextModel
    frozen: Dict[str, Any]  # {"unet","vae","text"} param trees


def cast_tree(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, tree
    )


def build_models(variant: str = "sd15", dtype=jnp.bfloat16):
    """Return (unet, vae, text_encoder) module triple; dtype = compute dtype."""
    if variant == "sd15":
        return (
            UNet2DConditionModel(UNetConfig(), dtype=dtype),
            AutoencoderKL(VAEConfig(), dtype=dtype),
            CLIPTextModel(CLIPTextConfig(), dtype=dtype),
        )
    if variant == "smoke":
        return (
            UNet2DConditionModel(SMOKE_UNET, dtype=dtype),
            AutoencoderKL(SMOKE_VAE, dtype=dtype),
            CLIPTextModel(SMOKE_CLIP, dtype=dtype),
        )
    raise ValueError(f"unknown model variant {variant!r}")


def _find_weights(subdir: str) -> Optional[str]:
    for pat in ("*.safetensors", "*.bin"):
        hits = sorted(glob.glob(os.path.join(subdir, pat)))
        if hits:
            return hits[0]
    return None


def random_frozen(rng: jax.Array, unet, vae, text_encoder, latent_size: int = 8,
                  param_dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Randomly initialized frozen stack (hermetic smoke runs / benchmarks)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    # jitted inits: one compiled program each instead of hundreds of op dispatches
    # (critical under remote-dispatch TPU runtimes)
    unet_p = jax.jit(unet.init)(
        k1,
        jnp.zeros((1, latent_size, latent_size, unet.config.in_channels)),
        jnp.array([1]),
        jnp.zeros((1, 77, text_encoder.config.hidden_size)),
    )["params"]
    img = latent_size * 8
    vae_p = jax.jit(vae.init)(k2, jnp.zeros((1, img, img, 3)))["params"]
    clip_p = jax.jit(text_encoder.init)(k3, jnp.zeros((1, 77), jnp.int32))["params"]
    return {
        "unet": cast_tree(unet_p, param_dtype),
        "vae": cast_tree(vae_p, param_dtype),
        "text": cast_tree(clip_p, param_dtype),
    }


def load_frozen(pretrained_dir: str, param_dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Load a diffusers-layout local checkpoint directory into flax param trees."""
    out = {}
    unet_w = _find_weights(os.path.join(pretrained_dir, "unet"))
    vae_w = _find_weights(os.path.join(pretrained_dir, "vae"))
    text_w = _find_weights(os.path.join(pretrained_dir, "text_encoder"))
    if not (unet_w and vae_w and text_w):
        raise FileNotFoundError(
            f"expected unet/vae/text_encoder weight files under {pretrained_dir}"
        )
    out["unet"] = cast_tree(translate_unet(load_state_dict(unet_w)), param_dtype)
    out["vae"] = cast_tree(translate_vae(load_state_dict(vae_w)), param_dtype)
    out["text"] = cast_tree(translate_clip_text(load_state_dict(text_w)), param_dtype)
    return out
