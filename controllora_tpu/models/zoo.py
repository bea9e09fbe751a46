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

from controllora_tpu.models.clip import (
    CLIPTextConfig,
    CLIPTextModel,
    DualCLIPTextEncoder,
)
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

# SD2.1 architecture (stabilityai/stable-diffusion-2-1 {unet,text_encoder}/config.json):
# per-block head counts with dim_head 64 everywhere, Linear transformer
# projections, OpenCLIP ViT-H text tower (hidden 1024, 23 layers as shipped —
# the checkpoint is already truncated to the penultimate layer), gelu MLPs.
# v-prediction is a scheduler/trainer setting (--prediction_type v_prediction),
# not an architecture field.
SD21_UNET = UNetConfig(
    sample_size=96,
    cross_attention_dim=1024,
    attention_head_dim=(5, 10, 20, 20),
    use_linear_projection=True,
)
SD21_CLIP = CLIPTextConfig(
    vocab_size=49408, hidden_size=1024, num_layers=23, num_heads=16,
    intermediate_size=4096, hidden_act="gelu",
)

# SD2-shaped smoke variant: exercises per-block heads + linear projections +
# gelu text MLPs at toy widths (dim_head 16 at every level, like SD2's uniform 64)
SMOKE2_UNET = UNetConfig(
    block_out_channels=(32, 64, 96, 96), layers_per_block=1,
    attention_head_dim=(2, 4, 6, 6), use_linear_projection=True,
    cross_attention_dim=96,
)
SMOKE2_CLIP = CLIPTextConfig(vocab_size=49408, hidden_size=96, num_layers=2,
                             num_heads=4, intermediate_size=192, hidden_act="gelu")

# SDXL-base architecture (stabilityai/stable-diffusion-xl-base-1.0
# {unet,text_encoder,text_encoder_2,vae}/config.json): 3 resolution levels,
# no attention on the first, per-block transformer depth (1,2,10), dim_head 64
# on the attention levels, Linear transformer projections, dual text towers
# (CLIP ViT-L 768 + OpenCLIP ViT-bigG 1280 → 2048-d context, both penultimate),
# and "text_time" micro-conditioning (pooled 1280 + 6×256 size ids → 2816).
SDXL_UNET = UNetConfig(
    sample_size=128,
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D"),
    block_out_channels=(320, 640, 1280),
    transformer_layers_per_block=(1, 2, 10),
    attention_head_dim=(5, 10, 20),
    cross_attention_dim=2048,
    use_linear_projection=True,
    addition_embed_type="text_time",
    addition_time_embed_dim=256,
    projection_class_embeddings_input_dim=2816,
)
SDXL_CLIP1 = CLIPTextConfig(penultimate=True)  # ViT-L tower, context only
SDXL_CLIP2 = CLIPTextConfig(
    hidden_size=1280, num_layers=32, num_heads=20, intermediate_size=5120,
    hidden_act="gelu", penultimate=True, projection_dim=1280,
)
SDXL_VAE = VAEConfig(scaling_factor=0.13025)

# SDXL-shaped smoke variant: 3 levels, attention-free level 0, depth (1,1,2),
# dual 32-d towers (context 64), text_time with 8-d size embeddings
SMOKEXL_UNET = UNetConfig(
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D"),
    block_out_channels=(32, 64, 96),
    layers_per_block=1,
    transformer_layers_per_block=(1, 1, 2),
    attention_head_dim=(2, 4, 6),
    cross_attention_dim=64,
    use_linear_projection=True,
    norm_num_groups=16,
    addition_embed_type="text_time",
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=32 + 6 * 8,
)
SMOKEXL_CLIP1 = CLIPTextConfig(vocab_size=49408, hidden_size=32, num_layers=2,
                               num_heads=2, intermediate_size=64, penultimate=True)
SMOKEXL_CLIP2 = CLIPTextConfig(vocab_size=49408, hidden_size=32, num_layers=2,
                               num_heads=2, intermediate_size=64, hidden_act="gelu",
                               penultimate=True, projection_dim=32)

# SDXL-refiner architecture (stabilityai/stable-diffusion-xl-refiner-1.0
# unet/config.json): 4 levels with attention only in the middle two
# (DownBlock2D bookends), transformer depth 4 everywhere it exists, dim_head 64,
# cross-attention 1280 from the ViT-bigG tower ALONE, and aesthetic-score
# micro-conditioning: 5 time ids (orig_h, orig_w, crop_top, crop_left, score)
# -> 1280 + 5*256 = 2560.
SDXL_REFINER_UNET = UNetConfig(
    sample_size=128,
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D",
                      "CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D",
                    "CrossAttnUpBlock2D", "UpBlock2D"),
    block_out_channels=(384, 768, 1536, 1536),
    transformer_layers_per_block=4,
    attention_head_dim=(6, 12, 24, 24),
    cross_attention_dim=1280,
    use_linear_projection=True,
    addition_embed_type="text_time",
    addition_time_embed_dim=256,
    projection_class_embeddings_input_dim=2560,
)

# refiner-shaped smoke variant: attention-free bookend levels, single
# projection tower, 5-id text_time conditioning (32 + 5*8 = 72)
SMOKEREF_UNET = UNetConfig(
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D",
                      "CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D",
                    "CrossAttnUpBlock2D", "UpBlock2D"),
    block_out_channels=(32, 64, 96, 96),
    layers_per_block=1,
    transformer_layers_per_block=2,
    attention_head_dim=(2, 4, 6, 6),
    cross_attention_dim=32,
    use_linear_projection=True,
    norm_num_groups=16,
    addition_embed_type="text_time",
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=32 + 5 * 8,
)


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
    if variant == "sd21":
        return (
            UNet2DConditionModel(SD21_UNET, dtype=dtype),
            AutoencoderKL(VAEConfig(), dtype=dtype),
            CLIPTextModel(SD21_CLIP, dtype=dtype),
        )
    if variant == "smoke":
        return (
            UNet2DConditionModel(SMOKE_UNET, dtype=dtype),
            AutoencoderKL(SMOKE_VAE, dtype=dtype),
            CLIPTextModel(SMOKE_CLIP, dtype=dtype),
        )
    if variant == "smoke2":
        return (
            UNet2DConditionModel(SMOKE2_UNET, dtype=dtype),
            AutoencoderKL(SMOKE_VAE, dtype=dtype),
            CLIPTextModel(SMOKE2_CLIP, dtype=dtype),
        )
    if variant == "sdxl":
        return (
            UNet2DConditionModel(SDXL_UNET, dtype=dtype),
            AutoencoderKL(SDXL_VAE, dtype=dtype),
            DualCLIPTextEncoder(SDXL_CLIP1, SDXL_CLIP2, dtype=dtype),
        )
    if variant == "smokexl":
        return (
            UNet2DConditionModel(SMOKEXL_UNET, dtype=dtype),
            AutoencoderKL(SMOKE_VAE, dtype=dtype),
            DualCLIPTextEncoder(SMOKEXL_CLIP1, SMOKEXL_CLIP2, dtype=dtype),
        )
    if variant == "sdxl-refiner":
        # single-tower conditioning: the projection head makes the encoder
        # return (context, pooled) just like the dual SDXL encoder
        return (
            UNet2DConditionModel(SDXL_REFINER_UNET, dtype=dtype),
            AutoencoderKL(SDXL_VAE, dtype=dtype),
            CLIPTextModel(SDXL_CLIP2, dtype=dtype),
        )
    if variant == "smokeref":
        return (
            UNet2DConditionModel(SMOKEREF_UNET, dtype=dtype),
            AutoencoderKL(SMOKE_VAE, dtype=dtype),
            CLIPTextModel(SMOKEXL_CLIP2, dtype=dtype),
        )
    raise ValueError(f"unknown model variant {variant!r}")


def _find_weights(subdir: str) -> Optional[str]:
    for pat in ("*.safetensors", "*.bin"):
        hits = sorted(glob.glob(os.path.join(subdir, pat)))
        if hits:
            return hits[0]
    return None


def zeros_params(init_fn, *args, dtype=None, **kwargs) -> Any:
    """Zero-filled params with the exact tree/shape structure of ``init_fn(*args)``.

    ``jax.eval_shape`` traces the init abstractly (no compile, no device work), then
    ONE trivial jitted broadcast-fill materializes the tree on device. This replaces
    the full model-init compile (~40-70 s per model through the remote-TPU tunnel)
    for throughput benchmarks, where weight VALUES are irrelevant: MXU matmul and
    VPU elementwise latency are data-independent, so zero weights time identically
    to trained ones (docs/BENCHMARKS.md "measurement traps")."""
    shapes = jax.eval_shape(init_fn, *args, **kwargs)

    def fill():
        # cast only floating leaves (like the trainers' cast_tree): an integer or
        # bool param leaf must keep its dtype, not be corrupted to e.g. bfloat16
        return jax.tree.map(
            lambda s: jnp.zeros(
                s.shape,
                dtype if (dtype and jnp.issubdtype(s.dtype, jnp.floating)) else s.dtype,
            ),
            shapes,
        )

    return jax.jit(fill)()


def zeros_frozen(unet, vae, text_encoder, latent_size: int = 8,
                 param_dtype=jnp.bfloat16) -> Dict[str, Any]:
    """`random_frozen`-shaped tree, zero-filled via eval_shape (benchmark fast path)."""
    rng = jax.random.PRNGKey(0)
    tree = zeros_params(
        lambda: random_frozen(rng, unet, vae, text_encoder, latent_size=latent_size,
                              param_dtype=param_dtype)
    )
    return tree


def random_frozen(rng: jax.Array, unet, vae, text_encoder, latent_size: int = 8,
                  param_dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Randomly initialized frozen stack (hermetic smoke runs / benchmarks)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    is_dual = isinstance(text_encoder, DualCLIPTextEncoder)
    ctx_dim = text_encoder.context_dim if is_dual else text_encoder.config.hidden_size
    added = {}
    if unet.config.addition_embed_type == "text_time":
        pooled_dim = (text_encoder.pooled_dim if is_dual
                      else text_encoder.config.projection_dim)
        # id count follows the conditioning width: 6 for SDXL-base size ids,
        # 5 for the refiner's (orig, crop, aesthetic_score) layout
        n_ids = ((unet.config.projection_class_embeddings_input_dim - pooled_dim)
                 // unet.config.addition_time_embed_dim)
        added = dict(
            added_text_embeds=jnp.zeros((1, pooled_dim)),
            added_time_ids=jnp.zeros((1, n_ids)),
        )
    # jitted inits: one compiled program each instead of hundreds of op dispatches
    # (critical under remote-dispatch TPU runtimes)
    unet_p = jax.jit(unet.init)(
        k1,
        jnp.zeros((1, latent_size, latent_size, unet.config.in_channels)),
        jnp.array([1]),
        jnp.zeros((1, 77, ctx_dim)),
        **added,
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
    """Load a diffusers-layout local checkpoint directory into flax param trees.

    The text-encoder layout is auto-detected from the directory:
    * `text_encoder/` only — single tower (SD1.5 / SD2.x).
    * `text_encoder/` + `text_encoder_2/` — SDXL-base dual towers, nested as
      the DualCLIPTextEncoder expects ({'te1': ..., 'te2': ...}).
    * `text_encoder_2/` only — SDXL-refiner (the ViT-bigG tower alone).
    """
    out = {}
    unet_w = _find_weights(os.path.join(pretrained_dir, "unet"))
    vae_w = _find_weights(os.path.join(pretrained_dir, "vae"))
    text_w = _find_weights(os.path.join(pretrained_dir, "text_encoder"))
    text2_w = _find_weights(os.path.join(pretrained_dir, "text_encoder_2"))
    if not (unet_w and vae_w and (text_w or text2_w)):
        raise FileNotFoundError(
            f"expected unet/vae/text_encoder[_2] weight files under {pretrained_dir}"
        )
    out["unet"] = cast_tree(translate_unet(load_state_dict(unet_w)), param_dtype)
    out["vae"] = cast_tree(translate_vae(load_state_dict(vae_w)), param_dtype)
    if text_w and text2_w:
        out["text"] = {
            "te1": cast_tree(translate_clip_text(load_state_dict(text_w)), param_dtype),
            "te2": cast_tree(translate_clip_text(load_state_dict(text2_w)), param_dtype),
        }
    else:
        only = text_w or text2_w
        out["text"] = cast_tree(translate_clip_text(load_state_dict(only)), param_dtype)
    return out
