"""AutoencoderKL (SD1.5 VAE) rebuilt natively in JAX/flax, NHWC.

Capability-parity target: diffusers' AutoencoderKL as used by the reference trainer
(`vae.encode(pixels).latent_dist.sample() * scaling_factor`, reference
train_text_to_image_control_lora.py:753-754) and the pipelines' `vae.decode`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from controllora_tpu.models.unet import GroupNorm, conv1, conv3
from controllora_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """SD1.5 VAE architecture (runwayml/stable-diffusion-v1-5 vae/config.json)."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215


class VAEResnet(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GroupNorm(self.groups, 1e-6, self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = conv3(self.out_channels, self.dtype, "conv1")(h)
        h = GroupNorm(self.groups, 1e-6, self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = conv3(self.out_channels, self.dtype, "conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = conv1(self.out_channels, self.dtype, "conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head mid-block self-attention (diffusers AttentionBlock)."""

    channels: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = GroupNorm(self.groups, 1e-6, self.dtype, name="group_norm")(x)
        h = h.reshape(b, hh * ww, c)
        q = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="query")(h)
        k = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="key")(h)
        v = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="value")(h)
        h = dot_product_attention(q, k, v, heads=1)
        h = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="proj_attn")(h)
        return x + h.reshape(b, hh, ww, c)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = conv3(cfg.block_out_channels[0], self.dtype, "conv_in")(x)
        out_ch = cfg.block_out_channels[0]
        for bi, out_ch in enumerate(cfg.block_out_channels):
            for li in range(cfg.layers_per_block):
                h = VAEResnet(
                    out_ch,
                    cfg.norm_num_groups,
                    self.dtype,
                    name=f"down_blocks_{bi}_resnets_{li}",
                )(h)
            if bi != len(cfg.block_out_channels) - 1:
                # diffusers encoder downsample: pad=(0,1,0,1) asymmetric, stride-2 conv
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(
                    out_ch,
                    (3, 3),
                    strides=(2, 2),
                    padding="VALID",
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name=f"down_blocks_{bi}_downsample",
                )(h)
        ch = cfg.block_out_channels[-1]
        h = VAEResnet(ch, cfg.norm_num_groups, self.dtype, name="mid_resnets_0")(h)
        h = VAEAttention(ch, cfg.norm_num_groups, self.dtype, name="mid_attn")(h)
        h = VAEResnet(ch, cfg.norm_num_groups, self.dtype, name="mid_resnets_1")(h)
        h = GroupNorm(cfg.norm_num_groups, 1e-6, self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        return conv3(2 * cfg.latent_channels, self.dtype, "conv_out")(h)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        ch = cfg.block_out_channels[-1]
        h = conv3(ch, self.dtype, "conv_in")(z)
        h = VAEResnet(ch, cfg.norm_num_groups, self.dtype, name="mid_resnets_0")(h)
        h = VAEAttention(ch, cfg.norm_num_groups, self.dtype, name="mid_attn")(h)
        h = VAEResnet(ch, cfg.norm_num_groups, self.dtype, name="mid_resnets_1")(h)
        rev = list(reversed(cfg.block_out_channels))
        for bi, out_ch in enumerate(rev):
            for li in range(cfg.layers_per_block + 1):
                h = VAEResnet(
                    out_ch,
                    cfg.norm_num_groups,
                    self.dtype,
                    name=f"up_blocks_{bi}_resnets_{li}",
                )(h)
            if bi != len(rev) - 1:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), method="nearest")
                h = conv3(out_ch, self.dtype, f"up_blocks_{bi}_upsample")(h)
        h = GroupNorm(cfg.norm_num_groups, 1e-6, self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        return conv3(cfg.out_channels, self.dtype, "conv_out")(h)


class AutoencoderKL(nn.Module):
    config: VAEConfig = VAEConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, self.dtype)
        self.decoder = Decoder(self.config, self.dtype)
        self.quant_conv = conv1(2 * self.config.latent_channels, self.dtype, "quant_conv")
        self.post_quant_conv = conv1(self.config.latent_channels, self.dtype, "post_quant_conv")

    def encode_moments(self, x):
        """(B,H,W,3) in [-1,1] -> (mean, logvar) each (B,H/8,W/8,4)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x, rng=None):
        """Sample (or take the mean of) the latent posterior, scaled by scaling_factor —
        the trainer's latent step (reference train_text_to_image_control_lora.py:753-754).
        """
        mean, logvar = self.encode_moments(x)
        if rng is not None:
            std = jnp.exp(0.5 * logvar)
            mean = mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)
        return mean * self.config.scaling_factor

    def decode(self, z):
        """Scaled latents -> image in [-1,1]."""
        z = z / self.config.scaling_factor
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None):
        z = self.encode(x, rng)
        return self.decode(z)


def decode_per_image(vae: AutoencoderKL, params, z):
    """Batched VAE decode via per-image `lax.map`.

    XLA schedules the BATCHED 512² decoder stack superlinearly (v5e, measured:
    19.9 ms at batch 1 but 194 ms at batch 4 — 2.4× per image; the 128-channel
    512² activations stop fitting close to the compute units). Per-image
    decoding is exactly linear (80 ms at batch 4, scripts/bench_vae_decode.py).
    Images are independent, so this is free parallel-in-sequence restructuring;
    single-image batches fall through to the plain decode.
    """
    if z.shape[0] == 1:
        return vae.apply({"params": params}, z, method=vae.decode)
    return jax.lax.map(
        lambda zi: vae.apply({"params": params}, zi[None], method=vae.decode)[0], z
    )
