"""CLIP ViT-L/14 text encoder rebuilt natively in JAX/flax.

Capability-parity target: transformers' CLIPTextModel as used by the reference
(`encoder_hidden_states = text_encoder(ids)[0]`, reference
train_text_to_image_control_lora.py:768). SD1.5 text stack: vocab 49408, 12 layers,
hidden 768, 12 heads, quick_gelu, causal mask, max 77 positions.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x.astype(jnp.float32)).astype(x.dtype)


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.config
        d = cfg.hidden_size
        heads = cfg.num_heads
        head_dim = d // heads

        def proj(name):
            return nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32, name=name)

        q = proj("q_proj")(x) * head_dim**-0.5
        k = proj("k_proj")(x)
        v = proj("v_proj")(x)
        b, l, _ = x.shape

        def split(t):
            return t.reshape(b, l, heads, head_dim).transpose(0, 2, 1, 3)

        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", split(q), split(k), preferred_element_type=jnp.float32
        )
        logits = logits + causal_mask
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, split(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
        return proj("out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.config
        h = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, param_dtype=jnp.float32,
            name="layer_norm1",
        )(x.astype(jnp.float32)).astype(self.dtype)
        x = x + CLIPAttention(cfg, self.dtype, name="self_attn")(h, causal_mask)
        h = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, param_dtype=jnp.float32,
            name="layer_norm2",
        )(x.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(
            cfg.intermediate_size, dtype=self.dtype, param_dtype=jnp.float32, name="fc1"
        )(h)
        h = quick_gelu(h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig = CLIPTextConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """(B, 77) token ids -> (B, 77, 768) last hidden state."""
        cfg = self.config
        b, l = input_ids.shape
        tok = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, param_dtype=jnp.float32, name="token_embedding"
        )(input_ids).astype(self.dtype)
        pos = nn.Embed(
            cfg.max_position_embeddings,
            cfg.hidden_size,
            param_dtype=jnp.float32,
            name="position_embedding",
        )(jnp.arange(l)[None, :]).astype(self.dtype)
        x = tok + pos

        causal_mask = jnp.triu(jnp.full((l, l), -1e9, dtype=jnp.float32), k=1)[None, None]
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(cfg, self.dtype, name=f"layers_{i}")(x, causal_mask)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, param_dtype=jnp.float32,
            name="final_layer_norm",
        )(x.astype(jnp.float32))
        return x.astype(jnp.float32)
