"""CLIP ViT-L/14 text encoder rebuilt natively in JAX/flax.

Capability-parity target: transformers' CLIPTextModel as used by the reference
(`encoder_hidden_states = text_encoder(ids)[0]`, reference
train_text_to_image_control_lora.py:768). SD1.5 text stack: vocab 49408, 12 layers,
hidden 768, 12 heads, quick_gelu, causal mask, max 77 positions.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

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
    # "quick_gelu" (SD1.x CLIP ViT-L) or "gelu" (SD2.x OpenCLIP ViT-H text
    # tower, already truncated to its penultimate layer in the diffusers
    # checkpoint layout: hidden 1024, 23 layers, 16 heads)
    hidden_act: str = "quick_gelu"
    # SDXL towers return the hidden state ENTERING the last encoder layer
    # (diffusers hidden_states[-2], no final layer norm) as the context
    penultimate: bool = False
    # OpenCLIP-style pooled projection head (SDXL text_encoder_2 /
    # CLIPTextModelWithProjection): EOS-token pooling of the final-normed last
    # hidden state -> Linear(hidden, projection_dim, bias-free). When set,
    # __call__ returns (context, pooled) instead of context alone.
    projection_dim: Optional[int] = None


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x.astype(jnp.float32)).astype(x.dtype)


def _act(name: str):
    if name == "quick_gelu":
        return quick_gelu
    if name == "gelu":
        return lambda x: jax.nn.gelu(
            x.astype(jnp.float32), approximate=False
        ).astype(x.dtype)
    raise ValueError(f"unknown hidden_act {name!r}")


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
        h = _act(cfg.hidden_act)(h)
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
        penult = None
        for i in range(cfg.num_layers):
            if cfg.penultimate and i == cfg.num_layers - 1:
                penult = x
            x = CLIPEncoderLayer(cfg, self.dtype, name=f"layers_{i}")(x, causal_mask)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, param_dtype=jnp.float32,
            name="final_layer_norm",
        )(x.astype(jnp.float32))
        ctx = penult.astype(jnp.float32) if cfg.penultimate else x.astype(jnp.float32)
        if cfg.projection_dim is None:
            return ctx
        # EOS pooling: the EOS token is the highest id in the CLIP vocab, so the
        # argmax position is its (first) occurrence (transformers
        # CLIPTextModelWithProjection pooling convention)
        eos = jnp.argmax(input_ids, axis=-1)
        pooled = x[jnp.arange(b), eos].astype(self.dtype)
        pooled = nn.Dense(
            cfg.projection_dim, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="text_projection",
        )(pooled)
        return ctx, pooled.astype(jnp.float32)


class DualCLIPTextEncoder(nn.Module):
    """SDXL dual text tower: CLIP ViT-L + OpenCLIP ViT-bigG, both read at their
    penultimate layer, concatenated into the 2048-d cross-attention context;
    tower 2's EOS-pooled projection provides the `text_embeds` micro-conditioning
    vector (diffusers StableDiffusionXLPipeline.encode_prompt semantics).

    The two SDXL tokenizers share the CLIP vocab but pad differently: tower 1
    pads with EOS (CLIPTokenizer convention), tower 2 with '!' = id 0
    (tokenizer_2). Pad positions DO reach the model — all 77 positions of the
    concatenated context feed the UNet's cross-attention — so pass
    `input_ids2` tokenized with the tower-2 pad for exact parity (the pipeline
    does this automatically); it defaults to `input_ids` for hermetic runs."""

    config1: CLIPTextConfig
    config2: CLIPTextConfig
    dtype: Any = jnp.float32

    @property
    def context_dim(self) -> int:
        return self.config1.hidden_size + self.config2.hidden_size

    @property
    def pooled_dim(self) -> int:
        return self.config2.projection_dim

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 input_ids2: Optional[jnp.ndarray] = None):
        """(B, 77) ids [+ tower-2 ids] -> ((B, 77, h1+h2) ctx, (B, proj) pooled)."""
        if input_ids2 is None:
            input_ids2 = input_ids
        c1 = CLIPTextModel(self.config1, self.dtype, name="te1")(input_ids)
        c2, pooled = CLIPTextModel(self.config2, self.dtype, name="te2")(input_ids2)
        return jnp.concatenate([c1, c2], axis=-1), pooled
