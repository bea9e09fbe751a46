"""SD1.5 UNet2DConditionModel rebuilt natively in JAX/flax for TPU.

Capability-parity target: diffusers' UNet2DConditionModel as consumed by the reference
(reference train_text_to_image_control_lora.py:407-409, :782). This is a fresh NHWC
implementation — not a translation:

  * NHWC layout end-to-end (TPU conv-native; torch reference is NCHW),
  * computation dtype configurable (bf16 frozen stack), GroupNorm/LayerNorm/softmax in fp32,
  * attention adapters (LoRA / ControlLoRA v1 / v2) are *threaded* through the forward as an
    ``adapters`` dict keyed by diffusers-style processor names, replacing the reference's
    stateful `unet.set_attn_processor` installation
    (reference train_text_to_image_control_lora.py:468-487),
  * pure function of (params, latents, t, text_ctx, adapters) — `jax.grad` w.r.t. the
    adapter pytree alone gives the frozen-backbone training economics for free.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from controllora_tpu.models.lora import (
    AdapterStack,
    adapt_hidden_post_attn,
    adapt_hidden_pre_q,
    adapt_key,
    adapt_output,
    adapt_query,
    adapt_value,
)
from controllora_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """SD1.5 architecture (runwayml/stable-diffusion-v1-5 unet/config.json)."""

    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    # number of heads (diffusers naming quirk). SD1.x: a single int (8).
    # SD2.x-style configs: a per-down-block tuple, e.g. (5, 10, 20, 20) with
    # dim_head 64 at every level; up blocks mirror in reverse, mid uses the last.
    attention_head_dim: Any = 8
    # SD2.x Transformer2D uses Linear proj_in/proj_out on the flattened tokens
    # instead of 1x1 convs (diffusers use_linear_projection)
    use_linear_projection: bool = False
    # Transformer2D depth per down block (int or tuple; up blocks mirror in
    # reverse, mid uses the last). SDXL: (1, 2, 10) — depth 1 is never built
    # because SDXL's first block is a plain DownBlock2D.
    transformer_layers_per_block: Any = 1
    # SDXL micro-conditioning: "text_time" feeds [pooled text ‖ sinusoidal
    # embeddings of 6 size ids] through an add_embedding MLP into the time
    # embedding (diffusers addition_embed_type="text_time")
    addition_embed_type: Optional[str] = None
    addition_time_embed_dim: int = 256
    # expected add_embedding input width (pooled_dim + 6*addition_time_embed_dim);
    # checked at trace time so size mismatches fail loudly. SDXL: 2816.
    projection_class_embeddings_input_dim: Optional[int] = None
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    flip_sin_to_cos: bool = True
    freq_shift: int = 0


# ---------------------------------------------------------------------------- helpers


def timestep_embedding(
    t: jnp.ndarray, dim: int, flip_sin_to_cos: bool = True, freq_shift: float = 0.0
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (diffusers get_timestep_embedding semantics)."""
    half = dim // 2
    exponent = -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = jnp.exp(exponent)[None, :] * t.astype(jnp.float32)[:, None]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    return emb


class GroupNorm(nn.Module):
    """GroupNorm computed in fp32 and cast back (bf16-safe)."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.GroupNorm(
            num_groups=self.num_groups,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="norm",
        )(x.astype(jnp.float32))
        return y.astype(self.dtype)


class LayerNorm(nn.Module):
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(
            epsilon=self.epsilon, dtype=jnp.float32, param_dtype=jnp.float32, name="norm"
        )(x.astype(jnp.float32))
        return y.astype(self.dtype)


def conv3(features: int, dtype, name: str, stride: int = 1):
    return nn.Conv(
        features,
        (3, 3),
        strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def conv1(features: int, dtype, name: str):
    return nn.Conv(
        features, (1, 1), dtype=dtype, param_dtype=jnp.float32, name=name
    )


def dense(features: int, dtype, name: str, use_bias: bool = True):
    return nn.Dense(
        features, use_bias=use_bias, dtype=dtype, param_dtype=jnp.float32, name=name
    )


# ---------------------------------------------------------------------------- blocks


class ResnetBlock2D(nn.Module):
    out_channels: int
    groups: int = 32
    eps: float = 1e-5
    use_shortcut: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        h = GroupNorm(self.groups, self.eps, self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = conv3(self.out_channels, self.dtype, "conv1")(h)
        if temb is not None:
            t = dense(self.out_channels, self.dtype, "time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = GroupNorm(self.groups, self.eps, self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = conv3(self.out_channels, self.dtype, "conv2")(h)
        if self.use_shortcut:
            x = conv1(self.out_channels, self.dtype, "conv_shortcut")(x)
        return x + h


class Downsample2D(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return conv3(self.out_channels, self.dtype, "conv", stride=2)(x)


class Upsample2D(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return conv3(self.out_channels, self.dtype, "conv")(x)


class CrossAttention(nn.Module):
    """One attention layer with the full adapter-chain fold.

    Mirrors diffusers CrossAttention + the reference processors' semantics
    (reference models.py:118-152 plain LoRA; :222-287 v1; :357-431 v2).
    """

    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None
    out_bias: bool = True
    dtype: Any = jnp.float32
    # tensor-parallel serving (parallel/tp.py): this instance runs under
    # shard_map with kernels pre-sliced over `tp_axis` — it sees heads/tp_size
    # local heads and completes the row-parallel out projection with one psum.
    tp_axis: Optional[str] = None
    tp_size: int = 1

    @nn.compact
    def __call__(self, hidden, ctx=None, stack: Optional[Any] = None, lora_scale=1.0):
        heads = self.heads // self.tp_size
        inner = heads * self.dim_head
        folded = stack is not None and not isinstance(stack, AdapterStack)
        if self.tp_size > 1 and stack is not None and not folded:
            raise ValueError(
                "tensor-parallel serving supports folded adapter stacks only "
                "(fold_adapters runs before the params shard); got an unfolded "
                "AdapterStack — pre/post chains cannot shard by heads"
            )
        if folded:
            # inference fast path: adapters pre-folded into kernels (ops/folding.py);
            # only the precomputed per-position biases remain. Per-image control
            # batches (n guides for a 2n CFG batch) tile to the block
            # [uncond ‖ cond] layout; batch-1 biases broadcast as before.
            b_h = hidden.shape[0]

            def fit(bias):
                if bias is not None and bias.shape[0] not in (1, b_h):
                    bias = jnp.tile(
                        bias, (b_h // bias.shape[0],) + (1,) * (bias.ndim - 1)
                    )
                return bias

            stack = stack.replace(
                q_bias=fit(stack.q_bias), k_bias=fit(stack.k_bias),
                v_bias=fit(stack.v_bias), out_bias=fit(stack.out_bias),
            )
            q = dense(inner, self.dtype, "to_q", use_bias=False)(hidden)
            ctx_in = hidden if ctx is None else ctx
            k = dense(inner, self.dtype, "to_k", use_bias=False)(ctx_in)
            v = dense(inner, self.dtype, "to_v", use_bias=False)(ctx_in)
            L = hidden.shape[1]
            import os as _os

            cross_flash = ctx is not None and bool(
                _os.environ.get("CONTROLLORA_CROSS_FLASH"))
            if (L >= 2048 and (ctx is None or cross_flash)
                    and jax.default_backend() in ("tpu", "axon")):
                # first-party fused kernel: bias adds + flash in one pallas call;
                # arbitrary L handled by pad + KV-mask (pallas_attention.py).
                # cross_flash (experiment knob): route the 77-token cross
                # attention through the same kernel with one masked 128-column
                # KV block instead of materializing the (bh, L, 77) fp32 scores
                from controllora_tpu.ops.pallas_attention import biased_attention

                attn = biased_attention(
                    q, k, v, heads,
                    q_bias=stack.q_bias, k_bias=stack.k_bias, v_bias=stack.v_bias,
                    block=1024,
                )
            else:
                if stack.q_bias is not None:
                    q = q + stack.q_bias.astype(q.dtype)
                if stack.k_bias is not None:
                    k = k + stack.k_bias.astype(k.dtype)
                if stack.v_bias is not None:
                    v = v + stack.v_bias.astype(v.dtype)
                attn = dot_product_attention(q, k, v, heads)
            out = dense(
                self.heads * self.dim_head, self.dtype, "to_out_0",
                use_bias=self.out_bias,
            )(attn)
            if stack.out_bias is not None:
                out = out + stack.out_bias.astype(out.dtype)
            if self.tp_axis is not None:
                # complete the row-parallel projection (bias and out_bias are
                # pre-divided by tp_size — see parallel/tp.py)
                out = jax.lax.psum(out, self.tp_axis)
            return out

        if stack is not None:
            # v2 control residual on (normed) hidden states before q-projection
            hidden = adapt_hidden_pre_q(stack, hidden, lora_scale)

        q = dense(inner, self.dtype, "to_q", use_bias=False)(hidden)
        if stack is not None:
            q = adapt_query(stack, q, hidden, lora_scale)

        ctx_in = hidden if ctx is None else ctx
        k = dense(inner, self.dtype, "to_k", use_bias=False)(ctx_in)
        v = dense(inner, self.dtype, "to_v", use_bias=False)(ctx_in)
        if stack is not None:
            k = adapt_key(stack, k, ctx_in, lora_scale)
            v = adapt_value(stack, v, ctx_in, lora_scale)

        attn = dot_product_attention(q, k, v, heads)

        if stack is not None:
            attn = adapt_hidden_post_attn(stack, attn, lora_scale)
        out = dense(
            self.heads * self.dim_head, self.dtype, "to_out_0",
            use_bias=self.out_bias,
        )(attn)
        if stack is not None:
            out = adapt_output(stack, out, attn, lora_scale)
        if self.tp_axis is not None:
            out = jax.lax.psum(out, self.tp_axis)
        return out


class FeedForward(nn.Module):
    """GEGLU feed-forward (diffusers FeedForward with geglu activation)."""

    dim: int
    mult: int = 4
    dtype: Any = jnp.float32
    # tensor-parallel serving (parallel/tp.py): net_0_proj columns pre-sliced
    # per rank ([a_r ‖ gate_r] re-blocked), net_2 row-parallel + psum.
    tp_axis: Optional[str] = None
    tp_size: int = 1

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult // self.tp_size
        proj = dense(inner * 2, self.dtype, "net_0_proj")(x)
        a, gate = jnp.split(proj, 2, axis=-1)
        # gelu in fp32 for bf16 safety
        h = a * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(a.dtype)
        out = dense(self.dim, self.dtype, "net_2")(h)
        if self.tp_axis is not None:
            out = jax.lax.psum(out, self.tp_axis)
        return out


def _merge_stack_tokens(stack, merge, b_h: int):
    """Apply a ToMe merge map to every per-token tensor riding an adapter stack.

    Folded stacks carry per-position biases (FoldedBias q/k/v/out); threaded
    stacks carry per-position control states inside each AttnAdapter. Merging is
    linear, so merging these alongside the hidden states keeps the adapter math
    consistent with the merged token set (ops/tome.py module docstring)."""
    if stack is None:
        return None

    def fit(t):
        if t is None:
            return None
        if t.shape[0] not in (1, b_h):
            # per-image batch n under the 2n CFG layout: tile like CrossAttention's
            # folded-path fit(), then merge per-batch
            t = jnp.tile(t, (b_h // t.shape[0],) + (1,) * (t.ndim - 1))
        return merge(t)

    if not isinstance(stack, AdapterStack):  # FoldedBias
        return stack.replace(
            q_bias=fit(stack.q_bias), k_bias=fit(stack.k_bias),
            v_bias=fit(stack.v_bias), out_bias=fit(stack.out_bias),
        )

    def adapt(a):
        if a is None or a.control is None:
            return a
        return a.replace(control=fit(a.control))

    return AdapterStack(
        main=adapt(stack.main),
        pre=tuple(adapt(a) for a in stack.pre),
        post=tuple(adapt(a) for a in stack.post),
    )


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    cross_attention_dim: int
    proc_prefix: str = ""  # e.g. "down_blocks.0.attentions.0.transformer_blocks.0"
    dtype: Any = jnp.float32
    tp_axis: Optional[str] = None
    tp_size: int = 1

    @nn.compact
    def __call__(self, x, ctx, adapters=None, lora_scale=1.0,
                 tome=None, tome_key=None, grid=None):
        def stack_for(attn_name):
            if not adapters:
                return None
            return adapters.get(f"{self.proc_prefix}.{attn_name}.processor")

        tp = dict(tp_axis=self.tp_axis, tp_size=self.tp_size)
        h = LayerNorm(dtype=self.dtype, name="norm1")(x)
        if tome is not None:
            # token merging (ops/tome.py): bipartite match on this block's input,
            # self-attention runs on the reduced sequence, output unmerges before
            # the residual add — tomesd's merge_attn placement
            from controllora_tpu.ops.tome import build_merge

            merge, unmerge, _ = build_merge(x, grid[0], grid[1], tome, tome_key)
            stack1 = _merge_stack_tokens(stack_for("attn1"), merge, x.shape[0])
            x = x + unmerge(CrossAttention(
                self.heads, self.dim_head, None, dtype=self.dtype, name="attn1", **tp
            )(merge(h), None, stack1, lora_scale))
        else:
            x = x + CrossAttention(
                self.heads, self.dim_head, None, dtype=self.dtype, name="attn1", **tp
            )(h, None, stack_for("attn1"), lora_scale)

        h = LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + CrossAttention(
            self.heads,
            self.dim_head,
            self.cross_attention_dim,
            dtype=self.dtype,
            name="attn2",
            **tp,
        )(h, ctx, stack_for("attn2"), lora_scale)

        h = LayerNorm(dtype=self.dtype, name="norm3")(x)
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff", **tp)(h)
        return x


class Transformer2DModel(nn.Module):
    heads: int
    dim_head: int
    cross_attention_dim: int
    depth: int = 1
    groups: int = 32
    # SD2.x: Linear proj_in/proj_out applied to the flattened token sequence
    # instead of 1x1 convs (same math; kernel stored 2-D, diffusers
    # use_linear_projection)
    use_linear_projection: bool = False
    proc_prefix: str = ""
    dtype: Any = jnp.float32
    tp_axis: Optional[str] = None
    tp_size: int = 1

    @nn.compact
    def __call__(self, x, ctx, adapters=None, lora_scale=1.0,
                 tome=None, tome_key=None):
        b, hh, ww, c = x.shape
        inner = self.heads * self.dim_head
        residual = x
        x = GroupNorm(self.groups, 1e-6, self.dtype, name="norm")(x)
        if self.use_linear_projection:
            x = x.reshape(b, hh * ww, c)
            x = dense(inner, self.dtype, "proj_in")(x)
        else:
            x = conv1(inner, self.dtype, "proj_in")(x)
            x = x.reshape(b, hh * ww, inner)
        from controllora_tpu.ops.tome import maybe_tome

        block_tome = tome if maybe_tome(tome, hh, ww) else None
        if block_tome is not None and tome_key is None:
            # the UNet entry point always derives a key (unet.py __call__); a
            # direct caller that forgot one would otherwise crash deep inside
            # fold_in with an opaque TypeError
            raise ValueError(
                "Transformer2DModel: tome is active but tome_key is None — pass "
                "tome_key=ops.tome.step_key(seed, timestep) (the UNet entry point "
                "derives one automatically)"
            )
        if block_tome is not None:
            # distinct (but deterministic) dst grids per module, like tomesd's
            # advancing generator; crc32 of the layer path is process-stable
            # (Python hash() is salted and would change the traced program)
            import zlib

            tome_key = jax.random.fold_in(
                tome_key, zlib.crc32(self.proc_prefix.encode()) & 0x7FFFFFFF)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                inner,
                self.heads,
                self.dim_head,
                self.cross_attention_dim,
                proc_prefix=f"{self.proc_prefix}.transformer_blocks.{i}",
                dtype=self.dtype,
                name=f"transformer_blocks_{i}",
                tp_axis=self.tp_axis,
                tp_size=self.tp_size,
            )(x, ctx, adapters, lora_scale,
              tome=block_tome,
              tome_key=None if block_tome is None
              else jax.random.fold_in(tome_key, i),
              grid=(hh, ww))
        if self.use_linear_projection:
            x = dense(c, self.dtype, "proj_out")(x)
            x = x.reshape(b, hh, ww, c)
        else:
            x = x.reshape(b, hh, ww, inner)
            x = conv1(c, self.dtype, "proj_out")(x)
        return x + residual


# ---------------------------------------------------------------------------- UNet


class UNet2DConditionModel(nn.Module):
    config: UNetConfig = UNetConfig()
    dtype: Any = jnp.float32
    # tensor-parallel serving over a mesh 'model' axis (parallel/tp.py): the
    # transformer blocks' matmuls shard by heads / GEGLU columns; convs, norms
    # and embeddings replicate. Only valid under shard_map with params sliced
    # by tp_param_specs.
    tp_axis: Optional[str] = None
    tp_size: int = 1

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (B, H, W, 4) latents, NHWC
        timesteps: jnp.ndarray,  # (B,) or scalar
        encoder_hidden_states: jnp.ndarray,  # (B, 77, 768)
        adapters: Optional[Dict[str, AdapterStack]] = None,
        lora_scale: float = 1.0,
        added_text_embeds: Optional[jnp.ndarray] = None,  # (B, pooled_dim), SDXL
        added_time_ids: Optional[jnp.ndarray] = None,  # (B, 6), SDXL
        tome: Optional[Any] = None,  # ops/tome.py ToMeConfig — serving speed/quality trade
        tome_key: Optional[jnp.ndarray] = None,  # per-step PRNG key (tome.step_key)
        deepcache: Optional[str] = None,  # None | "full" | "shallow" (static)
        deepcache_feat: Optional[jnp.ndarray] = None,  # cached deep feature ("shallow")
    ) -> jnp.ndarray:
        """`deepcache`: the DeepCache serving acceleration (Ma et al. 2023) —
        the deep UNet levels change slowly across adjacent denoising steps, so
        a "full" step additionally RETURNS `(eps, cache)` where `cache` is the
        feature entering the shallowest up block, and a "shallow" step SKIPS
        everything below level 0 (deep down blocks, mid, deep up blocks) and
        substitutes `deepcache_feat` for that feature. The shallow path
        recomputes exactly the level-0 ops (conv_in, down_blocks[0]
        resnets/attentions, up_blocks[-1], conv_out) with identical module
        names, so `shallow(cache_of(full(x))) == full(x)` bit-exactly when
        inputs match (tests/test_deepcache.py pins this invariant). Opt-in via
        the pipeline's `deepcache_interval`; never part of the exact path."""
        cfg = self.config
        if tome is not None and tome_key is None:
            # default per-step randomness: vary the merge grid with the timestep
            from controllora_tpu.ops.tome import step_key

            tome_key = step_key(0, timesteps)
        heads_per_block = (
            tuple(cfg.attention_head_dim)
            if isinstance(cfg.attention_head_dim, (tuple, list))
            else (cfg.attention_head_dim,) * len(cfg.block_out_channels)
        )
        depths = (
            tuple(cfg.transformer_layers_per_block)
            if isinstance(cfg.transformer_layers_per_block, (tuple, list))
            else (cfg.transformer_layers_per_block,) * len(cfg.block_out_channels)
        )
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        # time embedding
        t_emb = timestep_embedding(
            timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift
        ).astype(self.dtype)
        time_embed_dim = cfg.block_out_channels[0] * 4
        temb = dense(time_embed_dim, self.dtype, "time_embedding_linear_1")(t_emb)
        temb = dense(time_embed_dim, self.dtype, "time_embedding_linear_2")(nn.silu(temb))

        if cfg.addition_embed_type == "text_time":
            # SDXL micro-conditioning (diffusers get_aug_embed, addition_embed_type
            # "text_time"): each of the 6 size ids (orig_h, orig_w, crop_top,
            # crop_left, target_h, target_w) gets the same sinusoidal embedding as
            # a timestep, flattened and concatenated after the pooled text vector,
            # then a two-layer MLP maps into the time-embedding space.
            if added_text_embeds is None or added_time_ids is None:
                raise ValueError(
                    "addition_embed_type='text_time' requires added_text_embeds "
                    "(pooled text, (B, pooled_dim)) and added_time_ids ((B, 6))"
                )
            b = added_time_ids.shape[0]
            id_emb = timestep_embedding(
                added_time_ids.reshape(-1),
                cfg.addition_time_embed_dim,
                cfg.flip_sin_to_cos,
                cfg.freq_shift,
            ).reshape(b, -1)
            aug = jnp.concatenate(
                [added_text_embeds.astype(jnp.float32), id_emb], axis=-1
            )
            want = cfg.projection_class_embeddings_input_dim
            if want is not None and aug.shape[-1] != want:
                raise ValueError(
                    f"text_time embedding input is {aug.shape[-1]}-d (pooled "
                    f"{added_text_embeds.shape[-1]} + 6*{cfg.addition_time_embed_dim}) "
                    f"but projection_class_embeddings_input_dim={want}"
                )
            aug = aug.astype(self.dtype)
            aug = dense(time_embed_dim, self.dtype, "add_embedding_linear_1")(aug)
            aug = dense(time_embed_dim, self.dtype, "add_embedding_linear_2")(nn.silu(aug))
            temb = temb + aug
        elif cfg.addition_embed_type is not None:
            raise ValueError(f"unknown addition_embed_type {cfg.addition_embed_type!r}")

        ctx = encoder_hidden_states.astype(self.dtype)
        sample = sample.astype(self.dtype)

        if deepcache not in (None, "full", "shallow"):
            raise ValueError(f"deepcache must be None|'full'|'shallow', got {deepcache!r}")
        shallow = deepcache == "shallow"
        if shallow and deepcache_feat is None:
            raise ValueError("deepcache='shallow' requires deepcache_feat")

        h = conv3(cfg.block_out_channels[0], self.dtype, "conv_in")(sample)

        # ---- down
        res_stack: List[jnp.ndarray] = [h]
        out_ch = cfg.block_out_channels[0]
        for bi, btype in enumerate(cfg.down_block_types):
            if shallow and bi > 0:
                break  # deep levels are served from the cache
            in_ch, out_ch = out_ch, cfg.block_out_channels[bi]
            is_final = bi == len(cfg.down_block_types) - 1
            for li in range(cfg.layers_per_block):
                h = ResnetBlock2D(
                    out_ch,
                    cfg.norm_num_groups,
                    cfg.norm_eps,
                    use_shortcut=(in_ch if li == 0 else out_ch) != out_ch,
                    dtype=self.dtype,
                    name=f"down_blocks_{bi}_resnets_{li}",
                )(h, temb)
                if btype == "CrossAttnDownBlock2D":
                    h = Transformer2DModel(
                        heads_per_block[bi],
                        out_ch // heads_per_block[bi],
                        cfg.cross_attention_dim,
                        depth=depths[bi],
                        groups=cfg.norm_num_groups,
                        use_linear_projection=cfg.use_linear_projection,
                        proc_prefix=f"down_blocks.{bi}.attentions.{li}",
                        dtype=self.dtype,
                        name=f"down_blocks_{bi}_attentions_{li}",
                        tp_axis=self.tp_axis,
                        tp_size=self.tp_size,
                    )(h, ctx, adapters, lora_scale, tome=tome, tome_key=tome_key)
                res_stack.append(h)
            if not is_final and not shallow:
                h = Downsample2D(out_ch, self.dtype, name=f"down_blocks_{bi}_downsample")(h)
                res_stack.append(h)

        if not shallow:
            # ---- mid
            mid_ch = cfg.block_out_channels[-1]
            h = ResnetBlock2D(
                mid_ch, cfg.norm_num_groups, cfg.norm_eps, dtype=self.dtype,
                name="mid_resnets_0"
            )(h, temb)
            h = Transformer2DModel(
                heads_per_block[-1],
                mid_ch // heads_per_block[-1],
                cfg.cross_attention_dim,
                depth=depths[-1],
                groups=cfg.norm_num_groups,
                use_linear_projection=cfg.use_linear_projection,
                proc_prefix="mid_block.attentions.0",
                dtype=self.dtype,
                name="mid_attentions_0",
                tp_axis=self.tp_axis,
                tp_size=self.tp_size,
            )(h, ctx, adapters, lora_scale, tome=tome, tome_key=tome_key)
            h = ResnetBlock2D(
                mid_ch, cfg.norm_num_groups, cfg.norm_eps, dtype=self.dtype,
                name="mid_resnets_1"
            )(h, temb)

        # ---- up
        cache: Optional[jnp.ndarray] = None
        last_up = len(cfg.up_block_types) - 1
        rev_channels = list(reversed(cfg.block_out_channels))
        rev_heads = list(reversed(heads_per_block))
        rev_depths = list(reversed(depths))
        for bi, btype in enumerate(cfg.up_block_types):
            if shallow and bi < last_up:
                continue  # deep up blocks are served from the cache
            if bi == last_up:
                if shallow:
                    h = deepcache_feat.astype(self.dtype)
                elif deepcache == "full":
                    cache = h
            out_ch = rev_channels[bi]
            is_final = bi == len(cfg.up_block_types) - 1
            for li in range(cfg.layers_per_block + 1):
                res = res_stack.pop()
                cat_ch = h.shape[-1] + res.shape[-1]
                h = jnp.concatenate([h, res], axis=-1)
                h = ResnetBlock2D(
                    out_ch,
                    cfg.norm_num_groups,
                    cfg.norm_eps,
                    use_shortcut=cat_ch != out_ch,
                    dtype=self.dtype,
                    name=f"up_blocks_{bi}_resnets_{li}",
                )(h, temb)
                if btype == "CrossAttnUpBlock2D":
                    h = Transformer2DModel(
                        rev_heads[bi],
                        out_ch // rev_heads[bi],
                        cfg.cross_attention_dim,
                        depth=rev_depths[bi],
                        groups=cfg.norm_num_groups,
                        use_linear_projection=cfg.use_linear_projection,
                        proc_prefix=f"up_blocks.{bi}.attentions.{li}",
                        dtype=self.dtype,
                        name=f"up_blocks_{bi}_attentions_{li}",
                        tp_axis=self.tp_axis,
                        tp_size=self.tp_size,
                    )(h, ctx, adapters, lora_scale, tome=tome, tome_key=tome_key)
            if not is_final:
                h = Upsample2D(out_ch, self.dtype, name=f"up_blocks_{bi}_upsample")(h)

        h = GroupNorm(cfg.norm_num_groups, cfg.norm_eps, self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = conv3(cfg.out_channels, self.dtype, "conv_out")(h)
        out = h.astype(jnp.float32)
        if deepcache == "full":
            return out, cache
        return out


def deepcache_feat_shape(config: UNetConfig, batch: int, lh: int, lw: int) -> Tuple[int, ...]:
    """Shape of the DeepCache deep feature: the input to the shallowest up block
    (the output of up_blocks[-2]'s upsampler — level-0 spatial resolution, the
    second block width; the mid output for single-level configs)."""
    chans = config.block_out_channels
    ch = chans[1] if len(chans) > 1 else chans[0]
    return (batch, lh, lw, ch)


# ------------------------------------------------------------------ processor inventory


def _transformer_depths(config: UNetConfig) -> Tuple[int, ...]:
    d = config.transformer_layers_per_block
    if isinstance(d, (tuple, list)):
        return tuple(d)
    return (d,) * len(config.block_out_channels)


def attention_processor_names(config: UNetConfig = UNetConfig()) -> List[str]:
    """Diffusers-style processor names in `unet.attn_processors` enumeration order
    (down blocks, mid, up blocks; attn1 then attn2 per transformer block). This is the
    order the reference iterates when installing ControlLoRA layers
    (reference train_text_to_image_control_lora.py:471-487). Per-block transformer
    depth (SDXL transformer_layers_per_block) enumerates the inner
    transformer_blocks.{ti} loop at each attention module."""
    depths = _transformer_depths(config)
    names = []
    for bi, btype in enumerate(config.down_block_types):
        if btype == "CrossAttnDownBlock2D":
            for li in range(config.layers_per_block):
                for ti in range(depths[bi]):
                    for a in ("attn1", "attn2"):
                        names.append(
                            f"down_blocks.{bi}.attentions.{li}"
                            f".transformer_blocks.{ti}.{a}.processor"
                        )
    for ti in range(depths[-1]):
        for a in ("attn1", "attn2"):
            names.append(f"mid_block.attentions.0.transformer_blocks.{ti}.{a}.processor")
    rev_depths = list(reversed(depths))
    for bi, btype in enumerate(config.up_block_types):
        if btype == "CrossAttnUpBlock2D":
            for li in range(config.layers_per_block + 1):
                for ti in range(rev_depths[bi]):
                    for a in ("attn1", "attn2"):
                        names.append(
                            f"up_blocks.{bi}.attentions.{li}"
                            f".transformer_blocks.{ti}.{a}.processor"
                        )
    return names


def processor_bucket(name: str, n_blocks: int) -> int:
    """Resolution-bucket (control_id) assignment for a processor name
    (reference train_text_to_image_control_lora.py:412-424)."""
    if name.startswith("mid_block"):
        return n_blocks - 1
    if name.startswith("up_blocks"):
        block_id = int(name[len("up_blocks.")].split(".")[0])
        return list(reversed(range(n_blocks)))[block_id]
    if name.startswith("down_blocks"):
        return int(name[len("down_blocks.")].split(".")[0])
    raise ValueError(name)


def derive_cross_attention_dims(config: UNetConfig = UNetConfig()):
    """Per-bucket `lora_cross_attention_dims` tuple matching a UNet exactly.

    Walks `attention_processor_names` in install order and records each layer's
    cross dim (None for self-attn) under its resolution bucket — the layout the
    reference hand-writes in its configs (reference configs/*.json,
    `lora_cross_attention_dims`) and that `build_adapters` requires to cover every
    attention layer. Use this when building reduced/smoke configs so adapter-slot
    counts can never drift from the UNet."""
    n_blocks = len(config.block_out_channels)
    buckets = [[] for _ in range(n_blocks)]
    for name in attention_processor_names(config):
        buckets[processor_bucket(name, n_blocks)].append(processor_cross_dim(name, config))
    return tuple(tuple(b) for b in buckets)


def processor_hidden_size(name: str, config: UNetConfig = UNetConfig()) -> int:
    """Channel width (attention hidden size) at a processor's location."""
    if name.startswith("mid_block"):
        return config.block_out_channels[-1]
    if name.startswith("down_blocks"):
        bi = int(name[len("down_blocks.")].split(".")[0])
        return config.block_out_channels[bi]
    bi = int(name[len("up_blocks.")].split(".")[0])
    return list(reversed(config.block_out_channels))[bi]


def processor_cross_dim(name: str, config: UNetConfig = UNetConfig()) -> Optional[int]:
    return None if ".attn1." in name else config.cross_attention_dim
