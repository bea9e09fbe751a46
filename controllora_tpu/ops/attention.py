"""Multi-head attention primitive for the SD1.5 stack.

The reference runs diffusers' CrossAttention with torch bmm + softmax (or optional
xformers, reference train_text_to_image_control_lora.py:449-453). TPU-native design:

  * default path: one fused einsum chain with fp32 logits/softmax accumulation — XLA maps
    the two batched matmuls onto the MXU and fuses the softmax into the pipeline;
  * optional Pallas flash-attention path (`backend="flash"`) for long spatial sequences
    (4096 tokens at 512², more at higher resolutions), blockwise online-softmax so the
    L×L score matrix never materializes in HBM.

Head dims in SD1.5 are 40/80/160 (8 heads over 320/640/1280 channels) — the flash kernel
pads head_dim to the 128-lane boundary inside VMEM.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """(B, L, H*D) -> (B, heads, L, D)."""
    b, l, hd = x.shape
    return x.reshape(b, l, heads, hd // heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, heads, L, D) -> (B, L, H*D)."""
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def _use_flash(q_len: int, kv_len: int, backend: str) -> bool:
    """Flash pays off for long self-attention (measured on v5e: 2.68 vs 4.69 ms at
    L=4096 — the XLA path is bandwidth-bound on the fp32 score matrix). Cross
    attention (kv=77) and short sequences stay on the fused-einsum path."""
    if backend in ("flash", "flash_stock"):
        return True
    if backend != "auto":
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    # no divisibility requirement: the kernels pad + KV-mask arbitrary lengths
    # (bench_odd_resolutions.py: XLA collapses at long odd L — 191 ms at 6400,
    # 338 at 7744 — while padded-512 flash stays on the linear-HBM curve)
    return q_len == kv_len and q_len >= 2048


def _flash(q, k, v, scale):
    """First-party differentiable flash kernel (ops/pallas_attention_vjp.py):
    both the forward and the backward are in-house Pallas. (B,H,L,D) layout is
    flattened to (B·H, L, D) so head count rides the embarrassingly-parallel
    grid dimension."""
    from controllora_tpu.ops.pallas_attention import serving_blocks
    from controllora_tpu.ops.pallas_attention_vjp import flash_attention_padded

    b, h, l, d = q.shape
    if abs(scale - d**-0.5) > 1e-9 * abs(scale):
        # The Pallas kernels bake in the d**-0.5 softmax scale; a caller threading a
        # custom scale through would silently diverge from the XLA path otherwise.
        raise NotImplementedError(
            f"flash backend only supports the default softmax scale d**-0.5, got {scale}"
        )
    rs = lambda x: x.reshape(b * h, x.shape[2], d)
    blk = serving_blocks(l, d)  # block policy: docs/BENCHMARKS.md
    out = flash_attention_padded(rs(q), rs(k), rs(v), blk, blk)
    return out.reshape(b, h, l, d)


def _flash_stock(q, k, v, scale):
    """jax's stock TPU flash kernel — kept as a comparison/fallback backend.
    No padding support here: lengths must tile a power-of-two block."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    from controllora_tpu.ops.pallas_attention import pick_block

    L = q.shape[2]
    blk = pick_block(L, cap=512)
    if blk is None:
        raise ValueError(
            f"flash_stock backend needs a power-of-two-tileable length, got L={L}; "
            "use the default first-party backend (pads arbitrary lengths)")
    bs = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
        block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
    )
    return flash_attention(q, k, v, sm_scale=scale, block_sizes=bs)


def dot_product_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    heads: int,
    mask: Optional[jnp.ndarray] = None,
    backend: str = "auto",
) -> jnp.ndarray:
    """Attention over (B, L, inner) projections; returns (B, Lq, inner).

    Logits and softmax accumulate in fp32 regardless of input dtype (bf16-safe).
    backend: "auto" (flash for long TPU self-attention), "xla", or "flash".
    """
    q = split_heads(query, heads)
    k = split_heads(key, heads)
    v = split_heads(value, heads)
    scale = q.shape[-1] ** -0.5

    if mask is None and _use_flash(q.shape[2], k.shape[2], backend):
        import os

        use_stock = backend == "flash_stock" or (
            os.environ.get("CONTROLLORA_FLASH_IMPL") == "stock"  # A/B benching
        )
        out = (_flash_stock if use_stock else _flash)(q, k, v, scale)
        return merge_heads(out.astype(query.dtype))

    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = logits + mask
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return merge_heads(out.astype(query.dtype))
