"""First-party Pallas flash-attention kernel for SD1.5 shapes, with fused
control-bias adds.

Why a custom kernel when jax ships one: after inference folding (ops/folding.py) the
entire ControlLoRA contribution reduces to per-position additive biases on q (and k/v
for v2 self-attention). Fusing those adds into the attention prologue removes the
biased q/k/v round-trips through HBM — the last remaining adapter cost — and gives one
kernel for the whole "adapted attention" (SURVEY.md §7 hard part 3).

Kernel design (see /opt/skills/guides/pallas_guide.md):
  * grid (B·H, L/BLOCK_Q): one program per query block per (batch, head);
  * inner fori_loop over K blocks with online softmax (running max m, normalizer l,
    fp32 accumulator in VMEM scratch);
  * head_dim (40/80/160) rides the 128-lane dimension padded by Mosaic; block sizes
    default 512×512 (VMEM: q 512×128·4B + k/v 512×128·4B + acc 512×128·4B ≈ 1 MB);
  * non-causal, no masking (SD spatial attention is dense);
  * forward-only by design: the folded/biased path is inference-only; training uses
    the threaded adapter math where the stock flash VJP or the XLA path applies.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def pick_block(length: int, cap: int = 1024,
               head_dim: Optional[int] = None) -> Optional[int]:
    """Largest MXU-friendly block size that tiles `length` exactly, or None.

    1024×1024 won the round-2 slope sweep at every serving shape
    (docs/BENCHMARKS.md); smaller powers of two keep odd-resolution sequences
    (e.g. 384² → L=2304 = 9·256) on the flash path instead of crashing the
    grid-divisibility assert or silently truncating.

    VMEM budget scales with the (lane-padded) head_dim: the sweep's 1024
    blocks fit the 16M scoped-VMEM limit at the UNet's d≤160, but the VAE
    mid-block attention is SINGLE-head d=512 (L=4096) and 1024 blocks
    overflow there (18.2M measured on v5e) — wide heads cap at 512.
    """
    if head_dim is not None and head_dim > 256:
        cap = min(cap, 512)
    for b in (1024, 512, 256, 128, 64):
        if b <= cap and b <= length and length % b == 0:
            return b
    return None


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, scale,
                 block_k, kv_valid):
    """One (batch·head, q-block) program; loops over KV blocks with online softmax."""
    j = pl.program_id(2)  # kv block index (innermost grid dim)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32)  # (BLOCK_Q, D)
    k = k_ref[0].astype(jnp.float32)  # (BLOCK_K, D)
    v = v_ref[0].astype(jnp.float32)  # (BLOCK_K, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BLOCK_Q, BLOCK_K)
    if kv_valid is not None:
        # mask padded KV columns (only the final block carries any): static arg,
        # zero compiler cost when the sequence tiles exactly
        col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_valid, s, NEG_INF)

    m_prev = m_ref[...]  # (BLOCK_Q, 1)
    l_prev = l_ref[...]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[...] = m_new
    l_ref[...] = l_new

    @pl.when(j == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "kv_valid"))
def flash_attention_fwd(
    q: jnp.ndarray,  # (BH, L, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 512,
    block_k: int = 512,
    kv_valid: Optional[int] = None,
) -> jnp.ndarray:
    """Non-causal dense flash attention over flattened (batch·heads, L, D)."""
    bh, lq, d = q.shape
    _, lk, _ = k.shape
    assert lq % block_q == 0 and lk % block_k == 0, (lq, lk, block_q, block_k)
    scale = d**-0.5

    grid = (bh, lq // block_q, lk // block_k)
    kernel = functools.partial(
        _attn_kernel, scale=scale, block_k=block_k, kv_valid=kv_valid
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v)


def serving_blocks(length: int, head_dim: int, cap: int = 1024) -> int:
    """Block size for the serving flash path at a given sequence length.

    Round-2 policy, measured on v5e (scripts/bench_flash_blocks.py +
    bench_odd_resolutions.py): 1024×1024 when the length tiles it exactly
    (best-or-tied everywhere, e.g. 0.98 ms at bh=16 L=4096 D=40); otherwise
    512×512 at the PADDED length — padded-512 beats both the exact smaller
    block (L=2304: 0.74 vs 1.21 ms at exact 256) and the XLA einsum path,
    which collapses at long odd lengths (L=6400: 191 ms, L=7744: 338 ms).
    Wide heads (VAE mid-attn d=512) cap at 512 for the 16M scoped-VMEM budget.
    """
    if head_dim > 256:
        cap = min(cap, 512)
    if length % 1024 == 0 and cap >= 1024:
        return 1024
    return min(512, cap)


def biased_attention(
    query: jnp.ndarray,  # (B, L, H*D) pre-head-split projections
    key: jnp.ndarray,
    value: jnp.ndarray,
    heads: int,
    q_bias: Optional[jnp.ndarray] = None,  # (Bc, L, H*D) folded control biases
    k_bias: Optional[jnp.ndarray] = None,
    v_bias: Optional[jnp.ndarray] = None,
    block: int = 1024,
) -> jnp.ndarray:
    """Fused folded-adapter attention: bias adds + head split + flash + head merge.

    Biases broadcast over the CFG batch (control batch 1 vs latent batch 2).
    Arbitrary lengths are handled by q/kv padding + in-kernel KV masking
    (serving_blocks policy)."""
    b, l, inner = query.shape
    lk = key.shape[1]
    d = inner // heads
    blk_q = serving_blocks(l, d, cap=block)
    blk_k = serving_blocks(lk, d, cap=block)
    # A/B experiment knobs (scripts/bench_attn_probe.py; read at trace time)
    import os

    blk_q = int(os.environ.get("CONTROLLORA_SERVE_BQ", 0)) or blk_q
    if lk >= 2048:
        blk_k = int(os.environ.get("CONTROLLORA_SERVE_BK", 0)) or blk_k
    elif lk <= 128:
        # short-KV cross attention: one padded 128-column block, masked in-kernel
        blk_k = 128

    def prep(x, bias, blk):
        if bias is not None:
            x = x + jnp.broadcast_to(bias.astype(x.dtype), x.shape)
        x = (
            x.reshape(b, x.shape[1], heads, d)
            .transpose(0, 2, 1, 3)
            .reshape(b * heads, x.shape[1], d)
        )
        pad = (-x.shape[1]) % blk
        return jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x

    qf = prep(query, q_bias, blk_q)
    kf = prep(key, k_bias, blk_k)
    vf = prep(value, v_bias, blk_k)
    out = flash_attention_fwd(
        qf, kf, vf, block_q=blk_q, block_k=blk_k,
        kv_valid=lk if kf.shape[1] != lk else None,
    )[:, :l]
    return (
        out.reshape(b, heads, l, d).transpose(0, 2, 1, 3).reshape(b, l, inner)
    )
