"""First-party flash-attention with a first-party BACKWARD — training runs
entirely on in-house Pallas kernels (completes the round-1 kernel story where
only the folded-inference forward was ours; reference counterpart: xformers
memory-efficient attention, train_text_to_image_control_lora.py:449-453).

Standard non-causal flash backward decomposition (fp32 accumulation throughout):

  forward  : O, LSE = m + log(l)                       (one kernel, online softmax)
  backward : D  = rowsum(dO ⊙ O)                       (XLA — one fused reduction)
             dV = Σ_i P_ijᵀ dO_i,  P_ij = exp(S_ij − LSE_i)
             dK = Σ_i (P_ij ⊙ (dO_i V_jᵀ − D_i))ᵀ Q_i · scale   (one kernel, grid over KV)
             dQ = Σ_j (P_ij ⊙ (dO_i V_jᵀ − D_i)) K_j · scale    (one kernel, grid over Q)

Layout matches ops/pallas_attention.py: (B·H, L, D) with D riding the 128-lane
dimension (Mosaic pads 40/80/160). Grid inner loops are "arbitrary" (sequential)
so the VMEM scratch accumulators carry across KV/Q blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


# ---------------------------------------------------------------------- forward


def _kv_mask(s, j, block_k, kv_valid):
    """Mask padded KV columns (cols with global index >= kv_valid) to NEG_INF.

    kv_valid is STATIC (baked at trace time); when the sequence tiles exactly
    this is a no-op the compiler never sees. Padding is always < one block, so
    only the final KV block carries masked columns."""
    if kv_valid is None:
        return s
    col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    return jnp.where(col < kv_valid, s, NEG_INF)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref, *,
                scale, block_k, kv_valid):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = _kv_mask(s, j, block_k, kv_valid)

    m_prev, l_prev = m_ref[...], l_ref[...]
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
    def _fin():
        o_ref[0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)
        lse_ref[0] = m_ref[...] + jnp.log(l_ref[...])


def _fwd(q, k, v, block_q, block_k, interpret=False, kv_valid=None):
    bh, lq, d = q.shape
    _, lk, _ = k.shape
    # a non-tiling block would silently drop the tail of the sequence
    assert lq % block_q == 0 and lk % block_k == 0, (lq, lk, block_q, block_k)
    scale = d**-0.5
    grid = (bh, lq // block_q, lk // block_k)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, block_k=block_k,
                          kv_valid=kv_valid),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
            # (bh, L, 1): Mosaic requires the last two block dims to be
            # (8k, 128k) or equal to the array dims — a trailing singleton
            # satisfies that while keeping the (block_q, 1) in-kernel layout
            jax.ShapeDtypeStruct((bh, lq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)
    return o, lse


# --------------------------------------------------------------------- backward


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dcap_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc, *, scale, block_k, kv_valid):
    i = pl.program_id(2)  # q-block index (sequential)
    j = pl.program_id(1)  # kv-block index (this program's fixed KV block)

    @pl.when(i == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0].astype(jnp.float32)      # (BQ, D)
    k = k_ref[0].astype(jnp.float32)      # (BK, D)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)    # (BQ, D)
    lse = lse_ref[0]                      # (BQ, 1)
    dcap = dcap_ref[0]                    # (BQ, 1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                              # (BQ, BK)
    s = _kv_mask(s, j, block_k, kv_valid)
    p = jnp.exp(s - lse)
    dv_acc[...] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                      # pᵀ @ dO -> (BK, D)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                      # (BQ, BK)
    ds = p * (dp - dcap)
    dk_acc[...] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                              # dsᵀ @ Q -> (BK, D)

    @pl.when(i == pl.num_programs(2) - 1)
    def _fin():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dcap_ref,
                   dq_ref, dq_acc, *, scale, block_k, kv_valid):
    j = pl.program_id(2)  # kv-block index (sequential)

    @pl.when(j == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]
    dcap = dcap_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = _kv_mask(s, j, block_k, kv_valid)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - dcap)
    dq_acc[...] += jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    @pl.when(j == pl.num_programs(2) - 1)
    def _fin():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


def _bwd(block_q, block_k, interpret, kv_valid, res, g):
    q, k, v, o, lse = res
    do = g
    bh, lq, d = q.shape
    _, lk, _ = k.shape
    scale = d**-0.5
    # D = rowsum(dO ⊙ O): one fused XLA reduction, no need for a kernel
    dcap = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1,
                   keepdims=True)  # (bh, L, 1)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, block_k=block_k,
                          kv_valid=kv_valid),
        grid=(bh, lk // block_k, lq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),  # q
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),  # k
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),  # v
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),  # do
            pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0)),  # lse
            pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0)),  # D
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, lk, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, dcap)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, block_k=block_k,
                          kv_valid=kv_valid),
        grid=(bh, lq // block_q, lk // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, dcap)
    return dq, dk, dv


# ------------------------------------------------------------------- public API


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(q, k, v, block_q: int = 512, block_k: int = 512,
                    interpret: bool = False, kv_valid: int = None):
    """Differentiable non-causal dense flash attention over (B·H, L, D).

    Sequence lengths must tile (block_q, block_k); `kv_valid` (static) marks
    trailing KV columns >= kv_valid as padding (masked to -inf in all kernels).
    Use flash_attention_padded for arbitrary lengths."""
    o, _ = _fwd(q, k, v, block_q, block_k, interpret, kv_valid)
    return o


def _vjp_fwd(q, k, v, block_q, block_k, interpret, kv_valid):
    o, lse = _fwd(q, k, v, block_q, block_k, interpret, kv_valid)
    return o, (q, k, v, o, lse)


flash_attention.defvjp(_vjp_fwd, _bwd)


def flash_attention_padded(q, k, v, block_q: int = 512, block_k: int = 512,
                           interpret: bool = False):
    """Flash attention for ARBITRARY sequence lengths via padding + KV masking.

    Measured on v5e (scripts/bench_odd_resolutions.py, bh=16 D=40): the XLA
    einsum path collapses at long odd lengths (L=6400: 191 ms, L=7744: 338 ms —
    the fp32 score matrix thrashes HBM) while 512-block flash at the padded
    length stays on the linear-HBM curve (L=2560: 0.74 ms). Padded q rows
    compute garbage that is sliced away; padded KV columns are masked in-kernel,
    and autodiff through pad/slice zero-fills dO for padded rows, which zeroes
    their dK/dV contributions exactly.
    """
    bh, lq, d = q.shape
    _, lk, _ = k.shape
    pq = (-lq) % block_q
    pk = (-lk) % block_k
    if pq == 0 and pk == 0:
        return flash_attention(q, k, v, block_q, block_k, interpret)
    qp = jnp.pad(q, ((0, 0), (0, pq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, pk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pk), (0, 0)))
    o = flash_attention(qp, kp, vp, block_q, block_k, interpret,
                        lk if pk else None)
    return o[:, :lq]
