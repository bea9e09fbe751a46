"""First-party flash-attention VJP kernels (ops/pallas_attention_vjp.py), run in
pallas interpret mode on the CPU suite; numerics vs the XLA einsum reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllora_tpu.ops.pallas_attention_vjp import flash_attention


def ref_attention(q, k, v):
    d = q.shape[-1]
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32), k.astype(jnp.float32))
    p = jax.nn.softmax(s * d**-0.5, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32))


def make_qkv(bh=4, L=256, d=40, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda s: jnp.asarray(rng.normal(size=(bh, L, d)), dtype)
    return mk(0), mk(1), mk(2)


@pytest.mark.parametrize("block_q,block_k", [(64, 64), (128, 64), (64, 128)])
def test_forward_matches_reference(block_q, block_k):
    q, k, v = make_qkv()
    out = flash_attention(q, k, v, block_q, block_k, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_attention(q, k, v)), atol=2e-5, rtol=1e-5
    )


def test_grads_match_reference():
    q, k, v = make_qkv(bh=2, L=128)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, 64, 64, True)
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(ref_attention(q, k, v)))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=5e-5, rtol=1e-4,
            err_msg=f"d{name} mismatch"
        )


def test_grads_bf16_inputs():
    q, k, v = make_qkv(bh=2, L=128, dtype=jnp.bfloat16)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, 64, 64, True).astype(jnp.float32) ** 2)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert gq.dtype == jnp.bfloat16 and gk.dtype == jnp.bfloat16
    # fp32 shadow check with loose bf16 tolerance
    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))

    def loss_ref(q, k, v):
        return jnp.sum(ref_attention(q, k, v) ** 2)

    gq_ref = jax.grad(loss_ref)(qf, kf, vf)
    np.testing.assert_allclose(
        np.asarray(gq, np.float32), np.asarray(gq_ref), atol=0.15, rtol=0.1
    )


def test_jit_and_uneven_blocks():
    q, k, v = make_qkv(bh=2, L=192, d=40)  # 192 = 3 * 64 blocks

    f = jax.jit(lambda q, k, v: flash_attention(q, k, v, 64, 64, True))
    np.testing.assert_allclose(
        np.asarray(f(q, k, v)), np.asarray(ref_attention(q, k, v)),
        atol=2e-5, rtol=1e-5,
    )


@pytest.mark.parametrize("L", [144, 200])  # non-multiples of the 64 block
def test_padded_forward_matches_reference(L):
    from controllora_tpu.ops.pallas_attention_vjp import flash_attention_padded

    q, k, v = make_qkv(bh=2, L=L)
    out = flash_attention_padded(q, k, v, 64, 64, True)
    assert out.shape == q.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_attention(q, k, v)), atol=2e-5, rtol=1e-5
    )


def test_padded_grads_match_reference():
    """KV masking must hold through the backward: padded columns contribute
    exactly zero to dq, and padded dO rows exactly zero to dk/dv."""
    from controllora_tpu.ops.pallas_attention_vjp import flash_attention_padded

    q, k, v = make_qkv(bh=2, L=144)

    def loss_flash(q, k, v):
        o = flash_attention_padded(q, k, v, 64, 64, True)
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(ref_attention(q, k, v)))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=5e-5, rtol=1e-4,
            err_msg=f"d{name} mismatch"
        )
