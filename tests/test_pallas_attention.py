"""First-party pallas flash kernel: interpret-mode exactness vs reference attention."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    import jax.experimental.pallas as pl

    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    yield


def ref_attention(q, k, v):
    s = jnp.einsum("bld,bkd->blk", q, k) * (q.shape[-1] ** -0.5)
    return jnp.einsum("blk,bkd->bld", jax.nn.softmax(s, -1), v)


@pytest.mark.parametrize("bq,bk", [(256, 256), (256, 128), (128, 256), (64, 64)])
def test_flash_fwd_exact(bq, bk):
    from controllora_tpu.ops.pallas_attention import flash_attention_fwd

    q = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 40), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 256, 40), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 256, 40), jnp.float32)
    out = flash_attention_fwd(q, k, v, block_q=bq, block_k=bk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_attention(q, k, v)),
                               atol=2e-6)


def test_pick_block():
    from controllora_tpu.ops.pallas_attention import pick_block

    assert pick_block(4096) == 1024
    assert pick_block(9216) == 1024          # 768² latents
    assert pick_block(2560) == 512           # 640×256: % 512 == 0, % 1024 != 0
    assert pick_block(2304) == 256           # 384² latents = 9·256
    assert pick_block(3136) == 64            # 448² latents = 49·64
    assert pick_block(77) is None            # CLIP context never tiles
    assert pick_block(256, cap=128) == 128
    # VAE mid-block attention is single-head d=512: 1024 blocks overflow the
    # 16M scoped-VMEM limit (18.2M measured on v5e) — wide heads cap at 512
    assert pick_block(4096, head_dim=512) == 512
    assert pick_block(4096, head_dim=40) == 1024
    assert pick_block(4096, head_dim=160) == 1024


def test_biased_attention_fallback_untileable():
    """Lengths no block tiles route through the unfused XLA path, not an assert."""
    from controllora_tpu.ops.attention import dot_product_attention
    from controllora_tpu.ops.pallas_attention import biased_attention

    q = jax.random.normal(jax.random.PRNGKey(0), (2, 96, 80))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 96, 80))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 96, 80))
    qb = jax.random.normal(jax.random.PRNGKey(3), (1, 96, 80)) * 0.2
    out = biased_attention(q, k, v, heads=2, q_bias=qb, block=64)
    # 96 % 64 != 0 and 96 % 32... pick_block floor is 64, so this is the fallback
    ref = dot_product_attention(q + qb, k, v, heads=2, backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_biased_attention_matches_unfused():
    from controllora_tpu.ops.attention import dot_product_attention
    from controllora_tpu.ops.pallas_attention import biased_attention

    q = jax.random.normal(jax.random.PRNGKey(4), (2, 256, 80))
    k = jax.random.normal(jax.random.PRNGKey(5), (2, 256, 80))
    v = jax.random.normal(jax.random.PRNGKey(6), (2, 256, 80))
    qb = jax.random.normal(jax.random.PRNGKey(3), (1, 256, 80)) * 0.2
    kb = jax.random.normal(jax.random.PRNGKey(7), (1, 256, 80)) * 0.1
    out = biased_attention(q, k, v, heads=2, q_bias=qb, k_bias=kb, block=128)
    ref = dot_product_attention(q + qb, k + kb, v, heads=2, backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)
