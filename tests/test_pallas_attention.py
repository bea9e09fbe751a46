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


def test_serving_blocks_policy():
    from controllora_tpu.ops.pallas_attention import serving_blocks

    assert serving_blocks(4096, 40) == 1024
    assert serving_blocks(9216, 40) == 1024     # 768² latents
    assert serving_blocks(2560, 40) == 512      # 640×256 — pads are cheaper than
    assert serving_blocks(2304, 40) == 512      # small exact blocks (measured)
    assert serving_blocks(77, 64) == 512        # padded up to one block
    # VAE mid-block attention is single-head d=512: 1024 blocks overflow the
    # 16M scoped-VMEM limit (18.2M measured on v5e) — wide heads cap at 512
    assert serving_blocks(4096, 512) == 512
    assert serving_blocks(4096, 160) == 1024


@pytest.mark.parametrize("l", [96, 288, 2304 // 16])
def test_biased_attention_padded_masked(l):
    """Non-tiling lengths run flash with q/KV padding + in-kernel masking and
    match the unfused XLA reference exactly."""
    from controllora_tpu.ops.attention import dot_product_attention
    from controllora_tpu.ops.pallas_attention import biased_attention

    q = jax.random.normal(jax.random.PRNGKey(0), (2, l, 80))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, l, 80))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, l, 80))
    qb = jax.random.normal(jax.random.PRNGKey(3), (1, l, 80)) * 0.2
    out = biased_attention(q, k, v, heads=2, q_bias=qb, block=128)
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
