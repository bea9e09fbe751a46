"""Token merging (ops/tome.py — the tomesd method, TPU static-shape build).

Beyond-reference serving acceleration: bipartite soft matching merges spatially
redundant tokens before level-0 self-attention and unmerges the output. Tests pin
the merge/unmerge bookkeeping algebra (exactness on window-constant inputs, the
inverse-map gather, the linear-commutation property the folded path relies on)
and run the full guided pipeline with merging on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllora_tpu.config import ControlLoRAConfig
from controllora_tpu.data.tokenizer import HashTokenizer
from controllora_tpu.models import zoo
from controllora_tpu.models.control_lora import ControlLoRA
from controllora_tpu.models.unet import derive_cross_attention_dims
from controllora_tpu.ops.tome import ToMeConfig, build_merge, merge_count
from controllora_tpu.pipelines import StableDiffusionControlLoRAPipeline

KEY = jax.random.PRNGKey(7)


def grid_tokens(b, hh, ww, c, key):
    return jax.random.normal(key, (b, hh * ww, c), jnp.float32)


def test_zero_ratio_is_identity():
    x = grid_tokens(2, 8, 8, 6, KEY)
    merge, unmerge, lm = build_merge(x, 8, 8, ToMeConfig(ratio=0.0), KEY)
    assert lm == 64
    np.testing.assert_array_equal(np.asarray(merge(x)), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(unmerge(x)), np.asarray(x))


def test_merged_length_and_shapes():
    cfg = ToMeConfig(ratio=0.5, min_tokens=0)
    x = grid_tokens(3, 8, 8, 5, KEY)
    r = merge_count(cfg, 64)
    assert r == 32
    merge, unmerge, lm = build_merge(x, 8, 8, cfg, KEY)
    y = merge(x)
    assert y.shape == (3, 64 - r, 5)
    assert lm == 64 - r
    z = unmerge(y)
    assert z.shape == x.shape


def test_window_constant_roundtrip_exact():
    """Tokens constant within each 2x2 window merge losslessly: every src matches
    a token identical to itself (cosine 1), the mean preserves the value, and the
    unmerge hands it back — merge∘unmerge is exact end to end."""
    hh = ww = 8
    vals = jax.random.normal(KEY, (1, hh // 2, ww // 2, 4))
    x = jnp.repeat(jnp.repeat(vals, 2, axis=1), 2, axis=2).reshape(1, hh * ww, 4)
    cfg = ToMeConfig(ratio=0.75, min_tokens=0)  # merge the full src set
    merge, unmerge, lm = build_merge(x, hh, ww, cfg, KEY)
    assert lm == hh * ww // 4  # only the dst grid remains
    np.testing.assert_allclose(np.asarray(unmerge(merge(x))), np.asarray(x),
                               rtol=1e-5, atol=1e-6)


def test_unmerge_reads_representative_rows():
    """After unmerge, every position holds a row of the merged tensor: unmerged
    srcs and dsts their own row, merged srcs their dst's row."""
    x = grid_tokens(2, 4, 4, 3, KEY)
    cfg = ToMeConfig(ratio=0.5, min_tokens=0)
    merge, unmerge, _ = build_merge(x, 4, 4, cfg, KEY)
    y = merge(x)
    z = np.asarray(unmerge(y))
    rows = np.asarray(y)
    for b in range(z.shape[0]):
        for pos in range(z.shape[1]):
            match = np.isclose(rows[b], z[b, pos][None], atol=1e-6).all(-1).any()
            assert match, f"position {pos} of batch {b} is not a merged-tensor row"


def test_merge_commutes_with_linear_projection():
    """merge is row-averaging, hence linear: dense(merge(x)) == merge(dense(x)).
    This is what lets the folded serving path merge its per-position biases and
    stay identical to merging after projection."""
    x = grid_tokens(2, 8, 8, 6, KEY)
    w = jax.random.normal(jax.random.PRNGKey(1), (6, 10))
    merge, _, _ = build_merge(x, 8, 8, ToMeConfig(ratio=0.4, min_tokens=0), KEY)
    np.testing.assert_allclose(
        np.asarray(merge(x) @ w), np.asarray(merge(x @ w)), rtol=2e-4, atol=1e-5
    )


def test_batch1_broadcast_merge():
    """Batch-1 tensors (folded shared-guide biases) merge per-batch via broadcast."""
    x = grid_tokens(3, 4, 4, 5, KEY)
    merge, _, _ = build_merge(x, 4, 4, ToMeConfig(ratio=0.25, min_tokens=0), KEY)
    bias = grid_tokens(1, 4, 4, 5, jax.random.PRNGKey(3))
    merged = merge(bias)
    assert merged.shape[0] == 3  # one merge map per batch element


TINY_CONTROL = ControlLoRAConfig(
    block_out_channels=(8, 16, 16, 32),
    lora_block_in_channels=(32, 32, 32, 32),
    lora_block_out_channels=(32, 64, 96, 96),
    lora_cross_attention_dims=derive_cross_attention_dims(zoo.SMOKE_UNET),
)


@pytest.fixture(scope="module")
def pipe():
    unet, vae, text = zoo.build_models("smoke", dtype=jnp.float32)
    frozen = zoo.random_frozen(jax.random.PRNGKey(0), unet, vae, text,
                               latent_size=8, param_dtype=jnp.float32)
    cl = ControlLoRA(TINY_CONTROL)
    cp = jax.tree.map(lambda x: x + 0.01, cl.init(jax.random.PRNGKey(1), image_size=64))
    return StableDiffusionControlLoRAPipeline(
        unet, vae, text, HashTokenizer(), frozen, cl, cp
    )


def _guide():
    g = np.zeros((64, 64, 3), np.float32) - 1.0
    g[20:40, 20:40] = 1.0
    return g


def test_pipeline_tome_guided_render(pipe):
    """Full guided render with merging on (folded path: the per-position control
    biases merge alongside the hidden states): finite output, deterministic, and
    actually different from the exact render (the merge must not be a no-op)."""
    kw = dict(guide=_guide(), num_inference_steps=2, return_array=True,
              latents=jnp.zeros((1, 8, 8, 4), jnp.float32))
    exact = pipe("a house", **kw)[0]
    merged1 = pipe("a house", tome_ratio=0.5, tome_min_tokens=0, **kw)[0]
    merged2 = pipe("a house", tome_ratio=0.5, tome_min_tokens=0, **kw)[0]
    assert np.isfinite(merged1).all()
    np.testing.assert_array_equal(merged1, merged2)  # per-step keys are derived
    assert np.abs(merged1 - exact).max() > 1e-6
    # quality is NOT testable on random smoke weights (real merges of random
    # features perturb a lot); the published trade is measured on real models


def test_pipeline_tome_threaded_matches_folded(pipe):
    """The folded path (per-position biases merged inside CrossAttention) and the
    threaded path (per-adapter control states merged) remain equal with ToMe on —
    merging is linear, so it commutes with the exact adapter fold. Fresh plain
    LoRAs as pre-adapters force the unfoldable/threaded route while being exact
    no-ops (zero up factors), like test_pipeline.test_mix_lora_composition."""
    from controllora_tpu.models.lora import make_plain_lora_adapters

    kw = dict(guide=_guide(), num_inference_steps=2, return_array=True,
              tome_ratio=0.5, tome_min_tokens=0,
              latents=jnp.zeros((1, 8, 8, 4), jnp.float32))
    folded = pipe("a house", **kw)[0]
    loras = make_plain_lora_adapters(jax.random.PRNGKey(9), rank=4,
                                     unet_config=pipe.unet.config)
    threaded = pipe("a house", extra_loras=loras, **kw)[0]
    np.testing.assert_allclose(folded, threaded, atol=2e-3)
