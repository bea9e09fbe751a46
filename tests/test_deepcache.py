"""DeepCache (models/unet.py `deepcache` modes + pipeline `deepcache_interval`).

Beyond-reference serving acceleration (Ma et al. 2023, "DeepCache: Accelerating
Diffusion Models for Free"): the deep UNet levels change slowly across adjacent
denoising steps, so full steps cache the feature entering the shallowest up block
and in-between steps recompute only the level-0 ops around that cached feature.

The load-bearing invariant tested here: the shallow path recomputes EXACTLY the
level-0 op sequence of the full path (same flax module names, same inputs), so
`shallow(x, cache_of(full(x))) == full(x)` — any divergence would mean the shallow
program runs different ops, i.e. the acceleration changes more than staleness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllora_tpu.config import ControlLoRAConfig
from controllora_tpu.data.tokenizer import HashTokenizer
from controllora_tpu.models import zoo
from controllora_tpu.models.control_lora import ControlLoRA
from controllora_tpu.models.unet import deepcache_feat_shape, derive_cross_attention_dims
from controllora_tpu.pipelines import StableDiffusionControlLoRAPipeline

KEY = jax.random.PRNGKey(11)


def _smoke_unet_io(variant="smoke"):
    unet, _, _ = zoo.build_models(variant, dtype=jnp.float32)
    lat = jax.random.normal(KEY, (2, 8, 8, 4), jnp.float32)
    t = jnp.array([3, 3], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (2, 77, unet.config.cross_attention_dim), jnp.float32)
    kw = {}
    if unet.config.addition_embed_type == "text_time":
        pooled = unet.config.projection_class_embeddings_input_dim - 6 * \
            unet.config.addition_time_embed_dim
        kw = dict(added_text_embeds=jnp.zeros((2, pooled), jnp.float32),
                  added_time_ids=jnp.zeros((2, 6), jnp.float32))
    params = unet.init(jax.random.PRNGKey(2), lat, t, ctx, **kw)["params"]
    return unet, params, lat, t, ctx, kw


@pytest.mark.parametrize("variant", ["smoke", "smokexl"])
def test_shallow_with_fresh_cache_equals_full(variant):
    """full mode returns the plain eps plus the cache, and a shallow step fed
    that cache on the SAME inputs reproduces the full eps bit-exactly (eager
    apply: identical per-op programs, so no fusion-reassociation slack).
    smokexl covers the attention-free shallowest-up-block family."""
    unet, params, lat, t, ctx, kw = _smoke_unet_io(variant)
    eps_plain = unet.apply({"params": params}, lat, t, ctx, **kw)
    eps_full, cache = unet.apply({"params": params}, lat, t, ctx,
                                 deepcache="full", **kw)
    assert cache.shape == deepcache_feat_shape(unet.config, 2, 8, 8)
    np.testing.assert_array_equal(np.asarray(eps_full), np.asarray(eps_plain))
    eps_shallow = unet.apply({"params": params}, lat, t, ctx,
                             deepcache="shallow", deepcache_feat=cache, **kw)
    np.testing.assert_array_equal(np.asarray(eps_shallow), np.asarray(eps_full))


def test_shallow_depends_only_on_level0_inputs():
    """A perturbed cache changes the output (the cache is live), and shallow mode
    never touches deep params (zeroing them changes nothing)."""
    unet, params, lat, t, ctx, kw = _smoke_unet_io()
    _, cache = unet.apply({"params": params}, lat, t, ctx, deepcache="full")
    base = unet.apply({"params": params}, lat, t, ctx,
                      deepcache="shallow", deepcache_feat=cache)
    bumped = unet.apply({"params": params}, lat, t, ctx,
                        deepcache="shallow", deepcache_feat=cache + 0.1)
    assert np.abs(np.asarray(bumped) - np.asarray(base)).max() > 1e-6

    def zero_deep(path, x):
        name = path[0].key
        return jnp.zeros_like(x) if name.startswith(("mid_", "down_blocks_1",
                                                     "down_blocks_2",
                                                     "down_blocks_3",
                                                     "up_blocks_0", "up_blocks_1",
                                                     "up_blocks_2")) else x

    gutted = jax.tree_util.tree_map_with_path(zero_deep, params)
    same = unet.apply({"params": gutted}, lat, t, ctx,
                      deepcache="shallow", deepcache_feat=cache)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(base))


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


def test_interval_1_is_exact_path(pipe):
    kw = dict(guide=_guide(), num_inference_steps=3, return_array=True,
              latents=jnp.zeros((1, 8, 8, 4), jnp.float32))
    exact = pipe("a house", **kw)[0]
    dc1 = pipe("a house", deepcache_interval=1, **kw)[0]
    np.testing.assert_array_equal(dc1, exact)


def test_interval_validation(pipe):
    with pytest.raises(ValueError, match="deepcache_interval"):
        pipe("x", num_inference_steps=2, deepcache_interval=0,
             latents=jnp.zeros((1, 8, 8, 4), jnp.float32))


def test_pipeline_deepcache_guided_render(pipe):
    """Guided render with interval 2: finite, deterministic, different from the
    exact render (the shallow steps must actually reuse stale deep features),
    and a 1-step schedule (every step full) matches the exact path."""
    kw = dict(guide=_guide(), num_inference_steps=4, return_array=True,
              latents=jnp.zeros((1, 8, 8, 4), jnp.float32))
    exact = pipe("a house", **kw)[0]
    dc_a = pipe("a house", deepcache_interval=2, **kw)[0]
    dc_b = pipe("a house", deepcache_interval=2, **kw)[0]
    assert np.isfinite(dc_a).all()
    np.testing.assert_array_equal(dc_a, dc_b)
    assert np.abs(dc_a.astype(np.float32) - exact.astype(np.float32)).max() > 0
    # interval >= steps: only step 0 is full — still renders finite output
    dc_all = pipe("a house", deepcache_interval=4, **kw)[0]
    assert np.isfinite(dc_all).all()


def test_deepcache_composes_with_tome(pipe):
    kw = dict(guide=_guide(), num_inference_steps=4, return_array=True,
              latents=jnp.zeros((1, 8, 8, 4), jnp.float32))
    img = pipe("a house", deepcache_interval=2, tome_ratio=0.5,
               tome_min_tokens=0, **kw)[0]
    assert np.isfinite(img).all()


def test_deepcache_mesh_equivalence(pipe):
    """Interval-2 rendering on a 2-device data mesh equals the single-device
    interval-2 render (the cache is a per-device scan carry; rows are
    batch-independent)."""
    from controllora_tpu.parallel import make_mesh

    mesh = make_mesh(devices=jax.devices()[:2])
    meshed = StableDiffusionControlLoRAPipeline(
        pipe.unet, pipe.vae, pipe.text_encoder, pipe.tokenizer, pipe.frozen,
        pipe.control_lora, pipe.control_params, mesh=mesh
    )
    lats = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 4), jnp.float32)
    kw = dict(guide=_guide(), num_inference_steps=4, return_array=True,
              latents=lats, deepcache_interval=2)
    solo = pipe("a house", **kw)
    dp = meshed("a house", **kw)
    for a, b in zip(dp, solo):
        np.testing.assert_allclose(a, b, atol=2e-3)
