"""Mixed-request batch serving: per-image prompts and per-image guides.

Beyond-reference capability (the reference apps render one prompt at a time,
apps/gradio_canny2image.py:83-88): the pipeline accepts a LIST of prompts (and a
batch of guides) and renders the whole heterogeneous batch as one compiled
sampler call — the primitive under serving/engine.py's micro-batcher. Every test
asserts the batched render equals the corresponding single-request renders, so
batching is a pure throughput move with no output change.

Also pins the control-batch alignment rule: under the block CFG layout
[u1..un ‖ c1..cn], a per-image control batch must TILE to the hidden batch
(models/lora.py _match_batch) — the reference's repeat-interleave
(models.py:209-212) is only ever executed at control batch 1, where the two
agree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllora_tpu.config import ControlLoRAConfig
from controllora_tpu.data.tokenizer import HashTokenizer
from controllora_tpu.models.control_lora import ControlLoRA
from controllora_tpu.models import zoo
from controllora_tpu.models.unet import derive_cross_attention_dims
from controllora_tpu.pipelines import StableDiffusionControlLoRAPipeline

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
    cp = cl.init(jax.random.PRNGKey(1), image_size=64)
    cp = jax.tree.map(lambda x: x + 0.01, cp)  # activate adapters
    return StableDiffusionControlLoRAPipeline(
        unet, vae, text, HashTokenizer(), frozen, cl, cp
    )


def make_guide(flip=False):
    g = np.zeros((64, 64, 3), np.float32) - 1.0
    if flip:
        g[5:25, 35:60] = 1.0
    else:
        g[20:40, 20:40] = 1.0
    return g


PROMPTS = ["red circle on blue", "green square on black", "tall yellow line"]


def test_mixed_prompts_match_singles(pipe):
    lats = jax.random.normal(jax.random.PRNGKey(31), (3, 8, 8, 4), jnp.float32)
    batched = pipe(PROMPTS, guide=make_guide(), num_inference_steps=2,
                   latents=lats, return_array=True)
    assert len(batched) == 3
    for i, p in enumerate(PROMPTS):
        single = pipe(p, guide=make_guide(), num_inference_steps=2,
                      latents=lats[i : i + 1], return_array=True)[0]
        np.testing.assert_allclose(batched[i], single, atol=5e-4)
    # the prompts genuinely differ from each other
    assert np.abs(batched[0] - batched[1]).max() > 1e-5


def test_mixed_negative_prompts(pipe):
    lats = jax.random.normal(jax.random.PRNGKey(32), (2, 8, 8, 4), jnp.float32)
    negs = ["blurry", "low-res"]
    batched = pipe(PROMPTS[:2], negative_prompt=negs, num_inference_steps=2,
                   guidance_scale=7.0, latents=lats, return_array=True)
    for i in range(2):
        single = pipe(PROMPTS[i], negative_prompt=negs[i], num_inference_steps=2,
                      guidance_scale=7.0, latents=lats[i : i + 1],
                      return_array=True)[0]
        np.testing.assert_allclose(batched[i], single, atol=5e-4)


def test_per_image_guides_match_singles(pipe):
    """Two different guides in one batch: guide i must steer image i exactly as
    it does in a solo render — the tile (not interleave) alignment under the
    block CFG layout, through the FOLDED adapter path (per-image fold biases)."""
    lats = jax.random.normal(jax.random.PRNGKey(33), (2, 8, 8, 4), jnp.float32)
    guides = np.stack([make_guide(), make_guide(flip=True)])
    batched = pipe("x", guide=guides, num_inference_steps=2, num_images=2,
                   latents=lats, return_array=True)
    assert len(batched) == 2
    for i in range(2):
        single = pipe("x", guide=guides[i], num_inference_steps=2,
                      latents=lats[i : i + 1], return_array=True)[0]
        np.testing.assert_allclose(batched[i], single, atol=5e-4)
    assert np.abs(batched[0] - batched[1]).max() > 1e-5


def test_per_image_guides_unfolded_chain(pipe):
    """Same alignment through the UNFOLDED threading path (pre/post chains can't
    fold): compose a second control so the pipeline falls back to chained
    adapters, and check per-image guides still land on their own images."""
    lats = jax.random.normal(jax.random.PRNGKey(34), (2, 8, 8, 4), jnp.float32)
    guides = np.stack([make_guide(), make_guide(flip=True)])
    extra = [(pipe.control_lora, pipe.control_params, make_guide(flip=True))]
    batched = pipe("x", guide=guides, num_inference_steps=2, num_images=2,
                   latents=lats, extra_controls=extra, return_array=True)
    for i in range(2):
        single = pipe("x", guide=guides[i], num_inference_steps=2,
                      latents=lats[i : i + 1], extra_controls=extra,
                      return_array=True)[0]
        np.testing.assert_allclose(batched[i], single, atol=5e-4)


def test_mixed_prompts_and_guides_combined(pipe):
    lats = jax.random.normal(jax.random.PRNGKey(35), (2, 8, 8, 4), jnp.float32)
    guides = np.stack([make_guide(), make_guide(flip=True)])
    batched = pipe(PROMPTS[:2], guide=guides, num_inference_steps=2,
                   latents=lats, return_array=True)
    for i in range(2):
        single = pipe(PROMPTS[i], guide=guides[i], num_inference_steps=2,
                      latents=lats[i : i + 1], return_array=True)[0]
        np.testing.assert_allclose(batched[i], single, atol=5e-4)


def test_mesh_mixed_prompts_match_single_device(pipe):
    """Per-image prompts shard image-major over the data axis: the (2, n, 77, h)
    context pair splits with the latents, so mixed-request batches scale over
    the serving mesh exactly like uniform ones."""
    from controllora_tpu.parallel import make_mesh

    mesh = make_mesh()
    meshed = StableDiffusionControlLoRAPipeline(
        pipe.unet, pipe.vae, pipe.text_encoder, pipe.tokenizer, pipe.frozen,
        pipe.control_lora, pipe.control_params, mesh=mesh,
    )
    prompts = [f"prompt variant {i}" for i in range(8)]
    lats = jax.random.normal(jax.random.PRNGKey(36), (8, 8, 8, 4), jnp.float32)
    sharded = meshed(prompts, guide=make_guide(), num_inference_steps=2,
                     latents=lats, return_array=True)
    single = pipe(prompts, guide=make_guide(), num_inference_steps=2,
                  latents=lats, return_array=True)
    assert len(sharded) == 8
    for a, b in zip(sharded, single):
        np.testing.assert_allclose(a, b, atol=5e-4)


def test_cfg_mesh_mixed_prompts_match_single_device(pipe):
    """Per-image prompts under the 'cfg' guidance-split axis: each rank takes its
    whole per-image branch (ctx[rank] is already image-major)."""
    from controllora_tpu.parallel import make_serving_mesh

    mesh = make_serving_mesh()  # data 4 x cfg 2
    meshed = StableDiffusionControlLoRAPipeline(
        pipe.unet, pipe.vae, pipe.text_encoder, pipe.tokenizer, pipe.frozen,
        pipe.control_lora, pipe.control_params, mesh=mesh,
    )
    prompts = [f"cfg prompt {i}" for i in range(4)]
    lats = jax.random.normal(jax.random.PRNGKey(37), (4, 8, 8, 4), jnp.float32)
    sharded = meshed(prompts, guide=make_guide(), num_inference_steps=2,
                     guidance_scale=7.0, latents=lats, return_array=True)
    single = pipe(prompts, guide=make_guide(), num_inference_steps=2,
                  guidance_scale=7.0, latents=lats, return_array=True)
    for a, b in zip(sharded, single):
        np.testing.assert_allclose(a, b, atol=5e-4)


def test_validation_errors(pipe):
    with pytest.raises(ValueError, match="conflict"):
        pipe(PROMPTS, num_inference_steps=2, num_images=2)
    lats = jnp.zeros((2, 8, 8, 4), jnp.float32)
    with pytest.raises(ValueError, match="conflict"):
        pipe(PROMPTS, num_inference_steps=2, latents=lats)
    with pytest.raises(ValueError, match="per-image prompts"):
        pipe(["just one"], num_inference_steps=2, latents=lats)
    with pytest.raises(ValueError, match="guide batch"):
        pipe("x", guide=np.stack([make_guide()] * 3), num_inference_steps=2,
             num_images=2)
    with pytest.raises(ValueError, match="negative"):
        pipe(PROMPTS, negative_prompt=["only one"], num_inference_steps=2)
    # extra_controls guides carry the same 1-or-n contract as the main guide:
    # a batch that merely divides the CFG layout (2 with n=3) must error, not
    # tile misaligned in _match_batch
    lats3 = jnp.zeros((3, 8, 8, 4), jnp.float32)
    extra = [(pipe.control_lora, pipe.control_params,
              np.stack([make_guide()] * 2))]
    with pytest.raises(ValueError, match="extra_controls guide batch"):
        pipe("x", num_inference_steps=2, latents=lats3, extra_controls=extra)


def test_control_batch_tiles_not_interleaves():
    """Regression pin for _match_batch: control batch n against hidden batch 2n
    must TILE ([g1..gn, g1..gn]) so guide i pairs with hidden rows i and n+i of
    the block [uncond ‖ cond] CFG layout."""
    from controllora_tpu.models.lora import _match_batch

    c = jnp.stack([jnp.full((4, 2), 1.0), jnp.full((4, 2), 2.0)])  # (2, L, C)
    out = _match_batch(c, 4)
    np.testing.assert_array_equal(np.asarray(out[:, 0, 0]), [1.0, 2.0, 1.0, 2.0])
