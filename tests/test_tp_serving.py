"""Tensor-parallel serving ('model' mesh axis, parallel/tp.py) equivalence tests.

The Megatron-style sharding of the UNet transformer blocks must be EXACT: psums
reassociate fp additions but every product is computed once. The raw TP UNet
forward matches single-device to ~3e-6 (fp32 reassociation only); the multistep
sampler's extrapolation coefficients and the VAE decode amplify that ~100x over
2 steps, so the image-level bound is 1e-3 — same rationale as
__graft_entry__.dryrun_multichip's 2e-3 bound, and far below the one-uint8-level
7.8e-3 that would be visible."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllora_tpu.config import ControlLoRAConfig
from controllora_tpu.data.tokenizer import HashTokenizer
from controllora_tpu.models import zoo
from controllora_tpu.models.control_lora import ControlLoRA
from controllora_tpu.models.unet import derive_cross_attention_dims
from controllora_tpu.parallel import make_serving_mesh
from controllora_tpu.pipelines import StableDiffusionControlLoRAPipeline

TINY_CONTROL = ControlLoRAConfig(
    block_out_channels=(8, 16, 16, 32),
    lora_block_in_channels=(32, 32, 32, 32),
    lora_block_out_channels=(32, 64, 96, 96),
    lora_cross_attention_dims=derive_cross_attention_dims(zoo.SMOKE_UNET),
)


@pytest.fixture(scope="module")
def stack():
    unet, vae, text = zoo.build_models("smoke", dtype=jnp.float32)
    frozen = zoo.random_frozen(jax.random.PRNGKey(0), unet, vae, text,
                               latent_size=8, param_dtype=jnp.float32)
    cl = ControlLoRA(TINY_CONTROL)
    cp = cl.init(jax.random.PRNGKey(1), image_size=64)
    cp = jax.tree.map(lambda x: x + 0.01, cp)
    return unet, vae, text, frozen, cl, cp


@pytest.fixture(scope="module")
def single(stack):
    unet, vae, text, frozen, cl, cp = stack
    return StableDiffusionControlLoRAPipeline(
        unet, vae, text, HashTokenizer(), frozen, cl, cp
    )


def make_guide():
    g = np.zeros((64, 64, 3), np.float32) - 1.0
    g[20:40, 20:40] = 1.0
    return g


def _tp_pipe(stack, mesh):
    unet, vae, text, frozen, cl, cp = stack
    return StableDiffusionControlLoRAPipeline(
        unet, vae, text, HashTokenizer(), frozen, cl, cp, mesh=mesh
    )


def test_tp_mesh_guided_matches_single_device(stack, single):
    """data 2 × model 4: folded ControlLoRA serving with head-sharded attention
    and per-position control biases sharded with their q/k/v columns."""
    mesh = make_serving_mesh(cfg=False, model=4)
    assert dict(mesh.shape) == {"data": 2, "model": 4}
    tp = _tp_pipe(stack, mesh)
    lats = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 4), jnp.float32)
    a = tp("x", guide=make_guide(), num_inference_steps=2, latents=lats,
           return_array=True)
    b = single("x", guide=make_guide(), num_inference_steps=2, latents=lats,
               return_array=True)
    assert len(a) == 2
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=1e-3)


def test_tp_cfg_data_three_axis_mesh(stack, single):
    """The full three-axis latency+throughput composition on 8 devices:
    data 2 × cfg 2 × model 2."""
    mesh = make_serving_mesh(cfg=True, model=2)
    assert dict(mesh.shape) == {"data": 2, "cfg": 2, "model": 2}
    tp = _tp_pipe(stack, mesh)
    lats = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 4), jnp.float32)
    a = tp("x", guide=make_guide(), num_inference_steps=2, guidance_scale=7.0,
           latents=lats, return_array=True)
    b = single("x", guide=make_guide(), num_inference_steps=2,
               guidance_scale=7.0, latents=lats, return_array=True)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=1e-3)


def test_tp_unguided_plain_sd(stack, single):
    """Plain text-to-image (no adapters) through the sharded transformer."""
    mesh = make_serving_mesh(cfg=False, model=4)
    tp = _tp_pipe(stack, mesh)
    lats = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, 4), jnp.float32)
    a = tp("plain", num_inference_steps=2, latents=lats, height=64, width=64,
           return_array=True)
    b = single("plain", num_inference_steps=2, latents=lats, height=64,
               width=64, return_array=True)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=1e-3)


def test_tp_rejects_unfoldable_chains(stack):
    """Pre/post adapter chains (mix path) cannot shard by heads — the pipeline
    must say so instead of silently mis-serving."""
    from controllora_tpu.models.lora import make_plain_lora_adapters

    mesh = make_serving_mesh(cfg=False, model=2)
    tp = _tp_pipe(stack, mesh)
    loras = make_plain_lora_adapters(jax.random.PRNGKey(9), rank=2,
                                     unet_config=tp.unet.config)
    with pytest.raises(ValueError, match="cannot fold"):
        tp("x", guide=make_guide(), num_inference_steps=2, num_images=4,
           extra_loras=loras)


def test_tp_validates_head_divisibility(stack):
    """Smoke config has 4 heads; a model axis of 8 cannot shard whole heads."""
    unet, vae, text, frozen, cl, cp = stack
    mesh = make_serving_mesh(cfg=False, model=8)
    with pytest.raises(ValueError, match="whole heads"):
        StableDiffusionControlLoRAPipeline(
            unet, vae, text, HashTokenizer(), frozen, cl, cp, mesh=mesh
        )


def test_geglu_permute_blocks():
    """Per-rank GEGLU re-blocking: rank r's contiguous slice of the permuted
    kernel must be [a_r ‖ gate_r] of the original column layout."""
    from controllora_tpu.parallel.tp import _geglu_permute

    d, f, tp = 3, 8, 4
    k = jnp.arange(d * 2 * f, dtype=jnp.float32).reshape(d, 2 * f)
    p = _geglu_permute(k, tp)
    a, gate = k[:, :f], k[:, f:]
    per = 2 * f // tp
    for r in range(tp):
        blk = p[:, r * per:(r + 1) * per]
        fl = f // tp
        np.testing.assert_array_equal(blk[:, :fl], a[:, r * fl:(r + 1) * fl])
        np.testing.assert_array_equal(blk[:, fl:], gate[:, r * fl:(r + 1) * fl])


def test_serving_mesh_shapes():
    from controllora_tpu.parallel import make_mesh

    assert dict(make_serving_mesh(model=2).shape) == {
        "data": 2, "cfg": 2, "model": 2}
    assert dict(make_serving_mesh(cfg=False, model=2).shape) == {
        "data": 4, "model": 2}
    with pytest.raises(ValueError, match="cannot tile"):
        make_serving_mesh(model=3)
