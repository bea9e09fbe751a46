"""Multi-chip serving for the SDXL family (virtual 8-device CPU mesh).

The text_time micro-conditioning pair (pooled text, time ids) must follow the
context through every mesh path: replicated on the 'data' axis, rank-indexed on
the 'cfg' guidance-split axis, replicated under 'model' tensor parallelism.
Each test proves per-device results equal the single-device render."""

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


@pytest.fixture(scope="module")
def stack():
    unet, vae, text = zoo.build_models("smokexl", dtype=jnp.float32)
    frozen = zoo.random_frozen(jax.random.PRNGKey(0), unet, vae, text,
                               latent_size=8, param_dtype=jnp.float32)
    ccfg = ControlLoRAConfig(
        block_out_channels=(8, 8, 16, 16),
        norm_num_groups=8,
        lora_block_in_channels=(16, 16, 16),
        lora_block_out_channels=unet.config.block_out_channels,
        lora_cross_attention_dims=derive_cross_attention_dims(unet.config),
    )
    cl = ControlLoRA(ccfg)
    cp = jax.tree.map(lambda x: x + 0.01,
                      cl.init(jax.random.PRNGKey(3), image_size=64))
    return unet, vae, text, frozen, cl, cp


def _pipe(stack, mesh=None, control=True):
    unet, vae, text, frozen, cl, cp = stack
    return StableDiffusionControlLoRAPipeline(
        unet, vae, text, HashTokenizer(), frozen,
        cl if control else None, cp if control else None, mesh=mesh)


GUIDE = np.zeros((64, 64, 3), np.float32) - 1.0
GUIDE[24:40, 24:40] = 1.0


def test_sdxl_data_cfg_mesh_matches_single_device(stack):
    """(data=4, cfg=2): batch shards, guidance pair splits; pooled/time_ids
    follow their branch. Bitwise-equal images are not expected (different
    reduction orders) but 1e-4 agreement is."""
    lats = jax.random.normal(jax.random.PRNGKey(5), (4, 8, 8, 4), jnp.float32)
    a = _pipe(stack, make_serving_mesh(cfg=True))(
        "p", guide=GUIDE, num_inference_steps=2, latents=lats, return_array=True)
    b = _pipe(stack)(
        "p", guide=GUIDE, num_inference_steps=2, latents=lats, return_array=True)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=1e-4)


def test_sdxl_tp_mesh_matches_single_device(stack):
    """model=2 divides every smokexl level's heads (2,4,6); added conds
    replicate across the tensor-parallel ranks."""
    lats = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 8, 4), jnp.float32)
    mesh = make_serving_mesh(cfg=True, model=2)
    a = _pipe(stack, mesh)(
        "p", guide=GUIDE, num_inference_steps=2, latents=lats, return_array=True)
    b = _pipe(stack)(
        "p", guide=GUIDE, num_inference_steps=2, latents=lats, return_array=True)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=1e-3)


def test_sdxl_tp_rejects_indivisible_heads(stack):
    """tp=4 cannot split level-0's 2 heads — fail at pipeline construction."""
    with pytest.raises(ValueError, match="whole heads"):
        _pipe(stack, make_serving_mesh(cfg=False, model=4), control=False)
