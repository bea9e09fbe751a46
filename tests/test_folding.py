"""Folding correctness: folded-weights + bias path must match the full adapter-chain
math bit-for-bit (fp32) across all reference config variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllora_tpu.config import ControlLoRAConfig
from controllora_tpu.models.control_lora import ControlLoRA
from controllora_tpu.models.lora import make_plain_lora_adapters, AdapterStack, AttnAdapter
from controllora_tpu.models.unet import (
    UNet2DConditionModel,
    UNetConfig,
    derive_cross_attention_dims,
)
from controllora_tpu.ops.folding import fold_adapters

TINY_UNET = UNetConfig(
    block_out_channels=(32, 64, 96, 96), layers_per_block=1, attention_head_dim=4
)


def tiny_control_cfg(**kw):
    base = dict(
        block_out_channels=(8, 16, 16, 32),
        lora_block_in_channels=(32, 32, 32, 32),
        lora_block_out_channels=(32, 64, 96, 96),
        lora_cross_attention_dims=derive_cross_attention_dims(TINY_UNET),
    )
    base.update(kw)
    return ControlLoRAConfig(**base)


@pytest.fixture(scope="module")
def unet_and_inputs():
    m = UNet2DConditionModel(TINY_UNET)
    params = m.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.array([1]),
        jnp.zeros((1, 77, 768)),
    )["params"]
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (2, 77, 768)) * 0.05
    t = jnp.array([7, 7])
    return m, params, x, t, ctx


VARIANTS = [
    ("v1_default", dict()),
    ("v1_post_add", dict(lora_post_add=True)),
    ("v1_skip_kv", dict(lora_key_states_skipped=True, lora_value_states_skipped=True)),
    (
        "v1_concat_danbooru",
        dict(
            lora_pre_conv_skipped=True,
            lora_concat_hidden=True,
            lora_control_self_add=False,
            lora_control_rank=8,
        ),
    ),
    ("v2", dict(lora_control_version=2)),
]


@pytest.mark.parametrize("name,kw", VARIANTS, ids=[v[0] for v in VARIANTS])
def test_fold_matches_unfolded(unet_and_inputs, name, kw):
    m, params, x, t, ctx = unet_and_inputs
    cfg = tiny_control_cfg(**kw)
    cl = ControlLoRA(cfg)
    cp = cl.init(jax.random.PRNGKey(1), image_size=64)
    # activate everything so folding errors can't hide behind zero factors
    cp = jax.tree.map(
        lambda v: v + 0.03 * jnp.sign(jnp.sin(jnp.arange(v.size, dtype=jnp.float32)
                                              ).reshape(v.shape)), cp
    )
    guide = jnp.linspace(-1, 1, 64 * 64 * 3).reshape(1, 64, 64, 3)
    adapters = cl(cp, guide, TINY_UNET)

    ref = m.apply({"params": params}, x, t, ctx, adapters, 0.8)
    folded_params, biases = fold_adapters(params, adapters, lora_scale=0.8)
    got = m.apply({"params": folded_params}, x, t, ctx, biases, 0.8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-3)
    # and the folded result differs from the adapter-free baseline
    base = m.apply({"params": params}, x, t, ctx, None)
    assert np.abs(np.asarray(got) - np.asarray(base)).max() > 1e-4


def test_fold_plain_lora(unet_and_inputs):
    m, params, x, t, ctx = unet_and_inputs
    loras = make_plain_lora_adapters(jax.random.PRNGKey(5), rank=4, unet_config=TINY_UNET)
    loras = {
        k: v.replace(params=jax.tree.map(lambda a: a + 0.02, v.params))
        for k, v in loras.items()
    }
    stacks = {k: AdapterStack(main=v) for k, v in loras.items()}
    ref = m.apply({"params": params}, x, t, ctx, stacks, 1.0)
    folded_params, biases = fold_adapters(params, stacks, lora_scale=1.0)
    got = m.apply({"params": folded_params}, x, t, ctx, biases, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_fold_rejects_chains(unet_and_inputs):
    m, params, *_ = unet_and_inputs
    loras = make_plain_lora_adapters(jax.random.PRNGKey(5), rank=2, unet_config=TINY_UNET)
    name = next(iter(loras))
    stacks = {name: AdapterStack(main=loras[name], pre=(loras[name],))}
    with pytest.raises(ValueError):
        fold_adapters(params, stacks)
