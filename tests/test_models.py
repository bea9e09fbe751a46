"""Model-stack tests on tiny configs (full SD1.5 compiles are minutes on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllora_tpu.config import ControlLoRAConfig, get_preset
from controllora_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from controllora_tpu.models.control_lora import ControlLoRA
from controllora_tpu.models.unet import (
    UNet2DConditionModel,
    UNetConfig,
    attention_processor_names,
    derive_cross_attention_dims,
    processor_bucket,
    processor_cross_dim,
    processor_hidden_size,
)
from controllora_tpu.models.vae import AutoencoderKL, VAEConfig

TINY_UNET = UNetConfig(
    block_out_channels=(32, 64, 96, 96), layers_per_block=1, attention_head_dim=4
)
TINY_CONTROL = ControlLoRAConfig(
    block_out_channels=(8, 16, 16, 32),
    lora_block_in_channels=(32, 32, 32, 32),
    lora_block_out_channels=(32, 64, 96, 96),
    lora_cross_attention_dims=derive_cross_attention_dims(TINY_UNET),
)


def test_build_adapters_slot_shortfall_raises():
    """A config providing fewer adapter slots than the UNet has attention layers must
    fail loudly at install, naming the first uncovered layer (the reference's short
    dict fails diffusers' set_attn_processor count check; silently dropping control
    on trailing layers is never valid)."""
    import dataclasses

    short = dataclasses.replace(
        TINY_CONTROL,
        lora_cross_attention_dims=tuple(
            b[:-2] if len(b) > 2 else b
            for b in TINY_CONTROL.lora_cross_attention_dims
        ),
    )
    cl = ControlLoRA(short)
    params = cl.init(jax.random.PRNGKey(0), image_size=64)
    controls = cl.apply(params, jnp.zeros((1, 64, 64, 3)))
    with pytest.raises(ValueError, match="adapter slot"):
        cl.build_adapters(params, controls, TINY_UNET)


@pytest.fixture(scope="module")
def tiny_unet():
    m = UNet2DConditionModel(TINY_UNET)
    params = m.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.array([1]), jnp.zeros((1, 77, 768))
    )
    return m, params


def test_unet_forward_shapes(tiny_unet):
    m, params = tiny_unet
    out = m.apply(params, jnp.ones((2, 8, 8, 4)), jnp.array([10, 500]), jnp.ones((2, 77, 768)))
    assert out.shape == (2, 8, 8, 4)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_unet_timestep_dependence(tiny_unet):
    m, params = tiny_unet
    x = jnp.ones((1, 8, 8, 4))
    ctx = jnp.ones((1, 77, 768))
    o1 = m.apply(params, x, jnp.array([10]), ctx)
    o2 = m.apply(params, x, jnp.array([900]), ctx)
    assert np.abs(np.asarray(o1 - o2)).max() > 1e-4


def test_unet_context_dependence(tiny_unet):
    m, params = tiny_unet
    x = jnp.ones((1, 8, 8, 4))
    o1 = m.apply(params, x, jnp.array([10]), jnp.ones((1, 77, 768)))
    o2 = m.apply(params, x, jnp.array([10]), -jnp.ones((1, 77, 768)))
    assert np.abs(np.asarray(o1 - o2)).max() > 1e-4


def test_processor_inventory_sd15():
    names = attention_processor_names()
    assert len(names) == 32  # 12 down + 2 mid + 18 up (reference trainer comment :463-466)
    buckets = {}
    for n in names:
        b = processor_bucket(n, 4)
        buckets.setdefault(b, []).append(n)
    assert [len(buckets[i]) for i in range(4)] == [10, 10, 10, 2]
    # cross-dim alternation matches lora_cross_attention_dims (None, 768, ...)
    for i in range(4):
        dims = [processor_cross_dim(n) for n in buckets[i]]
        assert dims == list(ControlLoRAConfig().lora_cross_attention_dims[i])
    # hidden sizes per bucket
    assert {processor_hidden_size(n) for n in buckets[0]} == {320}
    assert {processor_hidden_size(n) for n in buckets[1]} == {640}
    assert {processor_hidden_size(n) for n in buckets[2]} == {1280}
    assert {processor_hidden_size(n) for n in buckets[3]} == {1280}


def test_control_lora_end_to_end_with_unet(tiny_unet):
    m, params = tiny_unet
    cl = ControlLoRA(TINY_CONTROL)
    cp = cl.init(jax.random.PRNGKey(1), image_size=64)
    guide = jnp.linspace(-1, 1, 1 * 64 * 64 * 3).reshape(1, 64, 64, 3)

    controls = cl.apply(cp, guide)
    # bucket resolutions follow latent pyramid: 8², 4², 2², 1² for a 64² guide (÷8 then ÷2)
    assert [c.shape[1] for c in controls] == [64, 16, 4, 1]
    assert [c.shape[2] for c in controls] == [32, 64, 96, 96]

    adapters = cl.build_adapters(cp, controls, TINY_UNET)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    ctx = jnp.ones((1, 77, 768)) * 0.1
    base = m.apply(params, x, jnp.array([10]), ctx)
    fresh = m.apply(params, x, jnp.array([10]), ctx, adapters)
    # fresh adapters are exact no-ops (zero up-factors)
    np.testing.assert_allclose(np.asarray(base), np.asarray(fresh), atol=1e-6)

    # activate q-path: output must now depend on the guide
    cp["lora_layers"][0][0]["to_q"]["up"] = cp["lora_layers"][0][0]["to_q"]["up"] + 0.05
    o1 = m.apply(params, x, jnp.array([10]), ctx, cl(cp, guide, TINY_UNET))
    o2 = m.apply(params, x, jnp.array([10]), ctx, cl(cp, -guide, TINY_UNET))
    assert np.abs(np.asarray(o1 - o2)).max() > 1e-6
    assert np.abs(np.asarray(o1 - base)).max() > 1e-6


def test_control_lora_grads_flow(tiny_unet):
    m, params = tiny_unet
    cl = ControlLoRA(TINY_CONTROL)
    cp = cl.init(jax.random.PRNGKey(1), image_size=64)
    guide = jnp.ones((1, 64, 64, 3)) * 0.3
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    ctx = jnp.ones((1, 77, 768)) * 0.1

    def loss(cp_):
        return jnp.mean(m.apply(params, x, jnp.array([10]), ctx, cl(cp_, guide, TINY_UNET)) ** 2)

    # jit the grad: un-jitted CPU autodiff runs op-by-op (minutes); one compiled
    # program serves both calls and lands in the persistent cache
    grad_fn = jax.jit(jax.grad(loss))
    g = grad_fn(cp)
    total = sum(float(jnp.abs(t).sum()) for t in jax.tree.leaves(g))
    assert total > 0
    # At exact init every up-factor is zero, so the encoder gradient is exactly zero
    # (same as the torch reference's zero-init LoRALinearLayer). After perturbing the
    # up-factors — as the first optimizer step would — encoder grads must flow.
    enc_g0 = sum(float(jnp.abs(t).sum()) for t in jax.tree.leaves(g["encoder"]))
    assert enc_g0 == 0.0
    cp_active = jax.tree.map(lambda t: t + 0.01, cp)
    g2 = grad_fn(cp_active)
    enc_g = sum(float(jnp.abs(t).sum()) for t in jax.tree.leaves(g2["encoder"]))
    assert enc_g > 0


def test_param_counts_match_reference_formula():
    """Exact parameter counts hand-derived from the reference architecture
    (reference models.py:618-808; README ~'7M'/'5M' are rounded claims)."""
    cl = ControlLoRA(get_preset("base"))
    p = cl.init(jax.random.PRNGKey(0), image_size=64)
    enc = sum(x.size for x in jax.tree.leaves(p["encoder"]))
    lora = sum(x.size for x in jax.tree.leaves(p["lora_layers"]))
    assert enc == 5_050_176
    assert lora == 996_864

    cl2 = ControlLoRA(get_preset("diffusiondb-canny-v2"))
    p2 = cl2.init(jax.random.PRNGKey(0), image_size=64)
    assert sum(x.size for x in jax.tree.leaves(p2)) == 5_000_704


def test_vae_roundtrip_shapes():
    cfg = VAEConfig(block_out_channels=(16, 16, 32, 32), layers_per_block=1, norm_num_groups=8)
    vae = AutoencoderKL(cfg)
    x = jnp.ones((1, 32, 32, 3)) * 0.2
    params = vae.init(jax.random.PRNGKey(0), x)  # __call__ initializes encoder + decoder
    mean, logvar = vae.apply(params, x, method=vae.encode_moments)
    assert mean.shape == (1, 4, 4, 4) and logvar.shape == (1, 4, 4, 4)
    z = vae.apply(params, x, jax.random.PRNGKey(1), method=vae.encode)
    img = vae.apply(params, z, method=vae.decode)
    assert img.shape == x.shape
    assert np.isfinite(np.asarray(img)).all()


def test_vae_decode_per_image_matches_batched():
    """Serving uses per-image lax.map decode (batched decode is 2.4x superlinear
    on v5e, docs/BENCHMARKS.md) — numerics must match batched decode exactly."""
    from controllora_tpu.models.vae import decode_per_image

    cfg = VAEConfig(block_out_channels=(16, 16, 32, 32), layers_per_block=1,
                    norm_num_groups=8)
    vae = AutoencoderKL(cfg)
    z1 = jnp.ones((1, 4, 4, 4)) * 0.3
    params = vae.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)))["params"]
    z = jax.random.normal(jax.random.PRNGKey(1), (3, 4, 4, 4))
    batched = vae.apply({"params": params}, z, method=vae.decode)
    mapped = decode_per_image(vae, params, z)
    np.testing.assert_allclose(np.asarray(mapped), np.asarray(batched), atol=1e-5)
    # batch-1 falls through to the plain decode
    one = decode_per_image(vae, params, z1)
    assert one.shape == (1, 32, 32, 3)


def test_clip_causal_mask():
    cfg = CLIPTextConfig(vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
                         intermediate_size=64)
    m = CLIPTextModel(cfg)
    ids = jnp.array([[1, 2, 3, 4, 5] + [0] * 72])
    params = m.init(jax.random.PRNGKey(0), ids)
    out1 = m.apply(params, ids)
    assert out1.shape == (1, 77, 32)
    ids2 = ids.at[0, 4].set(9)  # change token 4: positions 0..3 must be unaffected
    out2 = m.apply(params, ids2)
    np.testing.assert_allclose(np.asarray(out1[0, :4]), np.asarray(out2[0, :4]), atol=1e-5)
    assert np.abs(np.asarray(out1[0, 4:]) - np.asarray(out2[0, 4:])).max() > 1e-4
