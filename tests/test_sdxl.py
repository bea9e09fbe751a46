"""SDXL-family architecture support (beyond-reference model family).

The reference targets SD1.5 only; SDXL differs structurally: 3 resolution
levels with per-block transformer depth (transformer_layers_per_block=(1,2,10)),
no attention on the first down block, dual text encoders (CLIP ViT-L penultimate
768 + OpenCLIP ViT-bigG penultimate 1280, concat 2048) with an EOS-pooled
projection head, and "text_time" micro-conditioning (pooled text + 6 size ids
through an add_embedding MLP into the time embedding). These tests exercise
each at smoke widths (zoo 'smokexl') plus the real SDXL config shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllora_tpu.models import zoo
from controllora_tpu.models.unet import (
    UNet2DConditionModel,
    attention_processor_names,
    derive_cross_attention_dims,
)


def test_sdxl_config_shapes():
    """Real SDXL geometry: dim_head 64 on attention levels, 2048-d context,
    text_time conditioning input 2816 = pooled 1280 + 6*256 size embedding,
    140 attention processors (depth-weighted enumeration)."""
    cfg = zoo.SDXL_UNET
    assert cfg.block_out_channels == (320, 640, 1280)
    assert cfg.transformer_layers_per_block == (1, 2, 10)
    for ch, heads in zip(cfg.block_out_channels[1:], cfg.attention_head_dim[1:]):
        assert ch // heads == 64
    assert cfg.cross_attention_dim == 2048
    assert cfg.projection_class_embeddings_input_dim == 2816
    assert (zoo.SDXL_CLIP2.projection_dim + 6 * cfg.addition_time_embed_dim
            == cfg.projection_class_embeddings_input_dim)
    names = attention_processor_names(cfg)
    # down: 2*2*2 + 2*10*2; mid: 10*2; up: 3*10*2 + 3*2*2
    assert len(names) == 8 + 40 + 20 + 60 + 12
    assert "down_blocks.2.attentions.0.transformer_blocks.9.attn2.processor" in names
    assert not any(n.startswith("down_blocks.0") for n in names)
    # context width = ViT-L 768 + ViT-bigG 1280
    assert zoo.SDXL_CLIP1.hidden_size + zoo.SDXL_CLIP2.hidden_size == 2048
    assert zoo.SDXL_VAE.scaling_factor == 0.13025


def test_smokexl_processor_inventory():
    cfg = zoo.SMOKEXL_UNET
    names = attention_processor_names(cfg)
    # down: b1 1 layer*d1*2 + b2 1 layer*d2*2; mid d2*2; up: b0 2*d2*2 + b1 2*d1*2
    assert len(names) == 2 + 4 + 4 + 8 + 4
    assert "mid_block.attentions.0.transformer_blocks.1.attn1.processor" in names
    dims = derive_cross_attention_dims(cfg)
    assert len(dims) == 3
    assert dims[0] == ()  # no attention at level 0 (DownBlock2D + UpBlock2D)
    assert all(d in (None, cfg.cross_attention_dim) for b in dims for d in b)


@pytest.fixture(scope="module")
def smokexl():
    unet, vae, text = zoo.build_models("smokexl", dtype=jnp.float32)
    frozen = zoo.random_frozen(jax.random.PRNGKey(0), unet, vae, text,
                               latent_size=8, param_dtype=jnp.float32)
    return unet, vae, text, frozen


def test_dual_text_encoder(smokexl):
    """Dual tower: concat of the two penultimate hidden states + EOS-pooled
    projection from tower 2."""
    _, _, text, frozen = smokexl
    ids = jnp.arange(77, dtype=jnp.int32)[None]
    ctx, pooled = jax.jit(text.apply)({"params": frozen["text"]}, ids)
    assert ctx.shape == (1, 77, text.context_dim)
    assert pooled.shape == (1, text.pooled_dim)
    assert np.isfinite(np.asarray(ctx)).all()
    assert np.isfinite(np.asarray(pooled)).all()
    # penultimate semantics: context must NOT be final-layer-normed output —
    # tower params include a final_layer_norm that ctx bypasses
    assert "final_layer_norm" in frozen["text"]["te2"]
    assert "text_projection" in frozen["text"]["te2"]
    assert "text_projection" not in frozen["text"]["te1"]


def test_dual_tower_pad_convention(smokexl):
    """SDXL tokenizer_2 pads with id 0 while tokenizer_1 pads with EOS; the pad
    positions feed the cross-attention context (parity-relevant), while the
    EOS-argmax pooled vector is causal-protected and must not change."""
    from controllora_tpu.data.tokenizer import HashTokenizer

    _, _, text, frozen = smokexl
    tok = HashTokenizer()
    ids = jnp.asarray(tok(["a prompt"]))
    ids2 = jnp.asarray(tok(["a prompt"], pad_id=0))
    assert not np.array_equal(np.asarray(ids), np.asarray(ids2))
    ctx_a, pooled_a = text.apply({"params": frozen["text"]}, ids)
    ctx_b, pooled_b = text.apply({"params": frozen["text"]}, ids, ids2)
    h1 = text.config1.hidden_size
    # tower 1 consumed identical ids in both calls
    np.testing.assert_array_equal(np.asarray(ctx_a[..., :h1]),
                                  np.asarray(ctx_b[..., :h1]))
    # tower 2's padded positions differ with the pad id
    assert np.abs(np.asarray(ctx_a[..., h1:]) -
                  np.asarray(ctx_b[..., h1:])).max() > 1e-6
    # causal mask: nothing after EOS can reach the EOS-pooled projection
    np.testing.assert_allclose(np.asarray(pooled_a), np.asarray(pooled_b),
                               atol=1e-6)


def test_smokexl_unet_forward(smokexl):
    """text_time conditioning: forward needs (and uses) pooled text + time ids."""
    unet, _, text, frozen = smokexl
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 77, text.context_dim)) * 0.02
    pooled = jax.random.normal(jax.random.PRNGKey(3), (2, text.pooled_dim)) * 0.02
    tids = jnp.tile(jnp.array([[64., 64., 0., 0., 64., 64.]]), (2, 1))
    fn = jax.jit(lambda p, l, t, c, pe, ti: unet.apply(
        {"params": p}, l, t, c, added_text_embeds=pe, added_time_ids=ti))
    out = fn(frozen["unet"], lat, jnp.array([5, 5]), ctx, pooled, tids)
    assert out.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()
    # the micro-conditioning actually conditions
    out2 = fn(frozen["unet"], lat, jnp.array([5, 5]), ctx, pooled + 0.1, tids)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-6
    out3 = fn(frozen["unet"], lat, jnp.array([5, 5]), ctx, pooled,
              tids.at[:, 0].set(128.0))
    assert np.abs(np.asarray(out) - np.asarray(out3)).max() > 1e-6
    # missing added conds on a text_time config is a hard error
    with pytest.raises(ValueError, match="text_time"):
        unet.apply({"params": frozen["unet"]}, lat, jnp.array([5, 5]), ctx)


def test_smokexl_torch_round_trip(smokexl):
    """add_embedding MLP + depth>1 transformer blocks + dual towers export to
    the diffusers SDXL state-dict layout and re-import bit-exactly."""
    from controllora_tpu.utils.torch_compat import (
        flax_to_torch_clip,
        flax_to_torch_unet,
        translate_clip_text,
        translate_unet,
    )

    unet, _, _, frozen = smokexl
    sd = flax_to_torch_unet(frozen["unet"])
    assert "add_embedding.linear_1.weight" in sd
    assert "mid_block.attentions.0.transformer_blocks.1.attn1.to_q.weight" in sd
    back = translate_unet(sd)
    for a, b in zip(jax.tree.leaves(frozen["unet"]), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # tower 2 round-trips its projection head
    sd2 = flax_to_torch_clip(frozen["text"]["te2"])
    assert "text_projection.weight" in sd2
    back2 = translate_clip_text(sd2)
    for a, b in zip(jax.tree.leaves(frozen["text"]["te2"]), jax.tree.leaves(back2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_smokexl_guided_pipeline(smokexl):
    """End-to-end SDXL-style serving: dual-encoder CFG, micro-conditioning,
    ControlLoRA guide on the 3-level UNet."""
    from controllora_tpu.config import ControlLoRAConfig
    from controllora_tpu.data.tokenizer import HashTokenizer
    from controllora_tpu.models.control_lora import ControlLoRA
    from controllora_tpu.pipelines import StableDiffusionControlLoRAPipeline

    unet, vae, text, frozen = smokexl
    # 4-stage hint pyramid (÷8, matches the latent grid) feeding 3 adapter
    # buckets — bucket 0 is adapter-free (no attention at SDXL level 0)
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
    pipe = StableDiffusionControlLoRAPipeline(
        unet, vae, text, HashTokenizer(), frozen, cl, cp)
    g = np.zeros((64, 64, 3), np.float32) - 1.0
    g[24:40, 24:40] = 1.0
    lat = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 4))
    img = pipe("x", guide=g, num_inference_steps=2, latents=lat,
               return_array=True)[0]
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()
    img2 = pipe("x", guide=-g, num_inference_steps=2, latents=lat,
                return_array=True)[0]
    assert np.abs(img - img2).max() > 1e-5


def test_smokexl_trainer_step(smokexl):
    """One ControlLoRA train step on the SDXL-shaped stack: dual text encode,
    derived time_ids, nonzero adapter grads, finite loss."""
    from controllora_tpu.config import ControlLoRAConfig
    from controllora_tpu.models.control_lora import ControlLoRA
    from controllora_tpu.training.trainer import ControlLoRATrainer

    unet, vae, text, frozen = smokexl
    # 4-stage hint pyramid (÷8, matches the latent grid) feeding 3 adapter
    # buckets — bucket 0 is adapter-free (no attention at SDXL level 0)
    ccfg = ControlLoRAConfig(
        block_out_channels=(8, 8, 16, 16),
        norm_num_groups=8,
        lora_block_in_channels=(16, 16, 16),
        lora_block_out_channels=unet.config.block_out_channels,
        lora_cross_attention_dims=derive_cross_attention_dims(unet.config),
    )
    trainer = ControlLoRATrainer(
        ControlLoRA(ccfg), unet, frozen, vae=vae, text_encoder=text,
        remat_unet=False,
    )
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=64)
    step = trainer.make_train_step()
    batch = {
        "pixel_values": jnp.zeros((2, 64, 64, 3), jnp.float32),
        "guide_values": jnp.ones((2, 64, 64, 3), jnp.float32) * 0.5,
        "input_ids": jnp.tile(jnp.arange(77, dtype=jnp.int32)[None], (2, 1)),
    }
    # the jitted step donates its input state — snapshot params to host first
    before = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
    diff = jax.tree.map(lambda a, b: float(np.abs(a - np.asarray(b)).max()),
                        before, state2.params)
    assert max(jax.tree.leaves(diff)) > 0.0
