"""Weight-interchange tests: flax <-> diffusers/torch state-dict naming.

Without network access the real SD1.5 weights aren't available, so these tests verify
(1) export/import round-trips are exact, (2) exported key names match known diffusers
conventions, and (3) imported trees are structurally identical to flax-init trees —
together that pins the mapping so real checkpoints drop in unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllora_tpu.config import ControlLoRAConfig, get_preset
from controllora_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from controllora_tpu.models.control_lora import ControlLoRA
from controllora_tpu.models.unet import UNet2DConditionModel, UNetConfig
from controllora_tpu.models.vae import AutoencoderKL, VAEConfig
from controllora_tpu.utils.torch_compat import (
    control_lora_from_torch,
    control_lora_to_torch,
    flax_to_torch_clip,
    flax_to_torch_unet,
    flax_to_torch_vae,
    load_state_dict,
    save_state_dict,
    translate_clip_text,
    translate_unet,
    translate_vae,
)


def tree_paths(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(tree_paths(v, prefix + (k,)))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(tree_paths(v, prefix + (str(i),)))
    else:
        out[prefix] = np.asarray(tree).shape
    return out


def assert_trees_match(a, b):
    pa, pb = tree_paths(a), tree_paths(b)
    assert set(pa) == set(pb), (
        f"missing: {sorted(set(pb) - set(pa))[:5]} extra: {sorted(set(pa) - set(pb))[:5]}"
    )
    for k in pa:
        assert pa[k] == pb[k], f"shape mismatch at {k}: {pa[k]} vs {pb[k]}"


TINY_UNET = UNetConfig(
    block_out_channels=(32, 64, 96, 96), layers_per_block=1, attention_head_dim=4
)


def test_unet_roundtrip_and_naming():
    m = UNet2DConditionModel(TINY_UNET)
    params = m.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.array([1]), jnp.zeros((1, 77, 768))
    )["params"]
    sd = flax_to_torch_unet(params)
    # spot-check diffusers key conventions
    for key in [
        "conv_in.weight",
        "time_embedding.linear_1.weight",
        "down_blocks.0.resnets.0.norm1.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_out.0.bias",
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight",
        "down_blocks.0.downsamplers.0.conv.weight",
        "mid_block.attentions.0.transformer_blocks.0.norm2.weight",
        "mid_block.resnets.1.time_emb_proj.weight",
        "up_blocks.0.upsamplers.0.conv.weight",
        "up_blocks.1.resnets.0.conv_shortcut.weight",
        "conv_norm_out.weight",
        "conv_out.bias",
    ]:
        assert key in sd, key
    # torch conv layout
    assert sd["conv_in.weight"].shape == (32, 4, 3, 3)
    assert sd["down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight"].shape == (
        32,
        768,
    )
    back = translate_unet(sd)
    assert_trees_match(back, params)
    flat_a = tree_paths(back)
    for path in list(flat_a)[:10]:
        pass  # structural identity checked above; verify a value survives round-trip
    np.testing.assert_allclose(
        np.asarray(back["conv_in"]["kernel"]), np.asarray(params["conv_in"]["kernel"])
    )


def test_vae_roundtrip_and_naming():
    cfg = VAEConfig(block_out_channels=(16, 16, 32, 32), layers_per_block=1, norm_num_groups=8)
    vae = AutoencoderKL(cfg)
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    sd = flax_to_torch_vae(params)
    for key in [
        "encoder.conv_in.weight",
        "encoder.down_blocks.0.resnets.0.conv1.weight",
        "encoder.down_blocks.0.downsamplers.0.conv.weight",
        "encoder.mid_block.attentions.0.query.weight",
        "encoder.mid_block.attentions.0.group_norm.weight",
        "decoder.up_blocks.0.resnets.0.norm1.weight",
        "decoder.up_blocks.0.upsamplers.0.conv.weight",
        "quant_conv.weight",
        "post_quant_conv.bias",
    ]:
        assert key in sd, key
    back = translate_vae(sd)
    assert_trees_match(back, params)


def test_clip_roundtrip_and_naming():
    cfg = CLIPTextConfig(vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
                         intermediate_size=64)
    m = CLIPTextModel(cfg)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))["params"]
    sd = flax_to_torch_clip(params)
    for key in [
        "text_model.embeddings.token_embedding.weight",
        "text_model.encoder.layers.0.self_attn.q_proj.weight",
        "text_model.encoder.layers.1.mlp.fc1.bias",
        "text_model.encoder.layers.0.layer_norm1.weight",
        "text_model.final_layer_norm.weight",
    ]:
        assert key in sd, key
    assert sd["text_model.encoder.layers.0.self_attn.q_proj.weight"].shape == (32, 32)
    back = translate_clip_text(sd)
    assert_trees_match(back, params)
    # forward equivalence after round-trip
    ids = jnp.array([[1, 2, 3] + [0] * 74])
    o1 = m.apply({"params": params}, ids)
    o2 = m.apply({"params": back}, ids)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


@pytest.mark.parametrize("preset", ["base", "diffusiondb-canny-v2", "danbooru-sketch"])
def test_control_lora_roundtrip(preset, tmp_path):
    cfg = get_preset(preset)
    cl = ControlLoRA(cfg)
    params = cl.init(jax.random.PRNGKey(0), image_size=64)
    sd = control_lora_to_torch(params, cfg)
    # reference state-dict naming (reference models.py module attributes)
    assert "conv_in.weight" in sd
    assert "lora_layers.0.0.to_q_lora.down.weight" in sd
    if not cfg.lora_pre_conv_skipped:
        assert "pre_lora_layers.0.convnets.0.conv1.weight" in sd
        assert "down_blocks.0.0.convnets.0.norm1.weight" in sd
        assert "down_blocks.1.convnets.0.conv1.weight" in sd
        assert "down_blocks.0.0.downsamplers.0.conv.weight" in sd
    if cfg.control_version == 2:
        assert "lora_layers.0.0.to_control_out.down.weight" in sd
        assert "lora_layers.0.0.to_k_lora.down.weight" not in sd
    # LoRA factor layout: torch down is (rank, in)
    assert sd["lora_layers.0.0.to_q_lora.down.weight"].shape == (cfg.lora_rank, 320)

    # safetensors round-trip through disk
    path = str(tmp_path / "ctl.safetensors")
    save_state_dict(sd, path)
    back = control_lora_from_torch(load_state_dict(path), cfg)
    assert_trees_match(back, params)
    # guided forward parity after round-trip
    guide = jnp.linspace(-1, 1, 64 * 64 * 3).reshape(1, 64, 64, 3)
    c1 = cl.apply(params, guide)
    c2 = cl.apply(back, guide)
    for a, b in zip(c1, c2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
