"""MiDaS DPT-hybrid and UniFormer-seg annotator tests (shapes, structure, detectors)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllora_tpu.annotators.midas import (
    DPTHybridDepth,
    MidasDetector,
    depth_to_normal,
    midas_params_from_torch,
)
from controllora_tpu.annotators.uniformer import (
    UniFormerSeg,
    UniformerDetector,
    _adaptive_avg_pool,
    uniformer_params_from_torch,
)


@pytest.fixture(scope="module")
def midas_params():
    m = DPTHybridDepth()
    # jit the init: eager flax init dispatches thousands of host ops (~20 s);
    # one compiled program lands in the persistent cache
    return m, jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]


def test_midas_shapes(midas_params):
    m, params = midas_params
    out = jax.jit(m.apply)({"params": params}, jnp.zeros((2, 64, 96, 3)))
    assert out.shape == (2, 64, 96)
    assert np.asarray(out).min() >= 0  # non-negative depth head


def test_midas_structure(midas_params):
    _, params = midas_params
    # resnet stem taps + vit + reassemble + refinenet + head all present
    assert "stem_conv" in params["backbone"]
    assert "stage2_block8" in params["backbone"]
    assert params["backbone"]["stage0_block0"]["downsample_conv"]["kernel"].shape[-1] == 256
    assert params["block11"]["qkv"]["kernel"].shape == (768, 2304)
    assert params["readout3_project"]["kernel"].shape == (1536, 768)
    assert params["postprocess4_down"]["kernel"].shape == (3, 3, 768, 768)
    assert params["layer1_rn"]["kernel"].shape == (3, 3, 256, 256)
    assert params["refinenet1"]["resConfUnit2"]["conv1"]["kernel"].shape[-1] == 256
    assert params["head_conv3"]["kernel"].shape == (1, 1, 32, 1)


def test_midas_import_subset(midas_params):
    """Importer maps representative torch keys onto existing flax paths."""
    _, params = midas_params
    sd = {
        "pretrained.model.patch_embed.backbone.stem.conv.weight":
            np.ones((64, 3, 7, 7), np.float32),
        "pretrained.model.patch_embed.backbone.stages.1.blocks.0.downsample.conv.weight":
            np.zeros((512, 256, 1, 1), np.float32),
        "pretrained.model.patch_embed.backbone.stages.1.blocks.0.downsample.norm.weight":
            np.zeros((512,), np.float32),
        "pretrained.model.blocks.8.attn.qkv.weight": np.zeros((2304, 768), np.float32),
        "pretrained.model.blocks.8.mlp.fc1.bias": np.zeros((3072,), np.float32),
        "pretrained.act_postprocess3.0.project.0.weight":
            np.zeros((768, 1536), np.float32),
        "scratch.layer2_rn.weight": np.zeros((256, 512, 3, 3), np.float32),
        "scratch.refinenet2.resConfUnit1.conv1.weight":
            np.zeros((256, 256, 3, 3), np.float32),
        "scratch.output_conv.0.weight": np.zeros((128, 256, 3, 3), np.float32),
        "pretrained.model.cls_token": np.zeros((1, 1, 768), np.float32),
    }
    # act_postprocess readout key has extra '.project.0' — normalize as importer expects
    sd["pretrained.act_postprocess3.0.project.0.weight"] = sd.pop(
        "pretrained.act_postprocess3.0.project.0.weight"
    )
    tree = midas_params_from_torch(
        {k: v for k, v in sd.items() if "act_postprocess" not in k}
    )
    assert tree["backbone"]["stem_conv"]["kernel"].shape == (7, 7, 3, 64)
    # weight standardization applied: ones kernel -> zeros
    np.testing.assert_allclose(tree["backbone"]["stem_conv"]["kernel"], 0.0, atol=1e-3)
    assert tree["backbone"]["stage1_block0"]["downsample_conv"]["kernel"].shape == (
        1, 1, 256, 512)
    assert tree["block8"]["qkv"]["kernel"].shape == (768, 2304)
    assert tree["layer2_rn"]["kernel"].shape == (3, 3, 512, 256)
    assert tree["head_conv1"]["kernel"].shape == (3, 3, 256, 128)


def test_midas_detector_end_to_end():
    det = MidasDetector()
    img = np.random.default_rng(0).integers(0, 255, (80, 96, 3)).astype(np.uint8)
    depth, normal = det(img)
    assert depth.shape == (80, 96) and depth.dtype == np.uint8
    assert normal.shape == (80, 96, 3) and normal.dtype == np.uint8


def test_depth_to_normal():
    yy = jnp.linspace(0, 1, 32)[:, None] * jnp.ones((1, 32))
    norm01, n = depth_to_normal(yy, 2 * np.pi, 0.0)
    assert n.shape == (32, 32, 3)
    lens = np.linalg.norm(np.asarray(n), axis=-1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-5)


# ------------------------------------------------------------------ uniformer


@pytest.fixture(scope="module")
def uni_params():
    m = UniFormerSeg()
    # jit the init: eager flax init dispatches thousands of host ops (~20 s);
    # one compiled program lands in the persistent cache
    return m, jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]


def test_uniformer_shapes(uni_params):
    m, params = uni_params
    out = jax.jit(m.apply)({"params": params}, jnp.zeros((1, 64, 96, 3)))
    assert out.shape == (1, 64, 96, 150)


def test_uniformer_structure(uni_params):
    _, params = uni_params
    bb = params["backbone"]
    assert bb["patch_embed1_proj"]["kernel"].shape == (4, 4, 3, 64)
    assert "attn" in bb["blocks1_0"]  # conv stage uses dw-conv 'attn'
    assert bb["blocks1_0"]["attn"]["kernel"].shape == (5, 5, 1, 64)
    assert "qkv" in bb["blocks3_0"]  # SA stage
    assert bb["blocks3_0"]["qkv"]["kernel"].shape == (320, 960)
    dh = params["decode_head"]
    assert dh["conv_seg"]["kernel"].shape == (1, 1, 512, 150)
    assert dh["psp_0"]["conv"]["kernel"].shape == (1, 1, 512, 512)
    assert dh["fpn_bottleneck"]["conv"]["kernel"].shape == (3, 3, 2048, 512)


def test_uniformer_import_subset():
    sd = {
        "backbone.patch_embed1.proj.weight": np.zeros((64, 3, 4, 4), np.float32),
        "backbone.patch_embed1.norm.weight": np.zeros((64,), np.float32),
        "backbone.blocks1.0.pos_embed.weight": np.zeros((64, 1, 3, 3), np.float32),
        "backbone.blocks1.0.norm1.running_mean": np.zeros((64,), np.float32),
        "backbone.blocks1.0.mlp.fc1.weight": np.zeros((256, 64, 1, 1), np.float32),
        "backbone.blocks3.0.attn.qkv.weight": np.zeros((960, 320), np.float32),
        "backbone.blocks3.0.mlp.fc1.weight": np.zeros((1280, 320), np.float32),
        "backbone.norm4.weight": np.zeros((512,), np.float32),
        "decode_head.psp_modules.0.1.conv.weight": np.zeros((512, 512, 1, 1), np.float32),
        "decode_head.psp_modules.0.1.bn.running_var": np.ones((512,), np.float32),
        "decode_head.lateral_convs.1.conv.weight": np.zeros((512, 128, 1, 1), np.float32),
        "decode_head.conv_seg.weight": np.zeros((150, 512, 1, 1), np.float32),
        "decode_head.conv_seg.bias": np.zeros((150,), np.float32),
        "auxiliary_head.conv_seg.weight": np.zeros((150, 256, 1, 1), np.float32),
    }
    tree = uniformer_params_from_torch(sd)
    assert tree["backbone"]["patch_embed1_proj"]["kernel"].shape == (4, 4, 3, 64)
    assert tree["backbone"]["blocks1_0"]["norm1"]["mean"].shape == (64,)
    assert tree["backbone"]["blocks1_0"]["mlp_fc1"]["kernel"].shape == (1, 1, 64, 256)
    assert tree["backbone"]["blocks3_0"]["qkv"]["kernel"].shape == (320, 960)
    assert tree["backbone"]["blocks3_0"]["mlp_fc1"]["kernel"].shape == (320, 1280)
    assert tree["decode_head"]["psp_0"]["bn"]["var"].shape == (512,)
    assert "auxiliary_head" not in tree


def test_adaptive_avg_pool_matches_torch():
    import torch

    x = np.random.default_rng(0).normal(size=(1, 5, 7, 3)).astype(np.float32)
    for s in (1, 2, 3, 6):
        ours = np.asarray(_adaptive_avg_pool(jnp.asarray(x), s))
        ref = torch.nn.functional.adaptive_avg_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), (s, s)
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, atol=1e-5), s


def test_uniformer_detector_end_to_end():
    det = UniformerDetector()
    img = np.random.default_rng(0).integers(0, 255, (80, 96, 3)).astype(np.uint8)
    out = det(img)
    assert out.shape == (80, 96, 3)
    assert out.dtype == np.uint8
