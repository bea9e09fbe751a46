"""SD2.x-family architecture support (beyond-reference model family).

The reference targets SD1.5 only; SD2.x differs in: per-down-block head counts
with dim_head 64 at every level (attention_head_dim=(5,10,20,20)), Linear
transformer proj_in/proj_out (use_linear_projection), a 1024-dim OpenCLIP ViT-H
text tower with plain-gelu MLPs, and v-prediction training/serving. These tests
exercise each at smoke widths (zoo 'smoke2') plus the real SD2.1 config shapes."""

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


def test_sd21_config_shapes():
    """Real SD2.1 per-level geometry: dim_head 64 everywhere, 1024-d context,
    same 32-processor layout as SD1.5 (the control install order is unchanged)."""
    cfg = zoo.SD21_UNET
    for ch, heads in zip(cfg.block_out_channels, cfg.attention_head_dim):
        assert ch // heads == 64
    assert cfg.cross_attention_dim == 1024
    assert len(attention_processor_names(cfg)) == 32
    dims = derive_cross_attention_dims(cfg)
    assert all(d in (None, 1024) for bucket in dims for d in bucket)
    assert zoo.SD21_CLIP.hidden_size == 1024
    assert zoo.SD21_CLIP.hidden_act == "gelu"


@pytest.fixture(scope="module")
def smoke2():
    unet, vae, text = zoo.build_models("smoke2", dtype=jnp.float32)
    frozen = zoo.random_frozen(jax.random.PRNGKey(0), unet, vae, text,
                               latent_size=8, param_dtype=jnp.float32)
    return unet, vae, text, frozen


def test_smoke2_unet_forward(smoke2):
    """Tuple-head + linear-projection UNet: forward shapes and param layout
    (2-D proj kernels, per-level head splits)."""
    unet, _, text, frozen = smoke2
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 77, 96)) * 0.02
    out = jax.jit(unet.apply)({"params": frozen["unet"]}, lat,
                              jnp.array([5, 5]), ctx)
    assert out.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()
    p = frozen["unet"]["down_blocks_0_attentions_0"]
    assert p["proj_in"]["kernel"].ndim == 2  # Linear, not 1x1 conv
    # attn inner dims follow per-block heads * dim_head (= channel width)
    assert p["transformer_blocks_0"]["attn1"]["to_q"]["kernel"].shape == (32, 32)


def test_smoke2_text_encoder_gelu(smoke2):
    _, _, text, frozen = smoke2
    ids = jnp.arange(77, dtype=jnp.int32)[None]
    h = jax.jit(text.apply)({"params": frozen["text"]}, ids)
    assert h.shape == (1, 77, 96)
    assert np.isfinite(np.asarray(h)).all()


def test_smoke2_linear_proj_torch_round_trip(smoke2):
    """2-D proj_in/proj_out kernels export as torch Linear weights and
    re-import bit-exactly (SD2.x diffusers layout)."""
    from controllora_tpu.utils.torch_compat import (
        flax_to_torch_unet,
        translate_unet,
    )

    unet, _, _, frozen = smoke2
    sd = flax_to_torch_unet(frozen["unet"])
    w = sd["down_blocks.0.attentions.0.proj_in.weight"]
    assert w.ndim == 2  # Linear weight (out, in)
    back = translate_unet(sd)
    for a, b in zip(jax.tree.leaves(frozen["unet"]), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_smoke2_guided_pipeline_v_prediction(smoke2):
    """End-to-end SD2-style serving: ControlLoRA guide + v-prediction DPM++
    (the SD2.1 serving configuration) through the standard pipeline."""
    from controllora_tpu.config import ControlLoRAConfig
    from controllora_tpu.data.tokenizer import HashTokenizer
    from controllora_tpu.models.control_lora import ControlLoRA
    from controllora_tpu.pipelines import StableDiffusionControlLoRAPipeline
    from controllora_tpu.schedulers import DPMSolverMultistepScheduler
    from controllora_tpu.schedulers.common import DiffusionSchedule

    unet, vae, text, frozen = smoke2
    ccfg = ControlLoRAConfig(
        block_out_channels=(8, 16, 16, 32),
        lora_block_in_channels=(32, 32, 32, 32),
        lora_block_out_channels=unet.config.block_out_channels,
        lora_cross_attention_dims=derive_cross_attention_dims(unet.config),
    )
    cl = ControlLoRA(ccfg)
    cp = jax.tree.map(lambda x: x + 0.01,
                      cl.init(jax.random.PRNGKey(3), image_size=64))
    sch = DPMSolverMultistepScheduler(
        DiffusionSchedule.create(prediction_type="v_prediction"))
    pipe = StableDiffusionControlLoRAPipeline(
        unet, vae, text, HashTokenizer(), frozen, cl, cp, scheduler=sch)
    g = np.zeros((64, 64, 3), np.float32) - 1.0
    g[24:40, 24:40] = 1.0
    lat = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 4))
    img = pipe("x", guide=g, num_inference_steps=2, latents=lat,
               return_array=True)[0]
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()
    # the guide steers the render
    img2 = pipe("x", guide=-g, num_inference_steps=2, latents=lat,
                return_array=True)[0]
    assert np.abs(img - img2).max() > 1e-5


def test_smoke2_tp_serving(smoke2):
    """Tensor-parallel serving with per-block head counts: tp=2 divides every
    level's heads (2,4,6,6); equivalence vs single device."""
    from controllora_tpu.data.tokenizer import HashTokenizer
    from controllora_tpu.parallel import make_serving_mesh
    from controllora_tpu.pipelines import StableDiffusionControlLoRAPipeline

    unet, vae, text, frozen = smoke2
    lats = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 4), jnp.float32)
    single = StableDiffusionControlLoRAPipeline(
        unet, vae, text, HashTokenizer(), frozen)
    mesh = make_serving_mesh(cfg=True, model=2)
    tp = StableDiffusionControlLoRAPipeline(
        unet, vae, text, HashTokenizer(), frozen, mesh=mesh)
    a = tp("p", num_inference_steps=2, latents=lats, height=64, width=64,
           return_array=True)
    b = single("p", num_inference_steps=2, latents=lats, height=64, width=64,
               return_array=True)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=1e-3)

    # tp=4 cannot split level-0's 2 heads
    from controllora_tpu.parallel.tp import validate_tp

    with pytest.raises(ValueError, match="whole heads"):
        validate_tp(unet.config, 4)


def test_smoke2_train_step():
    """One ControlLoRA train step on the SD2-shaped stack via the CLI
    (v-prediction target, derived control dims)."""
    import os
    import sys
    import tempfile

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    import train as train_cli

    with tempfile.TemporaryDirectory() as out:
        train_cli.main([
            "--model_variant", "smoke2", "--dataset_name", "process/fill50k",
            "--resolution", "64", "--train_batch_size", "1",
            "--max_train_steps", "1", "--prediction_type", "v_prediction",
            "--output_dir", out, "--checkpointing_steps", "0",
            "--log_every", "1", "--seed", "6",
        ])
        assert os.path.exists(
            os.path.join(out, "diffusion_pytorch_model.safetensors"))
