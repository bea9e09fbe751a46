"""Pipeline tests on the tiny stack: guided CFG sampling, determinism, LoRA mixing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllora_tpu.config import ControlLoRAConfig
from controllora_tpu.data.tokenizer import HashTokenizer
from controllora_tpu.models.control_lora import ControlLoRA
from controllora_tpu.models.lora import make_plain_lora_adapters
from controllora_tpu.models import zoo
from controllora_tpu.models.unet import derive_cross_attention_dims
from controllora_tpu.pipelines import StableDiffusionControlLoRAPipeline
from controllora_tpu.pipelines.text_to_image import merge_extra_loras

TINY_CONTROL = ControlLoRAConfig(
    block_out_channels=(8, 16, 16, 32),
    lora_block_in_channels=(32, 32, 32, 32),
    lora_block_out_channels=(32, 64, 96, 96),
    lora_cross_attention_dims=derive_cross_attention_dims(zoo.SMOKE_UNET),
)


@pytest.fixture(scope="module")
def pipe():
    unet, vae, text = zoo.build_models("smoke", dtype=jnp.float32)
    # smaller smoke text model hidden must match cross dim 768 — zoo.SMOKE_CLIP does
    frozen = zoo.random_frozen(jax.random.PRNGKey(0), unet, vae, text, latent_size=8,
                               param_dtype=jnp.float32)
    cl = ControlLoRA(TINY_CONTROL)
    cp = cl.init(jax.random.PRNGKey(1), image_size=64)
    # activate adapters so control has visible effect
    cp = jax.tree.map(lambda x: x + 0.01, cp)
    return StableDiffusionControlLoRAPipeline(
        unet, vae, text, HashTokenizer(), frozen, cl, cp
    )


def make_guide():
    g = np.zeros((64, 64, 3), np.float32) - 1.0
    g[20:40, 20:40] = 1.0
    return g


def test_guided_sampling_shapes_and_determinism(pipe):
    imgs = pipe("red circle", guide=make_guide(), num_inference_steps=4,
                rng=jax.random.PRNGKey(5))
    assert len(imgs) == 1
    assert imgs[0].shape == (64, 64, 3)
    assert imgs[0].dtype == np.uint8
    imgs2 = pipe("red circle", guide=make_guide(), num_inference_steps=4,
                 rng=jax.random.PRNGKey(5))
    np.testing.assert_array_equal(imgs[0], imgs2[0])
    imgs3 = pipe("red circle", guide=make_guide(), num_inference_steps=4,
                 rng=jax.random.PRNGKey(6))
    assert np.abs(imgs3[0].astype(int) - imgs[0].astype(int)).max() > 0


def test_guide_changes_output(pipe):
    lat = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 4))
    a = pipe("x", guide=make_guide(), num_inference_steps=2, latents=lat,
             return_array=True)[0]
    b = pipe("x", guide=-make_guide(), num_inference_steps=2, latents=lat,
             return_array=True)[0]
    assert np.abs(a - b).max() > 1e-5


def test_cfg_scale_changes_output(pipe):
    lat = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 4))
    a = pipe("x", guide=make_guide(), num_inference_steps=2, guidance_scale=1.0,
             latents=lat, return_array=True)[0]
    b = pipe("x", guide=make_guide(), num_inference_steps=2, guidance_scale=9.0,
             latents=lat, return_array=True)[0]
    assert np.abs(a - b).max() > 1e-5


def test_unguided_text_to_image(pipe):
    imgs = pipe("plain prompt", guide=None, num_inference_steps=2, height=64, width=64)
    assert imgs[0].shape == (64, 64, 3)


def test_mix_lora_composition(pipe):
    """mix_lora_and_control_lora path: plain LoRAs as pre-adapters of control stacks."""
    lat = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 4))
    base = pipe("x", guide=make_guide(), num_inference_steps=2, latents=lat,
                return_array=True)[0]

    loras = make_plain_lora_adapters(jax.random.PRNGKey(9), rank=4,
                                     unet_config=pipe.unet.config)
    # fresh plain LoRAs are no-ops (base runs the folded fast path, mix the chained
    # path — identical math, fp-rounding-level drift allowed)
    same = pipe("x", guide=make_guide(), num_inference_steps=2, latents=lat,
                extra_loras=loras, return_array=True)[0]
    np.testing.assert_allclose(base, same, atol=2e-3)

    # activated LoRAs change the output
    loras_active = {
        k: v.replace(params=jax.tree.map(lambda x: x + 0.02, v.params))
        for k, v in loras.items()
    }
    diff = pipe("x", guide=make_guide(), num_inference_steps=2, latents=lat,
                extra_loras=loras_active, return_array=True)[0]
    assert np.abs(diff - base).max() > 1e-5


def test_multi_control_composition(pipe):
    """Two ControlLoRAs driving one render (multi-condition control, e.g.
    canny + pose). A FRESH second control is an exact no-op by construction
    (every lora `up` factor is zero, so its q/k/v/out and to_control residuals
    vanish) — composed output must match the single-control render; activating
    its up factors must change the output."""
    lat = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 4))
    base = pipe("x", guide=make_guide(), num_inference_steps=2, latents=lat,
                return_array=True)[0]

    cl2 = ControlLoRA(TINY_CONTROL)
    p2 = cl2.init(jax.random.PRNGKey(33), image_size=64)
    guide2 = -make_guide()  # a different condition image

    same = pipe("x", guide=make_guide(), num_inference_steps=2, latents=lat,
                extra_controls=[(cl2, p2, guide2)], return_array=True)[0]
    # base runs the folded fast path, composed the chained path — fp drift only
    np.testing.assert_allclose(base, same, atol=2e-3)

    # activate the second control's up factors: the extra condition now steers
    p2_active = jax.tree.map(lambda x: x + 0.02, p2)
    diff = pipe("x", guide=make_guide(), num_inference_steps=2, latents=lat,
                extra_controls=[(cl2, p2_active, guide2)], return_array=True)[0]
    assert np.abs(diff - base).max() > 1e-5

    # and the composed render depends on the SECOND guide too
    diff2 = pipe("x", guide=make_guide(), num_inference_steps=2, latents=lat,
                 extra_controls=[(cl2, p2_active, make_guide())],
                 return_array=True)[0]
    assert np.abs(diff2 - diff).max() > 1e-5


def test_alternative_schedulers(pipe):
    """DDIM and PNDM samplers plug into the same jitted pipeline."""
    from controllora_tpu.pipelines import StableDiffusionControlLoRAPipeline
    from controllora_tpu.schedulers import DDIMScheduler, PNDMScheduler

    from controllora_tpu.schedulers import (
        EulerDiscreteScheduler,
        UniPCMultistepScheduler,
    )

    lat = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 4))
    for sch in (DDIMScheduler(), PNDMScheduler(), EulerDiscreteScheduler(),
                UniPCMultistepScheduler()):
        p2 = StableDiffusionControlLoRAPipeline(
            pipe.unet, pipe.vae, pipe.text_encoder, pipe.tokenizer, pipe.frozen,
            pipe.control_lora, pipe.control_params, scheduler=sch,
        )
        img = p2("x", guide=make_guide(), num_inference_steps=3, latents=lat,
                 return_array=True)[0]
        assert img.shape == (64, 64, 3)
        assert np.isfinite(img).all()


def test_deterministic_samplers_converge_to_same_ode_solution(pipe):
    """DPM-Solver++, UniPC, and Euler all integrate the SAME probability-flow ODE;
    at 40 steps on the tiny model their renders must agree closely. This is the
    in-container substitute for diffusers fixture comparison: a semantics bug in
    any one sampler (wrong frame, wrong grid, wrong corrector sign) diverges its
    trajectory and fails the cross-check."""
    from controllora_tpu.schedulers import (
        DPMSolverMultistepScheduler,
        EulerDiscreteScheduler,
        UniPCMultistepScheduler,
    )

    lat = jax.random.normal(jax.random.PRNGKey(17), (1, 8, 8, 4))
    outs = {}
    for name, sch in (("dpm", DPMSolverMultistepScheduler()),
                      ("euler", EulerDiscreteScheduler()),
                      ("unipc", UniPCMultistepScheduler())):
        p2 = StableDiffusionControlLoRAPipeline(
            pipe.unet, pipe.vae, pipe.text_encoder, pipe.tokenizer, pipe.frozen,
            pipe.control_lora, pipe.control_params, scheduler=sch,
        )
        outs[name] = p2("x", guide=make_guide(), num_inference_steps=40,
                        guidance_scale=4.0, latents=lat, return_array=True)[0]
    # images live in [-1, 1]; 40-step discretization differences are small
    np.testing.assert_allclose(outs["unipc"], outs["dpm"], atol=0.08)
    np.testing.assert_allclose(outs["euler"], outs["dpm"], atol=0.15)


def test_merge_extra_loras_structure():
    loras = make_plain_lora_adapters(jax.random.PRNGKey(0), rank=2)
    merged = merge_extra_loras({}, loras, "pre")
    assert len(merged) == 32
    name = next(iter(loras))
    st = merged[name]
    assert st.main is loras[name]
    again = merge_extra_loras(merged, loras, "post")
    assert len(again[name].post) == 1


def test_num_images_batched_matches_singles(pipe):
    """num_images renders as ONE batched sampler call; each image must equal the
    single-image render with the same per-image latent (CFG layout [u*n ‖ c*n])."""
    k = jax.random.PRNGKey(11)
    lats = jax.random.normal(k, (3, 8, 8, 4), jnp.float32)
    batched = pipe("x", guide=make_guide(), num_inference_steps=2, latents=lats,
                   return_array=True)
    assert len(batched) == 3
    for i in range(3):
        single = pipe("x", guide=make_guide(), num_inference_steps=2,
                      latents=lats[i : i + 1], return_array=True)[0]
        # batched vs single GEMM shapes reorder fp32 accumulation; bound the drift
        np.testing.assert_allclose(batched[i], single, atol=1e-4)


def test_mesh_serving_matches_single_device(pipe):
    """Data-parallel serving: sharding the image batch over the 8-device mesh must
    yield the same images as the single-device batched render (per-device slices run
    the identical sampler; no collectives on the dp serving path)."""
    from controllora_tpu.parallel import make_mesh
    from controllora_tpu.pipelines import StableDiffusionControlLoRAPipeline

    mesh = make_mesh()
    assert mesh.devices.size == 8
    meshed = StableDiffusionControlLoRAPipeline(
        pipe.unet, pipe.vae, pipe.text_encoder, pipe.tokenizer, pipe.frozen,
        pipe.control_lora, pipe.control_params, mesh=mesh,
    )
    lats = jax.random.normal(jax.random.PRNGKey(21), (8, 8, 8, 4), jnp.float32)
    sharded = meshed("x", guide=make_guide(), num_inference_steps=2, latents=lats,
                     return_array=True)
    single = pipe("x", guide=make_guide(), num_inference_steps=2, latents=lats,
                  return_array=True)
    assert len(sharded) == 8
    for a, b in zip(sharded, single):
        np.testing.assert_allclose(a, b, atol=1e-4)

    with pytest.raises(ValueError, match="multiple of the mesh size"):
        meshed("x", guide=make_guide(), num_inference_steps=2, num_images=3)


def test_cfg_mesh_serving_matches_single_device(pipe):
    """CFG-axis serving: splitting the [uncond ‖ cond] pair over a size-2 'cfg'
    axis (each rank evaluates one guidance branch, combined by a per-step psum)
    must reproduce the single-device render — guidance is a linear combination,
    so the split is exact up to fp reassociation. Composed with 'data' here:
    4 images × 2 cfg ranks = the full 8-device mesh."""
    from controllora_tpu.parallel import make_serving_mesh
    from controllora_tpu.pipelines import StableDiffusionControlLoRAPipeline

    mesh = make_serving_mesh()
    assert dict(mesh.shape) == {"data": 4, "cfg": 2}
    meshed = StableDiffusionControlLoRAPipeline(
        pipe.unet, pipe.vae, pipe.text_encoder, pipe.tokenizer, pipe.frozen,
        pipe.control_lora, pipe.control_params, mesh=mesh,
    )
    lats = jax.random.normal(jax.random.PRNGKey(23), (4, 8, 8, 4), jnp.float32)
    sharded = meshed("x", guide=make_guide(), num_inference_steps=2,
                     guidance_scale=7.0, latents=lats, return_array=True)
    single = pipe("x", guide=make_guide(), num_inference_steps=2,
                  guidance_scale=7.0, latents=lats, return_array=True)
    assert len(sharded) == 4
    for a, b in zip(sharded, single):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_cfg_mesh_batch1_latency_config(pipe):
    """The latency configuration: ONE image over a ('data' 1 × 'cfg' 2) mesh —
    the case plain dp serving cannot shard at all."""
    import jax as _jax

    from controllora_tpu.parallel import make_serving_mesh
    from controllora_tpu.pipelines import StableDiffusionControlLoRAPipeline

    mesh = make_serving_mesh(devices=_jax.devices()[:2])
    assert dict(mesh.shape) == {"data": 1, "cfg": 2}
    meshed = StableDiffusionControlLoRAPipeline(
        pipe.unet, pipe.vae, pipe.text_encoder, pipe.tokenizer, pipe.frozen,
        pipe.control_lora, pipe.control_params, mesh=mesh,
    )
    lat = jax.random.normal(jax.random.PRNGKey(29), (1, 8, 8, 4), jnp.float32)
    a = meshed("x", guide=make_guide(), num_inference_steps=3, latents=lat,
               return_array=True)[0]
    b = pipe("x", guide=make_guide(), num_inference_steps=3, latents=lat,
             return_array=True)[0]
    np.testing.assert_allclose(a, b, atol=1e-4)

    # unguided path shards the same way
    ua = meshed("plain", num_inference_steps=2, height=64, width=64,
                rng=jax.random.PRNGKey(31), return_array=True)[0]
    ub = pipe("plain", num_inference_steps=2, height=64, width=64,
              rng=jax.random.PRNGKey(31), return_array=True)[0]
    np.testing.assert_allclose(ua, ub, atol=1e-4)


def test_cfg_mesh_axis_size_validation(pipe):
    from controllora_tpu.parallel import make_mesh
    from controllora_tpu.pipelines import StableDiffusionControlLoRAPipeline

    bad = make_mesh((2, 4), ("data", "cfg"))
    with pytest.raises(ValueError, match="size 2"):
        StableDiffusionControlLoRAPipeline(
            pipe.unet, pipe.vae, pipe.text_encoder, pipe.tokenizer, pipe.frozen,
            pipe.control_lora, pipe.control_params, mesh=bad,
        )


def test_num_images_fresh_latents(pipe):
    imgs = pipe("x", guide=make_guide(), num_inference_steps=2, num_images=2,
                rng=jax.random.PRNGKey(3))
    assert len(imgs) == 2
    # distinct latents -> distinct images
    assert np.abs(imgs[0].astype(int) - imgs[1].astype(int)).max() > 0
