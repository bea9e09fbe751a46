"""Image-to-image (SDEdit) and inpainting on the shared guided pipeline.

Beyond-reference capability (the reference serves text-to-image only —
apps/gradio_canny2image.py): `pipe(image=...)` VAE-encodes an init image,
noises it to the strength-selected grid point, and runs only the remaining
suffix of the denoising scan; `mask=` additionally re-injects the noised
known region after every step (diffusers legacy-inpaint semantics) and
composites the clean region at the end.

All tests run the smoke stack at 64px so the suite stays fast.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllora_tpu.data.tokenizer import HashTokenizer
from controllora_tpu.models import zoo
from controllora_tpu.pipelines import StableDiffusionControlLoRAPipeline
from controllora_tpu.schedulers import (
    DDIMScheduler,
    DPMSolverMultistepScheduler,
    EulerDiscreteScheduler,
    PNDMScheduler,
    UniPCMultistepScheduler,
)


@pytest.fixture(scope="module")
def stack():
    unet, vae, text = zoo.build_models("smoke", dtype=jnp.float32)
    frozen = zoo.random_frozen(jax.random.PRNGKey(0), unet, vae, text,
                               latent_size=8, param_dtype=jnp.float32)
    return unet, vae, text, frozen


def _pipe(stack, scheduler=None):
    unet, vae, text, frozen = stack
    return StableDiffusionControlLoRAPipeline(
        unet, vae, text, HashTokenizer(), frozen, scheduler=scheduler
    )


def _init_image(seed=7, size=64):
    rng = np.random.RandomState(seed)
    # smooth low-frequency image in [-1, 1]
    small = rng.uniform(-0.8, 0.8, (8, 8, 3)).astype(np.float32)
    img = np.asarray(
        jax.image.resize(jnp.asarray(small), (size, size, 3), "linear")
    )
    return np.clip(img, -1.0, 1.0)


def test_img2img_runs_and_differs_by_strength(stack):
    pipe = _pipe(stack)
    img = _init_image()
    lo = pipe("p", image=img, strength=0.3, num_inference_steps=8,
              rng=jax.random.PRNGKey(1), return_array=True)[0]
    hi = pipe("p", image=img, strength=0.9, num_inference_steps=8,
              rng=jax.random.PRNGKey(1), return_array=True)[0]
    assert lo.shape == (64, 64, 3) and np.isfinite(lo).all()
    # low strength stays closer to the input than high strength
    d_lo = np.abs(lo - img).mean()
    d_hi = np.abs(hi - img).mean()
    assert d_lo < d_hi


def test_img2img_zero_strength_is_vae_roundtrip(stack):
    """strength≈0 runs zero denoising steps -> encode/decode round trip."""
    pipe = _pipe(stack)
    img = _init_image()
    out = pipe("p", image=img, strength=0.0, num_inference_steps=8,
               rng=jax.random.PRNGKey(1), return_array=True)[0]
    # the smoke VAE is random, so the round trip is NOT close to the input —
    # but it must equal the pipeline-independent encode/decode of the same image
    unet, vae, text, frozen = stack
    lat = pipe._encode_image(jnp.asarray(img)[None])
    from controllora_tpu.models.vae import decode_per_image
    ref = decode_per_image(vae, frozen["vae"], lat)  # decode unscales internally
    np.testing.assert_allclose(out, np.asarray(ref)[0], atol=1e-4)


@pytest.mark.parametrize("make_sch", [
    lambda: DPMSolverMultistepScheduler(),
    lambda: DDIMScheduler(),
    lambda: PNDMScheduler(),
    lambda: EulerDiscreteScheduler(),
    lambda: UniPCMultistepScheduler(),
])
def test_img2img_all_schedulers(stack, make_sch):
    pipe = _pipe(stack, scheduler=make_sch())
    img = _init_image()
    out = pipe("p", image=img, strength=0.6, num_inference_steps=6,
               rng=jax.random.PRNGKey(2), return_array=True)[0]
    assert out.shape == (64, 64, 3) and np.isfinite(out).all()


def test_inpaint_full_mask_equals_img2img(stack):
    """mask of all ones (repaint everything) == plain img2img with the same rng,
    except the final composite (a no-op for an all-ones mask)."""
    pipe = _pipe(stack)
    img = _init_image()
    a = pipe("p", image=img, strength=0.7, num_inference_steps=6,
             rng=jax.random.PRNGKey(3), return_array=True)[0]
    b = pipe("p", image=img, mask=np.ones((64, 64), np.float32), strength=0.7,
             num_inference_steps=6, rng=jax.random.PRNGKey(3),
             return_array=True)[0]
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_inpaint_preserves_unmasked_region(stack):
    """mask of all zeros == the VAE round trip of the input (nothing repainted)."""
    pipe = _pipe(stack)
    img = _init_image()
    out = pipe("p", image=img, mask=np.zeros((64, 64), np.float32),
               strength=0.9, num_inference_steps=6,
               rng=jax.random.PRNGKey(4), return_array=True)[0]
    roundtrip = pipe("p", image=img, strength=0.0, num_inference_steps=6,
                     rng=jax.random.PRNGKey(4), return_array=True)[0]
    np.testing.assert_allclose(out, roundtrip, atol=1e-4)


def test_inpaint_half_mask_differs_by_region(stack):
    """left half masked (repaint) must move; the preserved right half can only
    drift through the DECODER's receptive field (the unmasked latents are exact
    — the final blend composites the clean init latents there), so its pixel
    drift must be far below the repainted half's."""
    pipe = _pipe(stack)
    img = _init_image()
    mask = np.zeros((64, 64), np.float32)
    mask[:, :32] = 1.0
    out = pipe("p", image=img, mask=mask, strength=0.9, num_inference_steps=6,
               rng=jax.random.PRNGKey(5), return_array=True)[0]
    roundtrip = pipe("p", image=img, strength=0.0, num_inference_steps=6,
                     rng=jax.random.PRNGKey(5), return_array=True)[0]
    assert np.abs(out - roundtrip).mean() > 1e-3  # something was repainted
    # the exactness statement lives in LATENT space (the pixel decoder's
    # mid-block attention is global at an 8x8 latent grid, so pixel regions
    # bleed): preserved latent columns must equal the init latents exactly —
    # the final blend composites the clean init there
    out_lat = pipe("p", image=img, mask=mask, strength=0.9,
                   num_inference_steps=6, rng=jax.random.PRNGKey(5),
                   return_latents=True)[0]
    init_lat = np.asarray(pipe._encode_image(jnp.asarray(img)[None]))[0]
    # col 4 straddles the mask edge (the anti-aliased resize makes it a soft
    # blend by design); cols 5+ are cleanly outside the repaint region
    np.testing.assert_allclose(out_lat[:, 5:], init_lat[:, 5:], atol=1e-5)
    assert np.abs(out_lat[:, :4] - init_lat[:, :4]).mean() > 1e-3  # repainted


def test_img2img_batched(stack):
    pipe = _pipe(stack)
    img = _init_image()
    outs = pipe("p", image=img, strength=0.5, num_inference_steps=4,
                num_images=2, rng=jax.random.PRNGKey(6), return_array=True)
    assert len(outs) == 2
    # different per-image noise -> different repaints
    assert np.abs(outs[0] - outs[1]).mean() > 1e-4


def test_img2img_mesh_equivalence(stack):
    """img2img + inpaint on the data(+cfg) serving mesh == single-device: the
    paint bundle (per-image noise, latent mask) shards/replicates correctly."""
    from controllora_tpu.parallel import make_serving_mesh

    unet, vae, text, frozen = stack
    img = _init_image()
    mask = np.zeros((64, 64), np.float32)
    mask[:, :32] = 1.0
    kwargs = dict(image=img, mask=mask, strength=0.7, num_inference_steps=4,
                  num_images=4, rng=jax.random.PRNGKey(8), return_array=True)
    ref = _pipe(stack)("p", **kwargs)
    mesh = make_serving_mesh(cfg=True)  # data 4 × cfg 2 on the 8 CPU devices
    got = _pipe(stack)("p", **kwargs)  # cache-warm single-dev reference twice
    pipe_m = StableDiffusionControlLoRAPipeline(
        unet, vae, text, HashTokenizer(), frozen, mesh=mesh
    )
    out = pipe_m("p", **kwargs)
    for r, g, o in zip(ref, got, out):
        np.testing.assert_allclose(r, g, atol=0)      # determinism
        np.testing.assert_allclose(r, o, atol=2e-4)   # mesh == single device


def test_hires_fix(stack):
    """Two-pass hires fix: base render -> 2x upscale -> img2img refinement;
    the target snaps to the UNet's 64-px granularity and the result is
    deterministic."""
    from controllora_tpu.pipelines import hires_fix

    pipe = _pipe(stack)
    out = hires_fix(pipe, "p", height=64, width=64, scale=2.0, strength=0.5,
                    num_inference_steps=4, rng=jax.random.PRNGKey(9),
                    return_array=True)
    assert out[0].shape == (128, 128, 3) and np.isfinite(out[0]).all()
    again = hires_fix(pipe, "p", height=64, width=64, scale=2.0, strength=0.5,
                      num_inference_steps=4, rng=jax.random.PRNGKey(9),
                      return_array=True)
    np.testing.assert_allclose(out[0], again[0], atol=0)
    # 1.5x of 64 px snaps to the granularity floor/ceiling, not an invalid grid
    odd = hires_fix(pipe, "p", height=64, width=64, scale=1.4, strength=0.5,
                    num_inference_steps=4, rng=jax.random.PRNGKey(9),
                    return_array=True)
    assert odd[0].shape == (64, 64, 3)


def test_img2img_rejects_latents_conflict(stack):
    pipe = _pipe(stack)
    img = _init_image()
    with pytest.raises(ValueError, match="latents"):
        pipe("p", image=img, latents=jnp.zeros((1, 8, 8, 4)))
    with pytest.raises(ValueError, match="image"):
        pipe("p", mask=np.ones((64, 64), np.float32))
