"""SDXL-refiner family + base→refiner ensemble-of-experts serving.

Beyond-reference: the refiner UNet (attention-free bookend levels, single
ViT-bigG tower, 5-id aesthetic-score text_time conditioning) plus the
diffusers-style denoising_end / denoising_start split — the base pipeline
stops mid-schedule and hands raw trajectory latents to the refiner pipeline,
which continues WITHOUT re-noising. Splitting a single model's trajectory must
be bit-exact for the stateless samplers (DDIM, Euler).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllora_tpu.data.tokenizer import HashTokenizer
from controllora_tpu.models import zoo
from controllora_tpu.models.unet import attention_processor_names
from controllora_tpu.pipelines import StableDiffusionControlLoRAPipeline
from controllora_tpu.schedulers import DDIMScheduler, EulerDiscreteScheduler


def test_refiner_config_shapes():
    cfg = zoo.SDXL_REFINER_UNET
    assert cfg.block_out_channels == (384, 768, 1536, 1536)
    for ch, heads in zip(cfg.block_out_channels[1:3], cfg.attention_head_dim[1:3]):
        assert ch // heads == 64
    assert cfg.cross_attention_dim == 1280
    # pooled 1280 + 5 aesthetic-layout ids * 256
    assert cfg.projection_class_embeddings_input_dim == 1280 + 5 * 256
    names = attention_processor_names(cfg)
    # down: 2 levels * 2 layers * depth4 * 2; mid: 4*2; up: 2 levels * 3 * 4 * 2
    assert len(names) == 16 + 16 + 8 + 24 + 24
    assert not any(n.startswith(("down_blocks.0", "down_blocks.3")) for n in names)


@pytest.fixture(scope="module")
def smokeref():
    unet, vae, text = zoo.build_models("smokeref", dtype=jnp.float32)
    frozen = zoo.random_frozen(jax.random.PRNGKey(0), unet, vae, text,
                               latent_size=8, param_dtype=jnp.float32)
    return unet, vae, text, frozen


@pytest.fixture(scope="module")
def smoke_stack():
    unet, vae, text = zoo.build_models("smoke", dtype=jnp.float32)
    frozen = zoo.random_frozen(jax.random.PRNGKey(0), unet, vae, text,
                               latent_size=8, param_dtype=jnp.float32)
    return unet, vae, text, frozen


def _pipe(stack, scheduler=None):
    unet, vae, text, frozen = stack
    return StableDiffusionControlLoRAPipeline(
        unet, vae, text, HashTokenizer(), frozen, scheduler=scheduler
    )


def test_smokeref_forward_five_ids(smokeref):
    """5-id text_time conditioning: correct width passes, 6 ids fail loudly."""
    unet, _, text, frozen = smokeref
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (2, 77, text.config.hidden_size)) * 0.02
    pooled = jnp.zeros((2, text.config.projection_dim))
    tids5 = jnp.tile(jnp.array([[64., 64., 0., 0., 6.0]]), (2, 1))
    out = jax.jit(lambda p, l, t, c, pe, ti: unet.apply(
        {"params": p}, l, t, c, added_text_embeds=pe, added_time_ids=ti)
    )(frozen["unet"], lat, jnp.array([5, 5]), ctx, pooled, tids5)
    assert out.shape == (2, 8, 8, 4) and np.isfinite(np.asarray(out)).all()
    with pytest.raises(ValueError, match="text_time embedding input"):
        unet.apply({"params": frozen["unet"]}, lat, jnp.array([5, 5]), ctx,
                   added_text_embeds=pooled,
                   added_time_ids=jnp.zeros((2, 6)))


def test_refiner_img2img_and_aesthetic_score(smokeref):
    """Standalone refiner use: img2img over a decoded base render; the
    aesthetic-score conditioning must actually condition."""
    pipe = _pipe(smokeref)
    img = np.clip(np.random.RandomState(3).uniform(-0.5, 0.5, (64, 64, 3)),
                  -1, 1).astype(np.float32)
    a = pipe("p", image=img, strength=0.4, num_inference_steps=5,
             rng=jax.random.PRNGKey(4), return_array=True)[0]
    b = pipe("p", image=img, strength=0.4, num_inference_steps=5,
             rng=jax.random.PRNGKey(4), aesthetic_score=2.0,
             return_array=True)[0]
    assert a.shape == (64, 64, 3) and np.isfinite(a).all()
    assert np.abs(a - b).max() > 1e-6


@pytest.mark.parametrize("make_sch", [lambda: DDIMScheduler(),
                                      lambda: EulerDiscreteScheduler()])
def test_ensemble_split_is_exact_for_stateless_samplers(smoke_stack, make_sch):
    """denoising_end=0.5 + denoising_start=0.5 on the SAME model reproduces the
    unsplit trajectory bit-exactly (DDIM/Euler carry no multistep history)."""
    pipe = _pipe(smoke_stack, scheduler=make_sch())
    lat = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, 4))
    full = pipe("p", latents=lat, num_inference_steps=6, return_array=True)[0]
    mid = pipe("p", latents=lat, num_inference_steps=6, denoising_end=0.5,
               return_latents=True)[0]
    cont = pipe("p", latents=jnp.asarray(mid)[None], num_inference_steps=6,
                denoising_start=0.5, return_array=True)[0]
    np.testing.assert_allclose(full, cont, atol=1e-5)


def test_base_to_refiner_ensemble(smokeref):
    """Full SDXL-style ensemble: smokexl base runs [0, 0.6), hands latents to
    the smokeref refiner for [0.6, 1) — shapes line up (same latent space) and
    the result is finite and refiner-dependent."""
    unet, vae, text = zoo.build_models("smokexl", dtype=jnp.float32)
    base_frozen = zoo.random_frozen(jax.random.PRNGKey(0), unet, vae, text,
                                    latent_size=8, param_dtype=jnp.float32)
    base = StableDiffusionControlLoRAPipeline(
        unet, vae, text, HashTokenizer(), base_frozen)
    lat = base("p", num_inference_steps=5, denoising_end=0.6, height=64,
               width=64, rng=jax.random.PRNGKey(6), return_latents=True)[0]
    assert lat.shape == (8, 8, 4)
    refiner = _pipe(smokeref)
    out = refiner("p", latents=jnp.asarray(lat)[None], num_inference_steps=5,
                  denoising_start=0.6, return_array=True)[0]
    assert out.shape == (64, 64, 3) and np.isfinite(out).all()


def test_denoising_validation(smoke_stack):
    pipe = _pipe(smoke_stack)
    with pytest.raises(ValueError, match="latents"):
        pipe("p", denoising_start=0.5)
    with pytest.raises(ValueError, match="mutually exclusive"):
        pipe("p", denoising_start=0.5,
             image=np.zeros((64, 64, 3), np.float32))
    with pytest.raises(ValueError, match="empty or"):
        pipe("p", num_inference_steps=4, denoising_end=0.05)
