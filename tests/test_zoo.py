"""zoo.load_frozen: round-trip a diffusers-layout checkpoint directory built from our
own exporters — validates the exact path real SD1.5 weights will take."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from controllora_tpu.models import zoo
from controllora_tpu.utils.torch_compat import (
    flax_to_torch_clip,
    flax_to_torch_unet,
    flax_to_torch_vae,
    save_state_dict,
)


def test_load_frozen_roundtrip(tmp_path):
    unet, vae, text = zoo.build_models("smoke", dtype=jnp.float32)
    frozen = zoo.random_frozen(jax.random.PRNGKey(0), unet, vae, text,
                               latent_size=8, param_dtype=jnp.float32)

    # write a diffusers-layout directory
    for sub, sd in (
        ("unet", flax_to_torch_unet(jax.device_get(frozen["unet"]))),
        ("vae", flax_to_torch_vae(jax.device_get(frozen["vae"]))),
        ("text_encoder", flax_to_torch_clip(jax.device_get(frozen["text"]))),
    ):
        os.makedirs(tmp_path / sub)
        save_state_dict(sd, str(tmp_path / sub / "diffusion_pytorch_model.safetensors"))

    loaded = zoo.load_frozen(str(tmp_path), param_dtype=jnp.float32)

    # forward parity on every component
    ids = jnp.array([[1, 2, 3] + [0] * 74])
    np.testing.assert_allclose(
        np.asarray(text.apply({"params": loaded["text"]}, ids)),
        np.asarray(text.apply({"params": frozen["text"]}, ids)), atol=1e-6,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4)) * 0.3
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 768)) * 0.02
    np.testing.assert_allclose(
        np.asarray(unet.apply({"params": loaded["unet"]}, x, jnp.array([5]), ctx)),
        np.asarray(unet.apply({"params": frozen["unet"]}, x, jnp.array([5]), ctx)),
        atol=1e-6,
    )
    img = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3), minval=-1)
    m1, _ = vae.apply({"params": loaded["vae"]}, img, method=vae.encode_moments)
    m2, _ = vae.apply({"params": frozen["vae"]}, img, method=vae.encode_moments)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-6)


def test_load_frozen_missing_raises(tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError):
        zoo.load_frozen(str(tmp_path / "nothing"))


def test_load_frozen_dual_tower_layout(tmp_path):
    """SDXL-base checkpoint layout (text_encoder + text_encoder_2) nests the
    towers the DualCLIPTextEncoder way; refiner layout (text_encoder_2 only)
    loads the single tower."""
    unet, vae, text = zoo.build_models("smokexl", dtype=jnp.float32)
    frozen = zoo.random_frozen(jax.random.PRNGKey(0), unet, vae, text,
                               latent_size=8, param_dtype=jnp.float32)
    for sub, sd in (
        ("unet", flax_to_torch_unet(jax.device_get(frozen["unet"]))),
        ("vae", flax_to_torch_vae(jax.device_get(frozen["vae"]))),
        ("text_encoder", flax_to_torch_clip(jax.device_get(frozen["text"]["te1"]))),
        ("text_encoder_2", flax_to_torch_clip(jax.device_get(frozen["text"]["te2"]))),
    ):
        os.makedirs(tmp_path / sub)
        save_state_dict(sd, str(tmp_path / sub / "diffusion_pytorch_model.safetensors"))
    loaded = zoo.load_frozen(str(tmp_path), param_dtype=jnp.float32)
    ids = jnp.array([[1, 2, 3] + [0] * 74])
    a_ctx, a_pool = text.apply({"params": loaded["text"]}, ids)
    b_ctx, b_pool = text.apply({"params": frozen["text"]}, ids)
    np.testing.assert_allclose(np.asarray(a_ctx), np.asarray(b_ctx), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a_pool), np.asarray(b_pool), atol=1e-6)

    # refiner layout: drop text_encoder/, keep text_encoder_2/
    import shutil

    shutil.rmtree(tmp_path / "text_encoder")
    _, _, tower2 = zoo.build_models("smokeref", dtype=jnp.float32)
    loaded2 = zoo.load_frozen(str(tmp_path), param_dtype=jnp.float32)
    c_ctx, c_pool = tower2.apply({"params": loaded2["text"]}, ids)
    d_ctx, d_pool = tower2.apply({"params": frozen["text"]["te2"]}, ids)
    np.testing.assert_allclose(np.asarray(c_ctx), np.asarray(d_ctx), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_pool), np.asarray(d_pool), atol=1e-6)
