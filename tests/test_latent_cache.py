"""Latent caching (data/latent_cache.py): cached-moments training must match the
encode-per-step path exactly in distribution — same mean, same std, same loss at a
fixed rng — because the trainer samples z = mean + std*eps from the cached posterior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllora_tpu.data.fill50k import Fill50kSynthetic
from controllora_tpu.data.latent_cache import LatentCachedDataset
from controllora_tpu.data.registry import DatasetBase, batch_iterator
from controllora_tpu.models.vae import AutoencoderKL, VAEConfig


@pytest.fixture(scope="module")
def small_vae():
    vae = AutoencoderKL(VAEConfig(block_out_channels=(32, 64), layers_per_block=1))
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    return vae, params


def test_cached_moments_match_direct_encode(small_vae):
    vae, params = small_vae
    ds = Fill50kSynthetic(resolution=32, size=6)
    cached = LatentCachedDataset(ds, vae, params, batch_size=4, verbose=False)
    assert len(cached) == 6

    item = cached[3]
    px = ds[3]["pixel_values"][None]
    m, lv = vae.apply({"params": params}, jnp.asarray(px), method=vae.encode_moments)
    # fp16 cache quantization is the only difference
    np.testing.assert_allclose(item["latent_mean"], np.asarray(m[0]), atol=2e-3)
    np.testing.assert_allclose(item["latent_logvar"], np.asarray(lv[0]), atol=2e-2)
    assert "pixel_values" not in item
    assert item["input_ids"].shape == ds[3]["input_ids"].shape


def test_cache_roundtrip_via_npz(small_vae, tmp_path):
    vae, params = small_vae
    ds = Fill50kSynthetic(resolution=32, size=4)
    p = str(tmp_path / "cache.npz")
    c1 = LatentCachedDataset(ds, vae, params, cache_path=p, verbose=False)
    c2 = LatentCachedDataset(ds, vae, params, cache_path=p, verbose=False)
    np.testing.assert_array_equal(c1.mean, c2.mean)


def test_trainer_consumes_cached_batch(small_vae):
    """The trainer's latent_mean branch must produce the same latents the encode
    path would, given the same rng (up to fp16 cache rounding)."""
    vae, params = small_vae
    ds = Fill50kSynthetic(resolution=32, size=4)
    cached = LatentCachedDataset(ds, vae, params, batch_size=4, verbose=False)
    batch = next(batch_iterator(cached, 2, shuffle=False))

    rng = jax.random.PRNGKey(7)
    mean = jnp.asarray(batch["latent_mean"], jnp.float32)
    std = jnp.exp(0.5 * jnp.asarray(batch["latent_logvar"], jnp.float32))
    z_cached = (mean + std * jax.random.normal(rng, mean.shape)) * vae.config.scaling_factor

    px = jnp.stack([jnp.asarray(ds[i]["pixel_values"]) for i in (0, 1)])
    m, lv = vae.apply({"params": params}, px, method=vae.encode_moments)
    z_direct = (m + jnp.exp(0.5 * lv) * jax.random.normal(rng, m.shape)) * vae.config.scaling_factor
    np.testing.assert_allclose(np.asarray(z_cached), np.asarray(z_direct), atol=1e-2)


def test_nondeterministic_dataset_rejected(small_vae):
    vae, params = small_vae

    class Jittery(DatasetBase):
        deterministic = False

        def __len__(self):
            return 1

    with pytest.raises(ValueError, match="deterministic"):
        LatentCachedDataset(Jittery(), vae, params)
