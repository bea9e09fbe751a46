"""Cross-framework parity tests against recorded PyTorch-reference fixtures.

Auto-discovers ``$PARITY_FIXTURES`` (VERDICT round-1 item 3): point it at a
``theirs.npz`` produced by ``scripts/dump_fixtures_torch.py`` in a reference
environment — or at a directory containing it, optionally alongside:

    theirs.npz        reference activations (required)
    sd15/             diffusers-layout SD1.5 weights (unet/ vae/ text_encoder/)
    control_lora/     ControlLoRA artifact directory

Every test isolates one module by feeding it the reference's *recorded* upstream
activations, so a failure localizes to that module. Tests that need weights skip
individually when ``sd15/`` is absent; the scheduler test runs from the npz alone.
Tolerance contract is pinned in docs/PARITY.md §fixture-contract.

One command turns a fixture dump into a pass/fail parity report:

    PARITY_FIXTURES=/path/to/fixtures python -m pytest tests/test_parity_fixtures.py -v
"""

import os

import numpy as np
import pytest

FIX = os.environ.get("PARITY_FIXTURES")

pytestmark = pytest.mark.skipif(
    not FIX, reason="PARITY_FIXTURES not set (opt-in cross-framework parity run)"
)


def _paths():
    if os.path.isdir(FIX):
        return (
            os.path.join(FIX, "theirs.npz"),
            os.path.join(FIX, "sd15"),
            os.path.join(FIX, "control_lora"),
        )
    return FIX, None, None


@pytest.fixture(scope="module")
def theirs():
    npz_path, _, _ = _paths()
    if not os.path.exists(npz_path):
        pytest.skip(f"{npz_path} not found")
    return np.load(npz_path)


@pytest.fixture(scope="module")
def frozen():
    _, weights, _ = _paths()
    if not weights or not os.path.isdir(weights):
        pytest.skip("no sd15/ weights dir next to theirs.npz")
    import jax.numpy as jnp

    from controllora_tpu.models import zoo

    unet, vae, text_encoder = zoo.build_models("sd15", dtype=jnp.float32)
    params = zoo.load_frozen(weights, param_dtype=jnp.float32)
    return unet, vae, text_encoder, params


# ------------------------------------------------------------------ pure math (no weights)


def test_ddpm_add_noise_parity(theirs):
    import jax.numpy as jnp

    from controllora_tpu.schedulers import DDPMScheduler

    sch = DDPMScheduler()
    ours = sch.add_noise(
        jnp.asarray(theirs["latents"]), jnp.asarray(theirs["noise"]),
        jnp.asarray(theirs["t"]),
    )
    np.testing.assert_allclose(np.asarray(ours), theirs["ddpm_noisy"], atol=1e-5)


# ------------------------------------------------------------------ per-module isolation


def test_clip_parity(theirs, frozen):
    import jax.numpy as jnp

    _, _, text_encoder, params = frozen
    ours = text_encoder.apply({"params": params["text"]}, jnp.asarray(theirs["ids"]))
    np.testing.assert_allclose(np.asarray(ours), theirs["clip_hidden"], atol=5e-4)


def test_vae_encode_parity(theirs, frozen):
    import jax.numpy as jnp

    _, vae, _, params = frozen
    mean, logvar = vae.apply(
        {"params": params["vae"]}, jnp.asarray(theirs["pixels"]),
        method=vae.encode_moments,
    )
    np.testing.assert_allclose(np.asarray(mean), theirs["vae_mean"], atol=2e-3)
    np.testing.assert_allclose(np.asarray(logvar), theirs["vae_logvar"], atol=2e-3)


def test_vae_decode_parity(theirs, frozen):
    import jax.numpy as jnp

    _, vae, _, params = frozen
    ours = vae.apply(
        {"params": params["vae"]}, jnp.asarray(theirs["latents"]) * 0.18215,
        method=vae.decode,
    )
    np.testing.assert_allclose(np.asarray(ours), theirs["vae_decode"], atol=5e-3)


def test_unet_parity(theirs, frozen):
    """UNet fed THEIR clip_hidden — isolates UNet numerics from CLIP numerics."""
    import jax.numpy as jnp

    unet, _, _, params = frozen
    ours = unet.apply(
        {"params": params["unet"]}, jnp.asarray(theirs["latents"]),
        jnp.asarray(theirs["t"]), jnp.asarray(theirs["clip_hidden"]),
    )
    np.testing.assert_allclose(np.asarray(ours), theirs["unet_eps"], atol=5e-3)


def test_controlled_unet_parity(theirs, frozen):
    if "unet_eps_controlled" not in theirs.files:
        pytest.skip("fixture has no ControlLoRA dump")
    _, _, cdir = _paths()
    if not cdir or not os.path.isdir(cdir):
        pytest.skip("no control_lora/ artifact dir next to theirs.npz")
    import jax.numpy as jnp

    from controllora_tpu.models.control_lora import ControlLoRA

    unet, _, _, params = frozen
    cl, cp = ControlLoRA.from_pretrained(cdir, jnp.float32)
    controls = cl.apply(cp, jnp.asarray(theirs["guide"]))
    for i, c in enumerate(controls):
        key = f"control_{i}"
        if key in theirs.files:
            np.testing.assert_allclose(np.asarray(c), theirs[key], atol=2e-3)
    adapters = cl.build_adapters(cp, controls, unet.config)
    ours = unet.apply(
        {"params": params["unet"]}, jnp.asarray(theirs["latents"]),
        jnp.asarray(theirs["t"]), jnp.asarray(theirs["clip_hidden"]), adapters,
    )
    np.testing.assert_allclose(np.asarray(ours), theirs["unet_eps_controlled"], atol=5e-3)
