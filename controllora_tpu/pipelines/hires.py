"""Two-pass high-resolution rendering ("hires fix").

Beyond-reference convenience composing the pipeline's existing primitives: a
base-resolution text-to-image pass, a pixel-space upscale, and an img2img
refinement pass at the target resolution. This sidesteps the classic SD
failure mode of direct high-resolution sampling (duplicated subjects /
incoherent composition outside the training resolution) while the second pass
restores high-frequency detail — the webui "hires fix" recipe.

TPU notes: both passes are ordinary jitted sampler programs (each resolution
compiles once and caches); the upscale is a single on-device
`jax.image.resize`. Guides are re-rasterized per pass so ControlLoRA
conditioning follows both resolutions.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hires_fix(
    pipe,
    prompt: str,
    *,
    negative_prompt: str = "",
    guide: Optional[np.ndarray] = None,
    height: int = 512,
    width: int = 512,
    scale: float = 2.0,
    strength: float = 0.55,
    num_inference_steps: int = 20,
    guidance_scale: float = 9.0,
    rng: Optional[jax.Array] = None,
    lora_scale: float = 1.0,
    return_array: bool = False,
    **kw,
):
    """Render at (height, width), upscale by `scale`, then img2img-refine.

    `strength` is the second pass's repaint strength (0.4–0.7 keeps the base
    composition; higher re-imagines). The target resolution snaps to the
    model's granularity — 8 px VAE grid × 2^(levels-1) UNet downsampling
    (64 px for the 4-level SD UNets), since the skip connections need the
    latent grid divisible through every level. A `guide` given at any
    resolution is resized for each pass. Extra kwargs pass through to both
    pipeline calls. Returns the pass-2 image list."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    rng1, rng2 = jax.random.split(rng)
    grain = 8 * 2 ** (len(pipe.unet.config.block_out_channels) - 1)
    th = max(grain, int(round(height * scale / grain)) * grain)
    tw = max(grain, int(round(width * scale / grain)) * grain)

    def sized_guide(h, w):
        if guide is None:
            return None
        g = jnp.asarray(guide, jnp.float32)
        g = g[None] if g.ndim == 3 else g
        if g.shape[1:3] != (h, w):
            g = jax.image.resize(g, (g.shape[0], h, w, g.shape[3]), "linear")
        return np.asarray(g)

    base = pipe(
        prompt, negative_prompt=negative_prompt, guide=sized_guide(height, width),
        height=height, width=width, num_inference_steps=num_inference_steps,
        guidance_scale=guidance_scale, rng=rng1, lora_scale=lora_scale,
        return_array=True, **kw,
    )
    up = jax.image.resize(
        jnp.asarray(np.stack(base)), (len(base), th, tw, base[0].shape[-1]),
        "linear",
    )
    up = np.asarray(jnp.clip(up, -1.0, 1.0))
    return pipe(
        prompt, negative_prompt=negative_prompt, guide=sized_guide(th, tw),
        image=up, strength=strength, num_inference_steps=num_inference_steps,
        guidance_scale=guidance_scale, rng=rng2, lora_scale=lora_scale,
        return_array=return_array, **kw,
    )
