#!/usr/bin/env python
"""Generate the static per-program FLOP table bench.py uses for MFU.

Why a table: XLA's ``compiled.cost_analysis()`` counts a ``lax.scan`` body ONCE
(trip count unknown at HLO level), so the 20-step sampler program reads ~7x low
(round-4 bench: 4.2 Tflop reported vs ~28 analytic -> MFU "5%" instead of ~33%).
Instead we compile the STRAIGHT-LINE pieces (one CFG UNet step, one VAE image
decode, hint-encode+fold) on the local CPU backend — where cost analysis is
exact — and store their flop counts here; bench.py reassembles
``steps * unet + n * vae + hint`` per serving config. Train steps are
straight-line programs, so bench.py keeps using live cost_analysis for those.

Regenerate after any model-architecture change:
    JAX_PLATFORMS=cpu python scripts/gen_flop_table.py

Flop counts are backend-independent (HLO-level); CPU compiles here avoid the
remote-TPU compile service entirely.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from controllora_tpu.config import get_preset
from controllora_tpu.models.control_lora import ControlLoRA
from controllora_tpu.models.unet import UNet2DConditionModel, UNetConfig, deepcache_feat_shape
from controllora_tpu.models.vae import AutoencoderKL, VAEConfig
from controllora_tpu.ops.folding import fold_adapters
from controllora_tpu.ops.tome import ToMeConfig, step_key

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "controllora_tpu", "utils", "flop_table.json")


def compiled_flops(fn, *args) -> float:
    ca = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca["flops"])


def sds(tree):
    return jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)


def main():
    t_start = time.time()
    dtype = jnp.bfloat16
    res = 512
    lat = res // 8
    unet = UNet2DConditionModel(UNetConfig(), dtype=dtype)
    vae = AutoencoderKL(VAEConfig(), dtype=dtype)
    control = ControlLoRA(get_preset("base"), dtype=dtype)

    key = jax.random.PRNGKey(0)
    lat1 = jax.ShapeDtypeStruct((1, lat, lat, 4), jnp.float32)
    ctx1 = jax.ShapeDtypeStruct((1, 77, 768), dtype)
    guide = jax.ShapeDtypeStruct((1, res, res, 3), jnp.float32)

    unet_shapes = jax.eval_shape(
        lambda k: unet.init(k, jnp.zeros((1, lat, lat, 4), jnp.float32),
                            jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1, 77, 768), dtype))["params"], key)
    unet_shapes = sds(unet_shapes)
    control_shapes = sds(jax.eval_shape(lambda k: control._init_impl(k, res), key))
    adapters_sh = sds(jax.eval_shape(
        lambda cp, g: control(cp, g, unet.config), control_shapes, guide))
    folded_sh = sds(jax.eval_shape(fold_adapters, unet_shapes, adapters_sh))
    up_sh, bias_sh = folded_sh

    table = {"_meta": {
        "jax": jax.__version__, "resolution": res, "dtype": "bfloat16",
        "preset": "base", "generator": "scripts/gen_flop_table.py",
    }}

    def log(k, v, dt):
        print(f"  {k}: {v/1e12:.4f} Tflop  ({dt:.0f}s compile)", flush=True)

    # hint-encode + fold (once per sampler program, batch-independent: the guide
    # is a single conditioning image broadcast across the batch)
    t0 = time.time()
    f = compiled_flops(lambda cp, g, upar: fold_adapters(
        upar, control(cp, g, unet.config)), control_shapes, guide, unet_shapes)
    table[f"hint_fold_b1_r{res}"] = f
    log(f"hint_fold_b1_r{res}", f, time.time() - t0)

    # one VAE image decode (bench decodes per-image via lax.map; flops are linear)
    t0 = time.time()
    f = compiled_flops(
        lambda p, z: vae.apply({"params": p}, z, method=vae.decode),
        sds(jax.eval_shape(lambda k: vae.init(
            k, jnp.zeros((1, lat, lat, 3)))["params"], key)),
        jax.ShapeDtypeStruct((1, lat, lat, 4), jnp.float32))
    table[f"vae_decode_b1_r{res}"] = f
    log(f"vae_decode_b1_r{res}", f, time.time() - t0)

    # one CFG UNet step per variant and batch (batch = 2 * images, cond‖uncond)
    def unet_variant(tome, deepcache):
        def fn(up, bias, lat2, t, ctx, i):
            kw = {}
            if tome is not None:
                kw.update(tome=tome, tome_key=step_key(0, t, i))
            if deepcache == "shallow":
                feat = jnp.zeros(deepcache_feat_shape(
                    unet.config, lat2.shape[0], lat, lat), dtype)
                kw.update(deepcache="shallow", deepcache_feat=feat)
            elif deepcache == "full":
                kw.update(deepcache="full")
            out = unet.apply({"params": up}, lat2, t, ctx, bias, **kw)
            if isinstance(out, tuple):
                out = out[0]
            return out
        return fn

    variants = [
        ("", None, None),
        ("_tome50", ToMeConfig(ratio=0.5), None),
        ("_tome50_dcfull", ToMeConfig(ratio=0.5), "full"),
        ("_tome50_dcshallow", ToMeConfig(ratio=0.5), "shallow"),
        ("_dcfull", None, "full"),
        ("_dcshallow", None, "shallow"),
    ]
    for b in (2, 8):
        lat2 = jax.ShapeDtypeStruct((b, lat, lat, 4), dtype)
        tb = jax.ShapeDtypeStruct((b,), jnp.int32)
        ctxb = jax.ShapeDtypeStruct((b, 77, 768), dtype)
        i_sd = jax.ShapeDtypeStruct((), jnp.int32)
        for name, tome, dc in variants:
            k = f"unet_cfg_b{b}_r{res}{name}"
            t0 = time.time()
            f = compiled_flops(unet_variant(tome, dc), up_sh, bias_sh,
                               lat2, tb, ctxb, i_sd)
            table[k] = f
            log(k, f, time.time() - t0)

    with open(OUT, "w") as fp:
        json.dump(table, fp, indent=1, sort_keys=True)
    print(f"wrote {OUT} ({time.time()-t_start:.0f}s total)")


if __name__ == "__main__":
    main()
