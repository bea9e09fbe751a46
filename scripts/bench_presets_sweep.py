#!/usr/bin/env python
"""Accelerated-preset sweep on the real chip (VERDICT r4 #4).

Measures the guided 20-step CFG sampler (same chained-dependency methodology as
bench.py — in-graph chain mixing, scalar fencing) across a grid of
(resolution, batch, tome_ratio, tome min_tokens, deepcache_interval) points, to
answer the round-4 open questions:

  * does ToMe's win grow at 768² (L=9216; attention is ~5× heavier than 512²)?
  * is `min_tokens=4096` (level-0-only merging, tomesd's max_downsample=1
    analog) the right default, or does merging level-1 (min_tokens<=1024) pay?
  * DeepCache interval 2 vs 3 — the published speed/quality range.

Each point is one jitted program (compile cost ~1-3 min over the tunnel), so the
default grid is curated, not exhaustive. Results go to stdout as one JSON line
per point; paste the table into docs/BENCHMARKS.md.

Usage (real chip, run ALONE — host contention poisons timing):
    python scripts/bench_presets_sweep.py              # default grid
    python scripts/bench_presets_sweep.py 768,1,0.5,4096,1   # single point
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (resolution, nimg, tome_ratio, min_tokens, deepcache_interval)
DEFAULT_GRID = [
    (512, 4, 0.0, 0, 1),      # exact reference point (bench.py headline)
    (512, 4, 0.5, 4096, 1),   # tome50 (round-4 default: level-0 only)
    (512, 4, 0.5, 1024, 1),   # + level-1 merging
    (512, 4, 0.0, 0, 2),      # DeepCache alone, interval 2
    (512, 4, 0.0, 0, 3),      # DeepCache alone, interval 3
    (512, 4, 0.5, 4096, 2),   # turbo (serve --preset turbo)
    (512, 4, 0.5, 4096, 3),   # turbo, interval 3
    (768, 1, 0.0, 0, 1),      # 768² exact (apps' slider max)
    (768, 1, 0.5, 9216, 1),   # 768² tome, level-0 only
    (768, 1, 0.5, 2304, 1),   # 768² tome, levels 0+1
    (768, 1, 0.5, 9216, 2),   # 768² turbo
]


def main():
    import jax
    import jax.numpy as jnp

    from controllora_tpu.config import get_preset
    from controllora_tpu.models.control_lora import ControlLoRA
    from controllora_tpu.models.unet import (
        UNet2DConditionModel, UNetConfig, deepcache_feat_shape,
    )
    from controllora_tpu.models.vae import AutoencoderKL, VAEConfig, decode_per_image
    from controllora_tpu.models.zoo import zeros_params
    from controllora_tpu.ops.folding import fold_adapters
    from controllora_tpu.ops.tome import ToMeConfig, step_key
    from controllora_tpu.schedulers import DPMSolverMultistepScheduler
    from controllora_tpu.utils.hostcache import fingerprinted

    jax.config.update("jax_compilation_cache_dir", fingerprinted(
        os.path.expanduser("~/.cache/controllora_jax")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    if len(sys.argv) > 1:
        grid = [tuple(float(x) if "." in x else int(x) for x in arg.split(","))
                for arg in sys.argv[1:]]
    else:
        grid = DEFAULT_GRID

    dtype = jnp.bfloat16
    unet = UNet2DConditionModel(UNetConfig(), dtype=dtype)
    vae = AutoencoderKL(VAEConfig(), dtype=dtype)
    control = ControlLoRA(get_preset("base"), dtype=dtype)

    steps = 20
    sch = DPMSolverMultistepScheduler()
    tables = sch.tables(steps)
    ts = tables[0]

    t0 = time.time()
    unet_params = zeros_params(
        lambda k: unet.init(k, jnp.zeros((1, 64, 64, 4), jnp.float32),
                            jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1, 77, 768), dtype))["params"],
        jax.random.PRNGKey(0), dtype=dtype)
    vae_params = zeros_params(
        lambda k: vae.init(k, jnp.zeros((1, 64, 64, 3)))["params"],
        jax.random.PRNGKey(1), dtype=dtype)
    print(f"# params: {time.time()-t0:.1f}s", file=sys.stderr)

    control_params_cache = {}

    def get_control_params(res):
        if res not in control_params_cache:
            control_params_cache[res] = zeros_params(
                lambda k: control._init_impl(k, res), jax.random.PRNGKey(2))
        return control_params_cache[res]

    def make_sampler(res, nimg, tome, deepcache):
        lh = res // 8

        def sample(unet_params, vae_params, control_params, lat0, ctx, guide, gscale):
            lat0 = jnp.tanh(lat0)
            adapters = control(control_params, guide, unet.config)
            up, adapters = fold_adapters(unet_params, adapters)
            state = sch.init_state(lat0)

            def unet_eps(lat2, t, cache, i):
                kw = dict(tome=tome)
                if tome is not None:
                    kw["tome_key"] = step_key(0, t, i)
                if not deepcache or deepcache == 1:
                    return unet.apply({"params": up}, lat2, t, ctx, adapters,
                                      **kw), cache

                def full_fn(_):
                    return unet.apply({"params": up}, lat2, t, ctx, adapters,
                                      deepcache="full", **kw)

                def shallow_fn(c):
                    return unet.apply({"params": up}, lat2, t, ctx, adapters,
                                      deepcache="shallow", deepcache_feat=c,
                                      **kw), c

                return jax.lax.cond(i % deepcache == 0, full_fn, shallow_fn, cache)

            def body(carry, i):
                state, cache = carry
                lat2 = jnp.concatenate([state.sample, state.sample], 0).astype(dtype)
                t = jnp.broadcast_to(ts[i], (2 * nimg,))
                eps, cache = unet_eps(lat2, t, cache, i)
                eu, ec = jnp.split(eps, 2, 0)
                return (sch.step(state, eu + gscale * (ec - eu), i, steps, tables),
                        cache), None

            if deepcache and deepcache > 1:
                cache0 = jnp.zeros(
                    deepcache_feat_shape(unet.config, 2 * nimg, lh, lh), dtype)
            else:
                cache0 = jnp.zeros((), dtype)
            (state, _), _ = jax.lax.scan(body, (state, cache0), jnp.arange(steps))
            img = decode_per_image(vae, vae_params, state.sample)
            return img, state.sample, jnp.sum(img.astype(jnp.float32))

        return jax.jit(sample)

    for point in grid:
        res, nimg, ratio, min_tokens, dc = point
        res, nimg, min_tokens, dc = int(res), int(nimg), int(min_tokens), int(dc)
        tome = ToMeConfig(ratio=float(ratio), min_tokens=min_tokens) if ratio else None
        lh = res // 8
        fn = make_sampler(res, nimg, tome, dc)
        lat0 = jnp.zeros((nimg, lh, lh, 4), jnp.float32)
        ctx = jnp.zeros((2 * nimg, 77, 768), dtype)
        guide = jnp.zeros((1, res, res, 3), jnp.float32)
        cparams = get_control_params(res)
        args = (unet_params, vae_params, cparams, lat0, ctx, guide, jnp.float32(9.0))
        t0 = time.time()
        img, lat, chk = fn(*args)
        float(chk)
        compile_s = time.time() - t0
        n = 6
        t0 = time.time()
        lat_in = lat0
        for _ in range(n):
            img, lat, chk = fn(unet_params, vae_params, cparams, lat_in, ctx,
                               guide, jnp.float32(9.0))
            lat_in = lat
        float(chk)
        dt = (time.time() - t0) / n
        print(json.dumps({
            "resolution": res, "batch": nimg, "tome_ratio": ratio,
            "tome_min_tokens": min_tokens, "deepcache_interval": dc,
            "ms_per_call": round(dt * 1000, 1),
            "imgs_per_sec_chip": round(nimg / dt, 3),
            "compile_s": round(compile_s, 1),
        }))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
