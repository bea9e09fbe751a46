#!/usr/bin/env python
"""Fine-grained UNet cost attribution on the serving shapes (512², CFG batch 8 =
serving batch 4): per-level resnet blocks, transformer blocks, bare convs,
GroupNorm+SiLU, upsample — plus lane-padding and norm-precision probes.

Purpose (VERDICT r2 #1): the conv/resnet stack is 63.9 of the 75 ms serving step;
before building fused kernels, localize WHERE inside the stack the time goes and
how far each piece sits from the MXU roofline. Slope-method timing (in-graph scan
with data-dependent carry) per docs/BENCHMARKS.md "measurement traps".

Run on the TPU chip:  python scripts/bench_unet_parts.py  [PART ...]
Parts: full resnet xformer conv gn upsample  (default: all)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K1, K2 = 2, 8


def slope(make, args, args2, name, flops=None):
    """Timing contract (docs/BENCHMARKS.md "measurement traps"): the jitted fn
    returns an in-graph fp32 checksum; float(chk) is the only reliable execution
    fence over the tunnel (block_until_ready does NOT fence — observed negative
    slopes without it). The fixed fetch round-trip cancels in the K2-K1 slope."""
    f1, f2 = make(K1), make(K2)
    t0 = time.time()
    float(f1(*args)[1]); float(f2(*args)[1])
    compile_s = time.time() - t0
    t0 = time.time()
    float(f1(*args2)[1])
    t1 = time.time()
    float(f2(*args2)[1])
    t2 = time.time()
    dt = ((t2 - t1) - (t1 - t0)) / (K2 - K1)
    rec = {"part": name, "ms": round(dt * 1000, 3), "compile_s": round(compile_s, 1)}
    if flops:
        rec["tflops_per_s"] = round(flops / dt / 1e12, 1)
        rec["mxu_util_pct_v5e"] = round(100 * flops / dt / 1e12 / 197, 1)
    print(json.dumps(rec))
    sys.stdout.flush()


def scanify(apply_fn, mix_fn):
    """Wrap apply_fn into a K-rep jitted scan with a data-dependent carry and an
    in-graph checksum output (the slope() fence)."""
    import jax
    import jax.numpy as jnp

    def make(K):
        def f(params, x, *rest):
            def step(c, _):
                y = apply_fn(params, c, *rest)
                return mix_fn(c, y), None

            c, _ = jax.lax.scan(step, x, None, length=K)
            return c, jnp.sum(c.astype(jnp.float32))

        return jax.jit(f)

    return make


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax.core import freeze

    from controllora_tpu.models import unet as unet_lib
    from controllora_tpu.models.unet import (
        GroupNorm, ResnetBlock2D, Transformer2DModel, UNet2DConditionModel,
        UNetConfig, Upsample2D, conv3,
    )

    parts = set(sys.argv[1:]) or {"full", "resnet", "xformer", "conv", "gn", "upsample"}
    dtype = jnp.bfloat16
    B = 8  # CFG batch of serving batch 4
    rng = jax.random.PRNGKey(0)
    # (H, W, C, L) per UNet level at 512²
    LEVELS = [(64, 64, 320), (32, 32, 640), (16, 16, 1280), (8, 8, 1280)]

    def x_at(h, w, c, scale=0.1):
        return jnp.asarray(
            np.random.default_rng(1).normal(0, scale, (B, h, w, c)), dtype)

    mix = lambda c, y: (c + 1e-2 * y.astype(c.dtype)
                        if y.shape == c.shape else
                        c + 1e-2 * jnp.mean(y).astype(c.dtype))

    if "full" in parts or "folded" in parts:
        unet = UNet2DConditionModel(UNetConfig(), dtype=dtype)
        lat = jnp.zeros((B, 64, 64, 4), dtype)
        t = jnp.zeros((B,), jnp.int32)
        ctx = jnp.zeros((B, 77, 768), dtype)
        from controllora_tpu.models.zoo import cast_tree

        params = cast_tree(jax.jit(unet.init)(rng, lat[:1], t[:1], ctx[:1])["params"],
                           dtype)
        # SD1.5 UNet ≈ 339 GFLOP per image forward at 512² (2·MACs over all convs,
        # matmuls, attention)
        if "full" in parts:
            ap = lambda p, x, t, ctx: unet.apply({"params": p}, x, t, ctx)
            make = scanify(ap, lambda c, y: c + 1e-2 * y.astype(c.dtype))
            slope(make, (params, lat, t, ctx),
                  (params, x_at(64, 64, 4), t, ctx), "full_unet_b8",
                  flops=B * 0.339e12)
        if "folded" in parts:
            # the SERVING configuration: folded base-preset adapters, so attn1
            # runs the fused biased_attention kernel and attn2 carries biases —
            # what bench.py's sampler actually executes per step
            from controllora_tpu.config import get_preset
            from controllora_tpu.models.control_lora import ControlLoRA
            from controllora_tpu.ops.folding import fold_adapters

            control = ControlLoRA(get_preset("base"), dtype=dtype)
            cp = control.init(jax.random.PRNGKey(2), image_size=512)
            adapters = control(cp, jnp.zeros((1, 512, 512, 3), jnp.float32),
                               unet.config)
            fup, fad = jax.jit(lambda p, a: fold_adapters(p, a))(params, adapters)
            ap = lambda p, x, t, ctx: unet.apply({"params": p}, x, t, ctx, fad)
            make = scanify(ap, lambda c, y: c + 1e-2 * y.astype(c.dtype))
            tag = ""
            for knob in ("CONTROLLORA_CROSS_FLASH", "CONTROLLORA_SERVE_BQ",
                         "CONTROLLORA_SERVE_BK"):
                if os.environ.get(knob):
                    tag += f"_{knob.split('_')[-1]}={os.environ[knob]}"
            slope(make, (fup, lat, t, ctx),
                  (fup, x_at(64, 64, 4), t, ctx), f"folded_unet_b8{tag}",
                  flops=B * 0.339e12)

    if "resnet" in parts:
        for (h, w, c) in LEVELS:
            m = ResnetBlock2D(c, dtype=dtype)
            x = x_at(h, w, c)
            temb = jnp.zeros((B, 1280), dtype)
            p = m.init(rng, x[:1], temb[:1])["params"]
            ap = lambda p, x, temb, m=m: m.apply({"params": p}, x, temb)
            # 2 convs 3x3 c->c: 2 * HW*9c² MACs * 2
            fl = B * 2 * (h * w * 9 * c * c) * 2
            slope(scanify(ap, mix), (p, x, temb), (p, x * 1.01, temb),
                  f"resnet_{h}x{w}x{c}", flops=fl)

    if "xformer" in parts:
        ctx = jnp.zeros((B, 77, 768), dtype)
        for (h, w, c) in LEVELS[:3]:
            m = Transformer2DModel(8, c // 8, 768, dtype=dtype)
            x = x_at(h, w, c)
            p = m.init(rng, x[:1], ctx[:1])["params"]
            ap = lambda p, x, ctx, m=m: m.apply({"params": p}, x, ctx)
            L = h * w
            # proj_in/out + attn1 qkv/out + attn2 q,out (+kv 77) + GEGLU ff (8c² L)
            fl = B * 2 * (2 * L * c * c + 4 * L * c * c + 2 * L * c * c
                          + 2 * L * L * c + 2 * 77 * c * c + 77 * L * c
                          + 12 * L * c * c)
            slope(scanify(ap, mix), (p, x, ctx), (p, x * 1.01, ctx),
                  f"xformer_{h}x{w}x{c}", flops=fl)

    if "conv" in parts:
        for (h, w, c) in LEVELS:
            m = conv3(c, dtype, "c")
            x = x_at(h, w, c)
            p = m.init(rng, x[:1])["params"]
            ap = lambda p, x, m=m: m.apply({"params": p}, x)
            fl = B * 2 * h * w * 9 * c * c
            slope(scanify(ap, mix), (p, x), (p, x * 1.01),
                  f"conv3_{h}x{w}x{c}", flops=fl)
        # lane-padding probe: 320 pads to 3x128; 384 is exact. If 384 runs in
        # similar time despite 44% more FLOPs, level-0 convs pay lane padding.
        for c in (256, 320, 384):
            m = conv3(c, dtype, "c")
            x = x_at(64, 64, c)
            p = m.init(rng, x[:1])["params"]
            ap = lambda p, x, m=m: m.apply({"params": p}, x)
            fl = B * 2 * 64 * 64 * 9 * c * c
            slope(scanify(ap, mix), (p, x), (p, x * 1.01),
                  f"conv3_pad_probe_64x64x{c}", flops=fl)

    if "int8" in parts:
        # int8 conv probe: can the v5e MXU's 2x int8 throughput be realized
        # through XLA's conv, including the dynamic-quantization overhead?
        # (weights per-output-channel static, activations per-tensor dynamic)
        # sub-ms parts need many reps: the tunnel's timing noise is ~±1 ms per
        # fence, so the slope needs K2-K1 >> noise/part_ms
        global K1, K2
        K1, K2 = 4, 64
        for (h, w, c) in [(64, 64, 320), (32, 32, 640), (16, 16, 1280)]:
            x = x_at(h, w, c)
            wk = jnp.asarray(
                np.random.default_rng(2).normal(0, 0.05, (3, 3, c, c)), jnp.float32)
            wq = jnp.clip(jnp.round(wk / (jnp.abs(wk).max() / 127.0)), -127, 127
                          ).astype(jnp.int8)
            ws = (jnp.abs(wk).max() / 127.0).astype(jnp.float32)
            fl = B * 2 * h * w * 9 * c * c

            def conv_bf16(p, x):
                return jax.lax.conv_general_dilated(
                    x, p.astype(jnp.bfloat16), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)

            slope(scanify(conv_bf16, mix), (wk, x), (wk, x * 1.01),
                  f"conv_bf16_{h}x{w}x{c}", flops=fl)

            def conv_int8(p, x):
                s_act = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
                xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_act), -127, 127
                              ).astype(jnp.int8)
                o = jax.lax.conv_general_dilated(
                    xq, p, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                return (o.astype(jnp.float32) * (s_act * ws)).astype(jnp.bfloat16)

            slope(scanify(conv_int8, mix), (wq, x), (wq, x * 1.01),
                  f"conv_int8_{h}x{w}x{c}", flops=fl)

    if "gn" in parts:
        for (h, w, c) in LEVELS[:2]:
            m = GroupNorm(32, 1e-5, dtype)
            x = x_at(h, w, c)
            p = m.init(rng, x[:1])["params"]
            ap = lambda p, x, m=m: jax.nn.silu(m.apply({"params": p}, x))
            slope(scanify(ap, mix), (p, x), (p, x * 1.01), f"gn_silu_{h}x{w}x{c}")

    if "upsample" in parts:
        for (h, w, c) in [(8, 8, 1280), (16, 16, 1280), (32, 32, 640)]:
            m = Upsample2D(c, dtype=dtype)
            x = x_at(h, w, c)
            p = m.init(rng, x[:1])["params"]
            ap = lambda p, x, m=m: m.apply({"params": p}, x)
            mix2 = lambda c_, y: c_ + 1e-2 * y[:, ::2, ::2, :].astype(c_.dtype)
            slope(scanify(ap, mix2), (p, x), (p, x * 1.01), f"upsample_{h}x{w}x{c}")


if __name__ == "__main__":
    main()
