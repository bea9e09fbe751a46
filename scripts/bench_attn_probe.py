#!/usr/bin/env python
"""Attention micro-probes for the round-3 serving push (VERDICT #1).

Round-3 attribution (bench_unet_parts.py) overturned the round-2 narrative: the
level-0 transformer blocks cost 5×5.74 ms of the 64 ms UNet CFG eval, and ~4.0 ms
of each block is the attn1 flash call at bh=64 L=4096 D=40 (21% true-FLOP MXU
util — the D=40→128 lane padding wastes 3.2×). This probe measures:

  1. attn1 flash block-shape sweep at bh=64 (is (1024,1024) still optimal?)
  2. attn2 cross-attention: XLA einsum (materializes the (bh, L, 77) fp32 score
     tensor) vs the padded flash kernel with a small KV block
  3. bf16-scores einsum variant for attn2

Run alone on the chip: python scripts/bench_attn_probe.py [attn1|attn2]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K1, K2 = 2, 10


def slope(make, args, args2, name, flops=None):
    f1, f2 = make(K1), make(K2)
    t0 = time.time()
    try:
        float(f1(*args)[1]); float(f2(*args)[1])
    except Exception as e:
        print(json.dumps({"part": name, "error": str(e)[:200]}))
        sys.stdout.flush()
        return
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
    print(json.dumps(rec))
    sys.stdout.flush()


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    parts = set(p for p in sys.argv[1:] if not p.startswith("bh="))
    parts = parts or {"attn1", "attn2"}
    BH = next((int(a[3:]) for a in sys.argv[1:] if a.startswith("bh=")), 64)
    L, D = 4096, 40  # level-0; CFG batch 8 -> bh=64, batch 1 -> bh=16
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (BH, L, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (BH, L, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (BH, L, D)), jnp.bfloat16)

    def scanify(fn):
        def make(K):
            def f(q, k, v):
                def step(c, _):
                    o = fn(c, k, v)
                    return c + 0.3 * jnp.tanh(o), None

                c, _ = jax.lax.scan(step, q, None, length=K)
                return c, jnp.sum(c.astype(jnp.float32))

            return jax.jit(f)

        return make

    if "attn1" in parts:
        from controllora_tpu.ops.pallas_attention_vjp import flash_attention_padded

        for bq, bk in ((1024, 1024), (512, 1024), (256, 1024), (512, 512),
                       (256, 2048)):
            fn = lambda q, k, v, bq=bq, bk=bk: flash_attention_padded(q, k, v, bq, bk)
            fl = 2 * 2 * BH * L * L * D
            slope(scanify(fn), (q, k, v), (q * 1.01, k, v),
                  f"attn1_flash_bh{BH}_{bq}x{bk}", flops=fl)

    if "attn2" in parts:
        LK = 77
        kc = jnp.asarray(rng.normal(0, 1, (BH, LK, D)), jnp.bfloat16)
        vc = jnp.asarray(rng.normal(0, 1, (BH, LK, D)), jnp.bfloat16)
        scale = D ** -0.5

        def einsum_f32(q, k, v):
            s = jnp.einsum("bqd,bkd->bqk", q, k,
                           preferred_element_type=jnp.float32) * scale
            p = jax.nn.softmax(s, axis=-1)
            return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v,
                              preferred_element_type=jnp.float32).astype(q.dtype)

        def einsum_bf16(q, k, v):
            # scores stay bf16 in HBM; softmax still reduces in fp32
            s = (jnp.einsum("bqd,bkd->bqk", q, k,
                            preferred_element_type=jnp.float32) * scale
                 ).astype(jnp.bfloat16)
            p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
            return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v,
                              preferred_element_type=jnp.float32).astype(q.dtype)

        global K1, K2
        K1, K2 = 4, 24  # sub-ms parts need more reps for a clean slope
        fl = 2 * 2 * BH * L * LK * D
        slope(scanify(einsum_f32), (q, kc, vc), (q * 1.01, kc, vc),
              f"attn2_einsum_f32_bh{BH}", flops=fl)
        slope(scanify(einsum_bf16), (q, kc, vc), (q * 1.01, kc, vc),
              f"attn2_einsum_bf16_bh{BH}", flops=fl)

        from controllora_tpu.ops.pallas_attention_vjp import flash_attention_padded

        for bq, bk in ((1024, 128), (2048, 128), (512, 128)):
            fn = lambda q, k, v, bq=bq, bk=bk: flash_attention_padded(q, k, v, bq, bk)
            slope(scanify(fn), (q, kc, vc), (q * 1.01, kc, vc),
                  f"attn2_flash_bh{BH}_{bq}x{bk}", flops=fl)


if __name__ == "__main__":
    main()
