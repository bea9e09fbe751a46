#!/usr/bin/env python
"""Flash-kernel block-size tuning (VERDICT r1 item 9: per-batch block selection).

Sweeps (block_q, block_k) for the first-party pallas kernel over the serving
shapes: L=4096 (512²) at CFG-batch 2 and 8, and L=9216 (768²) at CFG-batch 2,
head_dim 40 (the SD1.5 320-channel level where self-attention dominates).

Timing: the tunnel's block_until_ready does not reliably fence kernel-only
programs, so each config is timed by the SLOPE between K1 and K2 in-graph scan
repetitions whose final carry is reduced to one scalar fetched with float() —
the scalar transfer forces full execution, and the slope cancels the constant
dispatch/transfer overhead. One JSON line per config.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K1, K2 = 4, 36


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from controllora_tpu.ops.pallas_attention import flash_attention_fwd

    shapes = [
        (16, 4096, 40),   # batch1-CFG2 x 8 heads
        (64, 4096, 40),   # batch4-CFG8 x 8 heads
        (16, 9216, 40),   # 768^2 batch1-CFG2
    ]
    blocks = [(512, 512), (512, 1024), (1024, 512), (1024, 1024),
              (2048, 512), (2048, 1024)]

    for bh, L, D in shapes:
        qs = np.random.default_rng(0).normal(size=(bh, L, D))
        q = jnp.asarray(qs, jnp.bfloat16)
        q2 = jnp.asarray(qs + 0.01, jnp.bfloat16)
        k = jnp.asarray(np.random.default_rng(1).normal(size=(bh, L, D)), jnp.bfloat16)
        v = jnp.asarray(np.random.default_rng(2).normal(size=(bh, L, D)), jnp.bfloat16)

        for bq, bk in blocks:
            if L % bq or L % bk:
                continue

            def make(K, bq=bq, bk=bk):
                def f(q, k, v):
                    def step(c, _):
                        o = flash_attention_fwd(c[0], c[1], c[2], block_q=bq, block_k=bk)
                        return (o, c[1], c[2]), None

                    c, _ = jax.lax.scan(step, (q, k, v), None, length=K)
                    return jnp.sum(c[0].astype(jnp.float32))

                return jax.jit(f)

            try:
                f1, f2 = make(K1), make(K2)
                t0 = time.time()
                float(f1(q, k, v)); float(f2(q, k, v))
                compile_s = time.time() - t0
                t0 = time.time()
                float(f1(q2, k, v))
                t1 = time.time()
                float(f2(q2, k, v))
                t2 = time.time()
                dt = ((t2 - t1) - (t1 - t0)) / (K2 - K1)
                print(json.dumps({
                    "bh": bh, "L": L, "D": D, "block_q": bq, "block_k": bk,
                    "ms": round(dt * 1000, 3), "compile_s": round(compile_s, 1),
                }))
            except Exception as e:
                print(json.dumps({
                    "bh": bh, "L": L, "D": D, "block_q": bq, "block_k": bk,
                    "error": str(e)[:160],
                }))
            sys.stdout.flush()


if __name__ == "__main__":
    main()
