#!/usr/bin/env python
"""Flash-vs-XLA attention at ODD serving resolutions (apps slider 256..768/64).

The auto backend routes L % 512 == 0 self-attention to flash; the other slider
resolutions (384²→2304, 448²→3136, 576²→5184, 640²→6400, 704²→7744) fall back
to the XLA einsum path. This measures whether flash with the pick_block choice
(256/64-wide blocks) still beats XLA there, to set the auto-backend threshold
on data rather than guesswork. Slope-method timing (see bench_flash_blocks.py).
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

    from controllora_tpu.ops.pallas_attention import flash_attention_fwd, pick_block

    def xla_attn(q, k, v):
        s = jnp.einsum("bld,bkd->blk", q, k,
                       preferred_element_type=jnp.float32) * (q.shape[-1] ** -0.5)
        p = jax.nn.softmax(s, -1)
        return jnp.einsum("blk,bkd->bld", p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    # (bh, L, D): CFG batch 2 × 8 heads at the 320-channel level
    lengths = [2304, 2560, 3136, 5184, 6400, 7744]

    for L in lengths:
        bh, D = 16, 40
        qs = np.random.default_rng(0).normal(size=(bh, L, D))
        q = jnp.asarray(qs, jnp.bfloat16)
        q2 = jnp.asarray(qs + 0.01, jnp.bfloat16)
        k = jnp.asarray(np.random.default_rng(1).normal(size=(bh, L, D)), jnp.bfloat16)
        v = jnp.asarray(np.random.default_rng(2).normal(size=(bh, L, D)), jnp.bfloat16)
        blk = pick_block(L)

        variants = [("xla", None)]
        if blk is not None:
            variants.append((f"flash_{blk}x{blk}", (blk, blk)))
            # wider KV block if it tiles (bandwidth matters most on the KV side)
            for wide in (1024, 512):
                if wide > blk and L % wide == 0:
                    variants.append((f"flash_{blk}x{wide}", (blk, wide)))
                    break

        for name, blocks in variants:
            def make(K, blocks=blocks):
                def f(q, k, v):
                    def step(c, _):
                        if blocks is None:
                            o = xla_attn(c[0], c[1], c[2])
                        else:
                            o = flash_attention_fwd(
                                c[0], c[1], c[2],
                                block_q=blocks[0], block_k=blocks[1])
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
                    "L": L, "impl": name, "ms": round(dt * 1000, 3),
                    "compile_s": round(compile_s, 1),
                }))
            except Exception as e:
                print(json.dumps({"L": L, "impl": name, "error": str(e)[:160]}))
            sys.stdout.flush()


if __name__ == "__main__":
    main()
