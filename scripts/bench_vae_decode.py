#!/usr/bin/env python
"""VAE decode batch-scaling attribution (serving regression, round 2).

Measured via bench.py-style chained dispatch: one jitted program per variant
maps latents -> decode -> reduce back to latents, and N host-side calls chain
the output into the next input (device-resident; no eager ops between calls).
Slope-method scan timing returned zero for this program shape on the tunnel —
chained dispatch is the methodology bench.py itself validates against.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 10


def main():
    import jax
    import jax.numpy as jnp

    from controllora_tpu.models.vae import AutoencoderKL, VAEConfig
    from controllora_tpu.models.zoo import cast_tree

    dtype = jnp.bfloat16
    vae = AutoencoderKL(VAEConfig(), dtype=dtype)
    t0 = time.time()
    vae_params = cast_tree(
        jax.jit(vae.init)(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))["params"],
        dtype)
    print(f"init {time.time()-t0:.1f}s", file=sys.stderr)

    batches = [int(a) for a in sys.argv[1:]] or [1, 4]

    def run(name, fn, z0):
        try:
            # fns return (z, checksum-scalar); float(scalar) is the only
            # reliable fence on the tunnel (block_until_ready does not fence)
            # and an in-graph scalar avoids an eager-op round trip
            t0 = time.time()
            z, c = fn(vae_params, z0)
            float(c)
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(N):
                z, c = fn(vae_params, z)
            float(c)
            dt = (time.time() - t0) / N
            print(json.dumps({"component": name, "ms": round(dt * 1000, 2),
                              "compile_s": round(compile_s, 1)}))
        except Exception as e:
            print(json.dumps({"component": name, "error": str(e)[:200]}))
        sys.stdout.flush()

    for b in batches:
        z0 = jnp.full((b, 64, 64, 4), 0.1, jnp.bfloat16)

        @jax.jit
        def dec_batched(vp, z):
            img = vae.apply({"params": vp}, z, method=vae.decode)
            # reduce the image back to latent shape so calls can chain
            # perturbation must survive bf16 rounding or the tunnel's
            # (executable, args) result cache serves every chained call
            z = z + jnp.tanh(img[:, ::8, ::8, :1]) * 0.3
            return z, jnp.sum(z.astype(jnp.float32))

        run(f"decode_b{b}_batched_ours", dec_batched, z0)

        os.environ["CONTROLLORA_FLASH_IMPL"] = "stock"

        @jax.jit
        def dec_stock(vp, z):
            img = vae.apply({"params": vp}, z, method=vae.decode)
            # perturbation must survive bf16 rounding or the tunnel's
            # (executable, args) result cache serves every chained call
            z = z + jnp.tanh(img[:, ::8, ::8, :1]) * 0.3
            return z, jnp.sum(z.astype(jnp.float32))

        run(f"decode_b{b}_batched_stock", dec_stock, z0)
        os.environ.pop("CONTROLLORA_FLASH_IMPL", None)

        @jax.jit
        def dec_map(vp, z):
            img = jax.lax.map(
                lambda zi: vae.apply({"params": vp}, zi[None], method=vae.decode)[0],
                z)
            # perturbation must survive bf16 rounding or the tunnel's
            # (executable, args) result cache serves every chained call
            z = z + jnp.tanh(img[:, ::8, ::8, :1]) * 0.3
            return z, jnp.sum(z.astype(jnp.float32))

        run(f"decode_b{b}_laxmap", dec_map, z0)


if __name__ == "__main__":
    main()
