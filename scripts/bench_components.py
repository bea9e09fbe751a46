#!/usr/bin/env python
"""Per-component training-step cost attribution (VERDICT r1 item 2).

Methodology for the remote-TPU tunnel: each component is measured as ONE jitted
call that runs the op K times inside a `lax.scan` whose carry feeds each output
back into the next input (a cheap in-graph mix keeps shapes fixed). This defeats
both tunnel-side result caching of identical dispatches AND async-dispatch
overlap — the scan body cannot be elided or reordered. Reported ms = scan_time/K.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 8


def scan_time(jitted, args, name, args2=None):
    """Compile+run with `args`, then time with `args2` (a distinct-value arg set)
    so a value-keyed dispatch cache cannot serve the timed call."""
    import jax

    t0 = time.time()
    out = jax.block_until_ready(jitted(*args))
    print(f"  {name}: compile+first {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    jax.block_until_ready(jitted(*(args2 if args2 is not None else args)))
    dt = (time.time() - t0) / K
    print(json.dumps({"component": name, "ms": round(dt * 1000, 2)}))
    sys.stdout.flush()
    del out


def main(batch_size=8):
    import jax
    import jax.numpy as jnp

    from controllora_tpu.config import get_preset
    from controllora_tpu.models import zoo
    from controllora_tpu.models.control_lora import ControlLoRA

    dtype = jnp.bfloat16
    unet, vae, text_encoder = zoo.build_models("sd15", dtype=dtype)
    frozen = zoo.random_frozen(jax.random.PRNGKey(0), unet, vae, text_encoder,
                               latent_size=64, param_dtype=dtype)
    import numpy as np

    px = jnp.zeros((batch_size, 512, 512, 3), jnp.float32)
    px2 = jnp.asarray(np.full((batch_size, 512, 512, 3), 0.1, np.float32))
    ids = jnp.zeros((batch_size, 77), jnp.int32)
    ids2 = jnp.asarray(np.full((batch_size, 77), 3, np.int32))
    rng = jax.random.PRNGKey(2)

    def repeat(body, mix):
        """K sequential body() calls; mix folds the output back into the carry."""
        def f(*args):
            def step(carry, _):
                return mix(carry, body(*carry)), None

            carry, _ = jax.lax.scan(step, args, None, length=K)
            return carry

        return jax.jit(f)

    # VAE encode: mix latent output back into the pixel input
    vae_enc = repeat(
        lambda p, x, r: vae.apply({"params": p}, x, r, method=vae.encode),
        lambda c, o: (c[0], c[1] + 1e-6 * jnp.mean(o), c[2]),
    )
    scan_time(vae_enc, (frozen["vae"], px, rng), "vae_encode",
              args2=(frozen["vae"], px2, rng))

    clip = repeat(
        lambda p, i: text_encoder.apply({"params": p}, i),
        lambda c, o: (c[0], c[1] + jnp.mean(o).astype(jnp.int32) * 0),
    )
    scan_time(clip, (frozen["text"], ids), "clip", args2=(frozen["text"], ids2))

    for hdt, tag in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        control = ControlLoRA(get_preset("base"), dtype=hdt)
        cparams = control.init(jax.random.PRNGKey(1), image_size=512)
        hint = repeat(
            lambda c, g: jax.tree.leaves(control(c, g, unet.config))[0],
            lambda c, o: (c[0], c[1] + 1e-6 * jnp.mean(o)),
        )
        scan_time(hint, (cparams, px), f"hint_encode_{tag}", args2=(cparams, px2))

    control = ControlLoRA(get_preset("base"))
    cparams = control.init(jax.random.PRNGKey(1), image_size=512)
    lat = jnp.zeros((batch_size, 64, 64, 4), dtype)
    ctx = jnp.zeros((batch_size, 77, 768), dtype)
    t = jnp.zeros((batch_size,), jnp.int32)

    fwd = repeat(
        lambda up, cp, l, tt, cx, g: unet.apply(
            {"params": up}, l, tt, cx, control(cp, g, unet.config)),
        lambda c, o: (c[0], c[1], jnp.tanh(o), *c[3:]),
    )
    scan_time(fwd, (frozen["unet"], cparams, lat, t, ctx, px), "hint+unet_fwd",
              args2=(frozen["unet"], cparams, lat, t, ctx, px2))

    def loss(cp, up, l, tt, cx, g):
        pred = unet.apply({"params": up}, l, tt, cx, control(cp, g, unet.config))
        return jnp.mean(pred.astype(jnp.float32) ** 2)

    grad = repeat(
        lambda cp, up, l, tt, cx, g: jax.grad(loss)(cp, up, l, tt, cx, g),
        lambda c, o: (jax.tree.map(lambda a, b: a + 1e-6 * b, c[0], o), *c[1:]),
    )
    scan_time(grad, (cparams, frozen["unet"], lat, t, ctx, px),
              "hint+unet_fwd+bwd_noremat",
              args2=(cparams, frozen["unet"], lat, t, ctx, px2))


if __name__ == "__main__":
    main(batch_size=int(sys.argv[1]) if len(sys.argv) > 1 else 8)
