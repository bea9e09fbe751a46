#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "train_steps_per_sec_chip": N, "train_imgs_per_sec_chip": N,
   "train_cached_steps_per_sec_chip": N, "train_cached_imgs_per_sec_chip": N,
   "train_batch": N}

Headline metric (BASELINE.json): images/sec/chip — SD1.5 + ControlLoRA guided sampling,
512², 20-step CFG, DPM-Solver++ 2M. The driver-set serving target is >=2 images/sec/chip
on v5e; `vs_baseline` = value / 2.0. Weights are zero-filled via eval_shape (no
pretrained checkpoints in this container) — throughput is weight-agnostic on the MXU/VPU
and the fast fill saves the ~140-210 s model-init compile that pushed round 3 past the
driver's time budget (BENCH_r03.json rc=124). The train_* fields carry the secondary
BASELINE target (train steps/sec/chip, 512² batch 8, encode-per-step, best measured
config: no remat + bf16 hint compute — see docs/BENCHMARKS.md).

Time-budget discipline (round 4): the driver kills the process at ~600 s. Sections run
headline-first (serving batch 4 → train → cached-train → serving batch 1) and each
section is gated on the time remaining (BENCH_BUDGET_S, default 560); a watchdog thread
emits the best-so-far JSON line and exits 0 if a compile overruns the budget, so the
driver always gets a parseable line. A persistent XLA compilation cache under
~/.cache/controllora_jax makes warm re-runs complete in well under a minute.

Measurement methodology: N sampler invocations are CHAINED (each consumes the previous
output as its initial latents), so asynchronous dispatch cannot overlap or hide latency;
execution is fenced by fetching an in-graph scalar checksum.

Diagnostics go to stderr; stdout carries exactly one JSON line.
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

T0 = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "585"))

RESULT = {
    "metric": "images/sec/chip (SD1.5+ControlLoRA, 512^2, 20-step CFG)",
    "unit": "images/sec",
}
_emit_lock = threading.Lock()
_emitted = False


def _time_left() -> float:
    return BUDGET_S - (time.time() - T0)


def emit_and_flush() -> None:
    """Print the single stdout JSON line exactly once (main path or watchdog)."""
    global _emitted
    with _emit_lock:
        if _emitted:
            return
        _emitted = True
        if "value" not in RESULT:
            RESULT["value"] = 0.0
            RESULT["vs_baseline"] = 0.0
            RESULT["error"] = "budget exhausted before first measurement"
        print(json.dumps(RESULT))
        sys.stdout.flush()


def _watchdog() -> None:
    while True:
        left = _time_left()
        if left <= 0:
            print(f"watchdog: budget ({BUDGET_S:.0f}s) exhausted — emitting "
                  "best-so-far JSON", file=sys.stderr)
            RESULT.setdefault("truncated", True)
            emit_and_flush()
            os._exit(0)
        time.sleep(min(left, 1.0))


def log(msg: str) -> None:
    print(f"[{time.time()-T0:6.1f}s] {msg}", file=sys.stderr)


def main():
    threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    # Persistent compile cache: first (cold) run pays the 100-130 s XLA compiles;
    # any warm re-run in the same container finishes in well under a minute.
    # Host-fingerprinted (utils/hostcache.py): foreign-ISA AOT entries from a
    # previous host would otherwise load with only a warning and can corrupt.
    try:
        from controllora_tpu.utils.hostcache import fingerprinted

        cache_dir = fingerprinted(os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/controllora_jax"),
        ))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # cache is an optimization, never a requirement
        print(f"compile cache unavailable: {e}", file=sys.stderr)

    import jax.numpy as jnp

    from controllora_tpu.config import get_preset
    from controllora_tpu.models.control_lora import ControlLoRA
    from controllora_tpu.models.unet import UNet2DConditionModel, UNetConfig
    from controllora_tpu.models.vae import AutoencoderKL, VAEConfig
    from controllora_tpu.models.zoo import zeros_params
    from controllora_tpu.ops.folding import fold_adapters
    from controllora_tpu.schedulers import DPMSolverMultistepScheduler

    dev = jax.devices()[0]
    log(f"device: {dev}")

    # Training anchor (BASELINE.md: "≥3× A100 steps/sec/chip"). Preference order:
    # a MEASURED reference number (BASELINE_TORCH.json, produced by
    # scripts/bench_reference_torch.py in a GPU reference environment), else the
    # documented public-report estimate — fp16+xformers SD1.5 adapter training at
    # 512^2 b8 clusters around 2–3 it/s on A100 (docs/BENCHMARKS.md), midpoint 2.5.
    anchor_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE_TORCH.json")
    if os.path.exists(anchor_path):
        with open(anchor_path) as f:
            ref = json.load(f)
        anchor = float(ref["steps_per_sec"])
        provenance = f"measured ({ref.get('device', 'reference GPU')})"
    else:
        anchor = 2.5
        provenance = ("public-report estimate, A100 fp16+xformers 512^2 b8 "
                      "(docs/BENCHMARKS.md); replace via "
                      "scripts/bench_reference_torch.py")
    RESULT["train_baseline_anchor_steps_per_sec"] = anchor
    RESULT["train_baseline_provenance"] = provenance

    dtype = jnp.bfloat16
    unet = UNet2DConditionModel(UNetConfig(), dtype=dtype)
    vae = AutoencoderKL(VAEConfig(), dtype=dtype)
    # bf16 hint encoding for inference (+16% at batch 1; fp32 is the
    # reference TRAINING policy — adapters still train fp32)
    control = ControlLoRA(get_preset("base"), dtype=dtype)

    latents0 = jnp.zeros((1, 64, 64, 4), jnp.float32)
    ctx2 = jnp.zeros((2, 77, 768), dtype)
    guide = jnp.zeros((1, 512, 512, 3), jnp.float32)

    t0 = time.time()
    unet_params = zeros_params(
        lambda k: unet.init(k, latents0, jnp.zeros((1,), jnp.int32), ctx2[:1])["params"],
        jax.random.PRNGKey(0), dtype=dtype,
    )
    vae_params = zeros_params(
        lambda k: vae.init(k, jnp.zeros((1, 64, 64, 3)))["params"],
        jax.random.PRNGKey(1), dtype=dtype,
    )
    control_params = zeros_params(
        lambda k: control._init_impl(k, 512), jax.random.PRNGKey(2),
    )
    jax.block_until_ready(control_params)
    log(f"init (eval_shape zero-fill): {time.time()-t0:.1f}s")

    steps = 20
    sch = DPMSolverMultistepScheduler()
    tables = sch.tables(steps)
    ts = tables[0]

    def make_sampler(nimg: int, tome=None, deepcache: int = 0):
        def sample(unet_params, vae_params, control_params, lat0, ctx, guide, gscale):
            # in-graph chain mixing: each bench call feeds the previous call's
            # latents back in; tanh re-normalizes INSIDE the jit (an eager host-side
            # op here would add a full tunnel round trip per call — see
            # docs/BENCHMARKS.md "measurement traps")
            lat0 = jnp.tanh(lat0)
            adapters = control(control_params, guide, unet.config)
            up, adapters = fold_adapters(unet_params, adapters)
            state = sch.init_state(lat0)

            def unet_eps(lat2, t, cache, i):
                kw = dict(tome=tome)
                if not deepcache:
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

            if deepcache:
                from controllora_tpu.models.unet import deepcache_feat_shape

                cache0 = jnp.zeros(
                    deepcache_feat_shape(unet.config, 2 * nimg, 64, 64), dtype)
            else:
                cache0 = jnp.zeros((), dtype)
            (state, _), _ = jax.lax.scan(body, (state, cache0), jnp.arange(steps))
            from controllora_tpu.models.vae import decode_per_image

            img = decode_per_image(vae, vae_params, state.sample)
            # return the image, latents for chaining, and an in-graph checksum:
            # float(checksum) is the only reliable execution fence on the remote
            # tunnel (block_until_ready does not fence; an eager reduce would add
            # a full round trip) — docs/BENCHMARKS.md "measurement traps"
            return img, state.sample, jnp.sum(img.astype(jnp.float32))

        return jax.jit(sample)

    def measure_serving(nimg: int, n: int = 6, tome=None, deepcache: int = 0) -> float:
        fn = make_sampler(nimg, tome=tome, deepcache=deepcache)
        lat0 = jnp.zeros((nimg, 64, 64, 4), jnp.float32)
        ctx = jnp.zeros((2 * nimg, 77, 768), dtype)
        t0 = time.time()
        img, lat, chk = fn(unet_params, vae_params, control_params, lat0, ctx,
                           guide, jnp.float32(9.0))
        float(chk)
        log(f"batch{nimg}: compile+first {time.time()-t0:.1f}s out {img.shape}")
        t0 = time.time()
        lat_in = lat0
        for _ in range(n):
            img, lat, chk = fn(unet_params, vae_params, control_params,
                               lat_in, ctx, guide, jnp.float32(9.0))
            lat_in = lat  # chain: next call depends on this output (device-resident)
        float(chk)  # scalar fetch = execution fence
        dt = (time.time() - t0) / n
        log(f"batch{nimg}: {dt*1000:.1f} ms -> {nimg/dt:.3f} img/s/chip")
        return nimg / dt

    # Conservative cold-compile cost estimates (round-2/3 measurements through the
    # tunnel) used to gate each section on the time remaining.
    EST_SERVE = 150.0   # ~125 s compile + warm-up + 6 chained calls
    EST_TRAIN = 135.0
    EST_CACHED = 110.0

    # ---- headline first: serving batch 4 (the per-chip optimum, docs/BENCHMARKS.md)
    nimgs = tuple(int(x) for x in os.environ.get("BENCH_NIMGS", "4,1").split(","))
    results = {nimgs[0]: measure_serving(nimgs[0])}
    RESULT["value"] = round(max(results.values()), 4)
    RESULT["vs_baseline"] = round(RESULT["value"] / 2.0, 4)
    RESULT[f"serving_batch{nimgs[0]}_imgs_per_sec"] = round(results[nimgs[0]], 4)

    # free HBM for the training stack (rebuild_serving_params restores them later)
    unet_params = vae_params = control_params = None

    # ---- training metric (BASELINE secondary target): fused train step at 512^2,
    # best measured config (no remat, bf16 hint compute), encode-per-step.
    from controllora_tpu.models import zoo
    from controllora_tpu.training.trainer import ControlLoRATrainer, make_optimizer

    tb = 8
    if _time_left() >= EST_TRAIN:
        t_unet, t_vae, t_text = zoo.build_models("sd15", dtype=dtype)
        t_frozen = zoo.zeros_frozen(t_unet, t_vae, t_text, latent_size=64,
                                    param_dtype=dtype)
        trainer = ControlLoRATrainer(
            control_lora=ControlLoRA(get_preset("base"), dtype=dtype),
            unet=t_unet, vae=t_vae, text_encoder=t_text, frozen=t_frozen,
            optimizer=make_optimizer(), remat_unet=False,
        )
        tstate = trainer.init_state(jax.random.PRNGKey(1), image_size=512)
        batch = {
            "pixel_values": jnp.zeros((tb, 512, 512, 3), jnp.float32),
            "guide_values": jnp.zeros((tb, 512, 512, 3), jnp.float32),
            "input_ids": jnp.zeros((tb, 77), jnp.int32),
        }
        step_fn = trainer.make_train_step()
        rng = jax.random.PRNGKey(2)
        t0 = time.time()
        tstate, m = step_fn(tstate, batch, rng)
        float(m["loss"])  # scalar fetch = execution fence (see serving note above)
        log(f"train: compile+first {time.time()-t0:.1f}s")
        rngs = [jax.block_until_ready(jax.random.fold_in(rng, i)) for i in range(6)]
        t0 = time.time()
        for i in range(6):
            tstate, m = step_fn(tstate, batch, rngs[i])  # state-chained: serializes
        float(m["loss"])
        tdt = (time.time() - t0) / 6
        log(f"train: {tdt*1000:.1f} ms/step -> {1/tdt:.2f} steps/s ({tb/tdt:.1f} img/s)")
        RESULT["train_steps_per_sec_chip"] = round(1.0 / tdt, 3)
        RESULT["train_imgs_per_sec_chip"] = round(tb / tdt, 2)
        RESULT["train_batch"] = tb
        # ratio vs the ANCHOR (A100 steps/s); the BASELINE target is 3.0x
        RESULT["train_vs_baseline"] = round((1.0 / tdt) / anchor, 3)

        # cached-latents config (--cache_latents): precomputed VAE posterior moments
        # replace the per-step encode — the deterministic-dataset fast path
        if _time_left() >= EST_CACHED:
            cbatch = {
                "latent_mean": jnp.zeros((tb, 64, 64, 4), jnp.float32),
                "latent_logvar": jnp.zeros((tb, 64, 64, 4), jnp.float32),
                "guide_values": batch["guide_values"],
                "input_ids": batch["input_ids"],
            }
            t0 = time.time()
            tstate, m = step_fn(tstate, cbatch, rng)
            float(m["loss"])
            log(f"train(cached): compile+first {time.time()-t0:.1f}s")
            t0 = time.time()
            for i in range(6):
                tstate, m = step_fn(tstate, cbatch, rngs[i])
            float(m["loss"])
            cdt = (time.time() - t0) / 6
            log(f"train(cached): {cdt*1000:.1f} ms/step -> {1/cdt:.2f} steps/s "
                f"({tb/cdt:.1f} img/s)")
            RESULT["train_cached_steps_per_sec_chip"] = round(1.0 / cdt, 3)
            RESULT["train_cached_imgs_per_sec_chip"] = round(tb / cdt, 2)
        else:
            log(f"skipping cached-train: {_time_left():.0f}s left < {EST_CACHED}")
        del tstate, trainer, t_frozen
    else:
        log(f"skipping training section: {_time_left():.0f}s left < {EST_TRAIN}")

    def rebuild_serving_params():
        # rebuild the serving params (freed above for training HBM) — eval_shape
        # zero-fill, seconds not minutes
        nonlocal unet_params, vae_params, control_params
        if unet_params is not None:
            return
        unet_params = zeros_params(
            lambda k: unet.init(k, latents0, jnp.zeros((1,), jnp.int32),
                                ctx2[:1])["params"],
            jax.random.PRNGKey(0), dtype=dtype,
        )
        vae_params = zeros_params(
            lambda k: vae.init(k, jnp.zeros((1, 64, 64, 3)))["params"],
            jax.random.PRNGKey(1), dtype=dtype,
        )
        control_params = zeros_params(
            lambda k: control._init_impl(k, 512), jax.random.PRNGKey(2),
        )

    # ---- opt-in accelerated serving configs, reported SEPARATELY — the headline
    # above stays exact. tome50 = token merging alone (ops/tome.py, the published
    # 512² sweet spot); turbo = tome 0.5 + DeepCache interval 2 (deep UNet levels
    # every other step), the max-speed deployment preset (scripts/serve.py flags).
    if _time_left() >= EST_SERVE and os.environ.get("BENCH_TOME", "1") != "0":
        from controllora_tpu.ops.tome import ToMeConfig

        rebuild_serving_params()
        tome_rate = measure_serving(nimgs[0], tome=ToMeConfig(ratio=0.5))
        RESULT["serving_tome50_imgs_per_sec"] = round(tome_rate, 4)
    else:
        log(f"skipping tome section: {_time_left():.0f}s left < {EST_SERVE}")
    if _time_left() >= EST_SERVE and os.environ.get("BENCH_TURBO", "1") != "0":
        from controllora_tpu.ops.tome import ToMeConfig

        rebuild_serving_params()
        turbo_rate = measure_serving(nimgs[0], tome=ToMeConfig(ratio=0.5),
                                     deepcache=2)
        RESULT["serving_turbo_imgs_per_sec"] = round(turbo_rate, 4)
    else:
        log(f"skipping turbo section: {_time_left():.0f}s left < {EST_SERVE}")

    # ---- secondary serving batches (app latency config), budget permitting
    for nimg in nimgs[1:]:
        if nimg in results:
            continue
        if _time_left() < EST_SERVE:
            log(f"skipping serving batch{nimg}: {_time_left():.0f}s left < {EST_SERVE}")
            continue
        rebuild_serving_params()
        results[nimg] = measure_serving(nimg)
        RESULT["value"] = round(max(results.values()), 4)
        RESULT["vs_baseline"] = round(RESULT["value"] / 2.0, 4)
        RESULT[f"serving_batch{nimg}_imgs_per_sec"] = round(results[nimg], 4)

    emit_and_flush()


if __name__ == "__main__":
    main()
