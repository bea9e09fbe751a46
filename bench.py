#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "serving_mfu": N, "train_mfu": N,
   "train_steps_per_sec_chip": N, "train_imgs_per_sec_chip": N,
   "train_cached_steps_per_sec_chip": N, "train_b16_steps_per_sec_chip": N, ...}

Headline metric (BASELINE.json): images/sec/chip — SD1.5 + ControlLoRA guided sampling,
512², 20-step CFG, DPM-Solver++ 2M. The driver-set serving target is >=2 images/sec/chip
on v5e; `vs_baseline` = value / 2.0. Weights are zero-filled via eval_shape (no
pretrained checkpoints in this container) — throughput is weight-agnostic on the MXU/VPU
and the fast fill saves the ~140-210 s model-init compile that pushed round 3 past the
driver's time budget (BENCH_r03.json rc=124). The train_* fields carry the secondary
BASELINE target (train steps/sec/chip, 512² batch 8, encode-per-step, best measured
config: no remat + bf16 hint compute — see docs/BENCHMARKS.md).

Time-budget discipline (round 5): the driver kills the process at ~600 s, and the
remote-tunnel compile service is wildly variable (the identical batch-4 program has
compiled in anywhere from 155 s to >545 s across round-4 runs). Defenses:
  * sections run CHEAPEST-COMPILE-FIRST (serving batch 1 → batch 4 → train → cached →
    batch-16 train → tome → turbo) and the headline `value` is updated after EVERY
    serving section, so the watchdog always has a real number to emit;
  * each section after the first is gated on the worst compile time OBSERVED in this
    process (scaled 1.25x + runtime margin), not an optimistic constant — a cold first
    compile makes the gates pessimistic, a warm cache lets everything run;
  * a persistent XLA compilation cache (~/.cache/controllora_jax-<host-fp>) makes warm
    re-runs complete in well under the budget; the build round's last act is a full
    bench run precisely to leave that cache warm for the driver.

MFU: each section AOT-compiles (jit .lower().compile()), reads XLA's own
cost_analysis() flop count for the exact program measured, and reports
flops / (time * bf16 peak) for the device kind (v5e = 197 Tflop/s bf16). This is the
honest utilization number behind the throughput (docs/BENCHMARKS.md "MFU & the 3x
training anchor").

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


# bf16 peak matmul throughput per chip, by device_kind prefix
_PEAK_BF16 = (
    ("TPU v5 lite", 197e12),
    ("TPU v5e", 197e12),
    ("TPU v5p", 459e12),
    ("TPU v5", 197e12),
    ("TPU v4", 275e12),
    ("TPU v6 lite", 918e12),
    ("TPU v6e", 918e12),
)


def _peak_flops(dev) -> float:
    kind = getattr(dev, "device_kind", "")
    for prefix, peak in _PEAK_BF16:
        if kind.startswith(prefix):
            return peak
    return 197e12  # conservative default (v5e)


def _compiled_flops(compiled) -> float:
    """XLA's own flop count for the compiled program (0.0 if unavailable)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0) or 0.0)
    except Exception as e:  # cost analysis is informational, never required
        log(f"cost_analysis unavailable: {e}")
        return 0.0


def main():
    threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    # Persistent compile cache: first (cold) run pays the 100-550 s XLA compiles;
    # any warm re-run in the same container finishes in well under the budget.
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
    peak = _peak_flops(dev)
    log(f"device: {dev} (bf16 peak {peak/1e12:.0f} Tflop/s)")
    RESULT["device_kind"] = getattr(dev, "device_kind", str(dev))
    RESULT["peak_bf16_tflops"] = peak / 1e12

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

    unet_params = vae_params = control_params = None

    def build_serving_params():
        nonlocal unet_params, vae_params, control_params
        if unet_params is not None:
            return
        t0 = time.time()
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
        jax.block_until_ready(control_params)
        log(f"serving params (eval_shape zero-fill): {time.time()-t0:.1f}s")

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
                if tome is not None:
                    from controllora_tpu.ops.tome import step_key

                    kw["tome_key"] = step_key(0, t, i)
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

    # Section gating on OBSERVED compile cost: the tunnel compile service is too
    # variable for constants (155-550 s for the same program across runs). The
    # first section runs unconditionally; each later one requires time for the
    # worst compile seen so far (x1.25) plus a runtime margin — cold runs get
    # pessimistic gates, warm-cache runs (compile replay in seconds) run everything.
    observed_compiles = []

    def gate(name: str, optimistic: float, margin: float = 45.0) -> bool:
        need = optimistic + margin
        if observed_compiles:
            need = max(need, 1.25 * max(observed_compiles) + margin)
        if _time_left() < need:
            log(f"skipping {name}: {_time_left():.0f}s left < {need:.0f}s needed")
            return False
        return True

    def measure_serving(nimg: int, n: int = 6, tome=None, deepcache: int = 0,
                        label: str = ""):
        build_serving_params()
        fn = make_sampler(nimg, tome=tome, deepcache=deepcache)
        lat0 = jnp.zeros((nimg, 64, 64, 4), jnp.float32)
        ctx = jnp.zeros((2 * nimg, 77, 768), dtype)
        args = (unet_params, vae_params, control_params, lat0, ctx, guide,
                jnp.float32(9.0))
        t0 = time.time()
        compiled = fn.lower(*args).compile()
        flops = _compiled_flops(compiled)
        img, lat, chk = compiled(*args)
        float(chk)
        ct = time.time() - t0
        observed_compiles.append(ct)
        log(f"{label or f'batch{nimg}'}: compile+first {ct:.1f}s out {img.shape} "
            f"({flops/1e12:.1f} Tflop/program)")
        t0 = time.time()
        lat_in = lat0
        for _ in range(n):
            img, lat, chk = compiled(unet_params, vae_params, control_params,
                                     lat_in, ctx, guide, jnp.float32(9.0))
            lat_in = lat  # chain: next call depends on this output (device-resident)
        float(chk)  # scalar fetch = execution fence
        dt = (time.time() - t0) / n
        mfu = flops / (dt * peak) if flops else 0.0
        log(f"{label or f'batch{nimg}'}: {dt*1000:.1f} ms -> {nimg/dt:.3f} "
            f"img/s/chip (MFU {mfu*100:.1f}%)")
        return nimg / dt, mfu

    def bump_headline(rate: float) -> None:
        if rate > RESULT.get("value", 0.0):
            RESULT["value"] = round(rate, 4)
            RESULT["vs_baseline"] = round(rate / 2.0, 4)

    # ---- 1) serving batch 1 FIRST (cheapest compile observed: ~148 s cold vs
    # 155-545 s for batch 4) — gets a real headline on the books immediately
    nimgs = tuple(int(x) for x in os.environ.get("BENCH_NIMGS", "1,4").split(","))
    rate, mfu = measure_serving(nimgs[0])
    bump_headline(rate)
    RESULT[f"serving_batch{nimgs[0]}_imgs_per_sec"] = round(rate, 4)
    RESULT[f"serving_batch{nimgs[0]}_mfu"] = round(mfu, 4)
    RESULT["serving_mfu"] = round(mfu, 4)

    # ---- 2) remaining serving batches (batch 4 = the per-chip optimum)
    for nimg in nimgs[1:]:
        if not gate(f"serving batch{nimg}", 60.0):
            continue
        rate, mfu = measure_serving(nimg)
        bump_headline(rate)
        RESULT[f"serving_batch{nimg}_imgs_per_sec"] = round(rate, 4)
        RESULT[f"serving_batch{nimg}_mfu"] = round(mfu, 4)
        RESULT["serving_mfu"] = max(RESULT["serving_mfu"], round(mfu, 4))

    # ---- 3) training metric (BASELINE secondary target): fused train step at
    # 512^2, best measured config (no remat, bf16 hint compute), encode-per-step.
    from controllora_tpu.models import zoo
    from controllora_tpu.training.trainer import ControlLoRATrainer, make_optimizer

    tb = 8
    trainer = step_fn = tstate = None
    if gate("training section", 70.0) and os.environ.get("BENCH_TRAIN", "1") != "0":
        # free HBM for the training stack (build_serving_params restores later)
        unet_params = vae_params = control_params = None
        t_unet, t_vae, t_text = zoo.build_models("sd15", dtype=dtype)
        t_frozen = zoo.zeros_frozen(t_unet, t_vae, t_text, latent_size=64,
                                    param_dtype=dtype)
        trainer = ControlLoRATrainer(
            control_lora=ControlLoRA(get_preset("base"), dtype=dtype),
            unet=t_unet, vae=t_vae, text_encoder=t_text, frozen=t_frozen,
            optimizer=make_optimizer(), remat_unet=False,
        )
        tstate = trainer.init_state(jax.random.PRNGKey(1), image_size=512)
        step_fn = trainer.make_train_step()
        rng = jax.random.PRNGKey(2)
        rngs = [jax.block_until_ready(jax.random.fold_in(rng, i)) for i in range(6)]

        def measure_train(batch, tag: str, bsz: int):
            nonlocal tstate
            t0 = time.time()
            lowered = step_fn.lower(tstate, batch, rng).compile()
            tflops = _compiled_flops(lowered)
            tstate, m = step_fn(tstate, batch, rng)
            float(m["loss"])  # scalar fetch = execution fence (see serving note)
            ct = time.time() - t0
            observed_compiles.append(ct)
            log(f"train{tag}: compile+first {ct:.1f}s ({tflops/1e12:.1f} Tflop/step)")
            t0 = time.time()
            for i in range(6):
                tstate, m = step_fn(tstate, batch, rngs[i])  # state-chained
            float(m["loss"])
            dt = (time.time() - t0) / 6
            mfu = tflops / (dt * peak) if tflops else 0.0
            log(f"train{tag}: {dt*1000:.1f} ms/step -> {1/dt:.2f} steps/s "
                f"({bsz/dt:.1f} img/s, MFU {mfu*100:.1f}%)")
            return 1.0 / dt, bsz / dt, mfu

        batch = {
            "pixel_values": jnp.zeros((tb, 512, 512, 3), jnp.float32),
            "guide_values": jnp.zeros((tb, 512, 512, 3), jnp.float32),
            "input_ids": jnp.zeros((tb, 77), jnp.int32),
        }
        sps, ips, mfu = measure_train(batch, "", tb)
        RESULT["train_steps_per_sec_chip"] = round(sps, 3)
        RESULT["train_imgs_per_sec_chip"] = round(ips, 2)
        RESULT["train_batch"] = tb
        RESULT["train_mfu"] = round(mfu, 4)
        # ratio vs the ANCHOR (A100 steps/s); the BASELINE target is 3.0x
        RESULT["train_vs_baseline"] = round(sps / anchor, 3)

        # cached-latents config (--cache_latents): precomputed VAE posterior
        # moments replace the per-step encode — deterministic-dataset fast path
        if gate("cached-train", 50.0):
            cbatch = {
                "latent_mean": jnp.zeros((tb, 64, 64, 4), jnp.float32),
                "latent_logvar": jnp.zeros((tb, 64, 64, 4), jnp.float32),
                "guide_values": batch["guide_values"],
                "input_ids": batch["input_ids"],
            }
            sps, ips, mfu = measure_train(cbatch, "(cached)", tb)
            RESULT["train_cached_steps_per_sec_chip"] = round(sps, 3)
            RESULT["train_cached_imgs_per_sec_chip"] = round(ips, 2)
            RESULT["train_cached_mfu"] = round(mfu, 4)

        # reference-default batch 16 (train_text_to_image_control_lora.py:188):
        # the better-MFU configuration for throughput-oriented training
        if gate("train b16", 80.0) and os.environ.get("BENCH_TRAIN_B16", "1") != "0":
            b16 = {
                "pixel_values": jnp.zeros((16, 512, 512, 3), jnp.float32),
                "guide_values": jnp.zeros((16, 512, 512, 3), jnp.float32),
                "input_ids": jnp.zeros((16, 77), jnp.int32),
            }
            sps, ips, mfu = measure_train(b16, "(b16)", 16)
            RESULT["train_b16_steps_per_sec_chip"] = round(sps, 3)
            RESULT["train_b16_imgs_per_sec_chip"] = round(ips, 2)
            RESULT["train_b16_mfu"] = round(mfu, 4)
        del tstate, trainer, t_frozen
        tstate = trainer = None

    # ---- 4) opt-in accelerated serving configs, reported SEPARATELY — the
    # headline above stays exact. tome50 = token merging alone (ops/tome.py, the
    # published 512² sweet spot); turbo = tome 0.5 + DeepCache interval 2 (deep
    # UNet levels every other step), the max-speed deployment preset
    # (scripts/serve.py --preset turbo).
    bn = nimgs[-1]
    if gate("tome section", 60.0) and os.environ.get("BENCH_TOME", "1") != "0":
        from controllora_tpu.ops.tome import ToMeConfig

        rate, mfu = measure_serving(bn, tome=ToMeConfig(ratio=0.5),
                                    label=f"tome50 b{bn}")
        RESULT["serving_tome50_imgs_per_sec"] = round(rate, 4)
    if gate("turbo section", 60.0) and os.environ.get("BENCH_TURBO", "1") != "0":
        from controllora_tpu.ops.tome import ToMeConfig

        rate, mfu = measure_serving(bn, tome=ToMeConfig(ratio=0.5), deepcache=2,
                                    label=f"turbo b{bn}")
        RESULT["serving_turbo_imgs_per_sec"] = round(rate, 4)

    emit_and_flush()


if __name__ == "__main__":
    main()
