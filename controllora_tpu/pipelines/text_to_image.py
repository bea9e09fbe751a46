"""Guided text-to-image sampling pipeline.

Capability-parity target: the reference's inference paths —
`StableDiffusionPipeline` + installed ControlLoRA processors driven by the gradio apps
(reference apps/gradio_canny2image.py:66-92, SURVEY.md §3.2) and the eval scripts
(test_text_to_image_control_lora.py:772-789, DPMSolver++ 30 steps).

TPU-native shape: one jitted `lax.scan` over the denoising steps — CLIP encode (cond +
uncond), CFG-batched UNet with the control adapters threaded in, scheduler update —
followed by a jitted VAE decode. The reference's per-sample stateful re-injection
(apps:84) disappears: control states are explicit scan constants.

CFG convention matches the reference: latent batch is [uncond ‖ cond]; a batch-1 control
broadcasts (or repeat-interleaves under concat_hidden, reference models.py:209-212).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from controllora_tpu.models.clip import CLIPTextModel
from controllora_tpu.models.control_lora import ControlLoRA
from controllora_tpu.models.lora import AdapterStack, AttnAdapter
from controllora_tpu.models.unet import UNet2DConditionModel
from controllora_tpu.models.vae import AutoencoderKL
from controllora_tpu.schedulers import (
    DDIMScheduler,
    DPMSolverMultistepScheduler,
    EulerDiscreteScheduler,
    PNDMScheduler,
    UniPCMultistepScheduler,
)


def merge_extra_loras(
    stacks: Dict[str, AdapterStack],
    extra: Dict[str, AttnAdapter],
    where: str = "pre",
) -> Dict[str, AdapterStack]:
    """Compose plain LoRA adapters with installed ControlLoRA stacks — the
    mix_lora_and_control_lora path (reference mix_lora_and_control_lora.py:114-121:
    DreamBooth LoRAs become pre_loras/post_loras of each control processor)."""
    out = dict(stacks)
    for name, adapter in extra.items():
        stack = out.get(name)
        if stack is None:
            stack = AdapterStack(main=adapter)
        elif where == "pre":
            stack = stack.replace(pre=stack.pre + (adapter,))
        else:
            stack = stack.replace(post=stack.post + (adapter,))
        out[name] = stack
    return out


def merge_extra_controls(
    stacks: Dict[str, AdapterStack],
    extra_stacks: Dict[str, AdapterStack],
    where: str = "post",
) -> Dict[str, AdapterStack]:
    """Compose a SECOND ControlLoRA's adapters with already-installed stacks —
    multi-condition control (e.g. canny + pose driving one render). Beyond-reference:
    the reference's chain protocol (models.py:192-196) only ever carries plain LoRAs
    as pre/post entries; here the extra control adapters (with their control states
    attached) join the chain, and the chain math already handles control kinds
    (lora.adapt_query include_control / adapt_hidden_pre_q iterate pre+post).

    Chain-position semantics follow the reference quirks: pre/post value-LoRAs
    apply unscaled (models.py:260, 265) and honor skip flags — an extra control is
    a chained adapter, not a second `main`."""
    extra = {n: s.main for n, s in extra_stacks.items() if s.main is not None}
    return merge_extra_loras(stacks, extra, where)


class StableDiffusionControlLoRAPipeline:
    def __init__(
        self,
        unet: UNet2DConditionModel,
        vae: AutoencoderKL,
        text_encoder: CLIPTextModel,
        tokenizer,
        frozen: Dict[str, Any],
        control_lora: Optional[ControlLoRA] = None,
        control_params: Optional[Any] = None,
        scheduler: Optional[DPMSolverMultistepScheduler] = None,
        mesh=None,
    ):
        """`mesh`: optional `jax.sharding.Mesh` — multi-chip serving.

        * axis 'data': the image batch shards over it; every device runs the
          complete sampler on its slice via `shard_map` — zero collectives,
          linear scaling on ICI (throughput axis).
        * axis 'cfg' (size 2, optional): the classifier-free-guidance pair
          splits over it — rank 0 evaluates the uncond UNet branch, rank 1 the
          cond branch, and guidance combines via one `psum` of the (n, H/8,
          W/8, 4) eps per step (eps_g = (1-g)·eps_u + g·eps_c, a few hundred
          KB over ICI vs ~64 ms of UNet compute). This is the LATENCY axis: it
          cuts batch-1 sampling onto 2 chips, and composes with 'data' for
          2n-chip meshes (e.g. v5e-8 = data 4 × cfg 2).

        The reference serves single-GPU only (apps/gradio_canny2image.py);
        both axes are TPU-native extensions for slice serving."""
        self.unet = unet
        self.vae = vae
        self.text_encoder = text_encoder
        self.tokenizer = tokenizer
        self.frozen = frozen
        self.control_lora = control_lora
        self.control_params = control_params
        self.scheduler = scheduler or DPMSolverMultistepScheduler()
        self.mesh = mesh
        self._cfg_split = bool(mesh is not None and "cfg" in mesh.axis_names)
        if self._cfg_split and mesh.shape["cfg"] != 2:
            raise ValueError(
                f"the 'cfg' mesh axis carries the [uncond ‖ cond] guidance pair "
                f"and must have size 2, got {mesh.shape['cfg']}"
            )
        # 'model' axis: Megatron-style tensor parallelism of the UNet
        # transformer blocks (parallel/tp.py) — the latency axis beyond cfg=2.
        self._tp = int(dict(mesh.shape).get("model", 1)) if mesh is not None else 1
        if self._tp > 1:
            from controllora_tpu.parallel.tp import validate_tp

            validate_tp(unet.config, self._tp)
            self._unet_tp = UNet2DConditionModel(
                unet.config, dtype=unet.dtype, tp_axis="model", tp_size=self._tp
            )
        self._sample_cache: Dict[Tuple, Any] = {}

    # ------------------------------------------------------------------ text

    def encode_prompt(self, prompt, negative_prompt=""):
        """-> (2, 77, hidden) [uncond ‖ cond] context for CFG; SDXL dual towers
        additionally return the (2, pooled_dim) pooled pair for text_time
        micro-conditioning — then the result is a (ctx, pooled) tuple.

        `prompt` may be a LIST of n prompts (per-image prompts — mixed-request
        batch serving): the context is then (2, n, 77, hidden) ([uncond pairs ‖
        cond pairs], image-major on axis 1) and pooled (2, n, pooled_dim).
        `negative_prompt` may be a matching list or a single string shared by
        all images.

        Dual towers get per-tower token ids: tower 2's ids re-tokenize with the
        SDXL tokenizer_2 pad convention (pad id 0, '!') when the tokenizer
        supports a `pad_id` argument — pad positions feed the 77-token
        cross-attention context, so the pad id is parity-relevant."""
        per_image = None
        if isinstance(prompt, (list, tuple)):
            prompts = list(prompt)
            negs = (list(negative_prompt)
                    if isinstance(negative_prompt, (list, tuple))
                    else [negative_prompt] * len(prompts))
            if len(negs) != len(prompts):
                raise ValueError(
                    f"{len(prompts)} prompts but {len(negs)} negative prompts"
                )
            texts = negs + prompts  # block CFG layout [u1..un ‖ c1..cn]
            per_image = len(prompts)
        elif isinstance(negative_prompt, (list, tuple)):
            raise ValueError("list negative_prompt requires a list prompt")
        else:
            texts = [negative_prompt, prompt]

        def shape_out(enc):
            # (2n, 77, h) -> (2, n, 77, h) per-image pairs; (2, ...) single
            if per_image is None:
                return enc
            if isinstance(enc, tuple):
                return tuple(e.reshape((2, per_image) + e.shape[1:]) for e in enc)
            return enc.reshape((2, per_image) + enc.shape[1:])

        ids = self.tokenizer(texts)
        from controllora_tpu.models.clip import DualCLIPTextEncoder

        if isinstance(self.text_encoder, DualCLIPTextEncoder):
            try:
                ids2 = self.tokenizer(texts, pad_id=0)
            except TypeError:  # tokenizer without pad control: shared ids
                ids2 = ids
            if not hasattr(self, "_encode_jit"):
                self._encode_jit = jax.jit(
                    lambda p, i, i2: self.text_encoder.apply({"params": p}, i, i2)
                )
            return shape_out(self._encode_jit(self.frozen["text"], jnp.asarray(ids),
                                              jnp.asarray(ids2)))
        if not hasattr(self, "_encode_jit"):
            self._encode_jit = jax.jit(
                lambda p, i: self.text_encoder.apply({"params": p}, i)
            )
        return shape_out(self._encode_jit(self.frozen["text"], jnp.asarray(ids)))

    # ------------------------------------------------------------------ image

    def _encode_image(self, images: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) in [-1, 1] -> scaled init latents (B, H/8, W/8, 4).

        Deterministic posterior-mode encoding (rng-free): img2img reproducibility
        then rests entirely on the sampler rng, and the strength→0 limit is the
        exact VAE round trip."""
        if not hasattr(self, "_encode_image_jit"):
            self._encode_image_jit = jax.jit(
                lambda p, x: self.vae.apply({"params": p}, x, method=self.vae.encode)
            )
        return self._encode_image_jit(self.frozen["vae"], images)

    # ------------------------------------------------------------------ sampling core

    def _build_sampler(self, num_inference_steps: int, latent_hw: Tuple[int, int],
                       use_control: bool, start_index: int = 0,
                       img2img: bool = False, inpaint: bool = False,
                       decode: bool = True, end_index: Optional[int] = None,
                       continuation: bool = False, per_image_ctx: bool = False,
                       tome=None, deepcache_interval: int = 1):
        """`start_index`/`img2img`/`inpaint`: the SDEdit image-to-image mode —
        the scan runs only grid indices [start_index, num_inference_steps), the
        incoming `latents` are VAE-encoded init latents that get noised to the
        start grid point in the scheduler's own frame, and (inpaint) the known
        region is re-injected at its per-step noise level after every update
        (diffusers legacy-inpaint semantics). All static — each (strength,
        mask-ness) combination is its own compiled program. `decode=False`
        skips the VAE and returns the final latents (latent hand-off for
        refiner/upscaler chains, and latent-exactness tests). `end_index` stops
        the scan early (base side of an ensemble split); `continuation` resumes
        a partial trajectory from raw state-frame latents WITHOUT re-noising
        (refiner side)."""
        key = (num_inference_steps, latent_hw, use_control, start_index,
               img2img, inpaint, decode, end_index, continuation, per_image_ctx,
               tome, deepcache_interval)
        if key in self._sample_cache:
            return self._sample_cache[key]

        sch = self.scheduler

        # per-scheduler (state, step) protocol over a shared CFG-UNet eval.
        # `model_input(state, i)` is what the UNet sees at step i — identity for the
        # variance-preserving samplers, the 1/sqrt(sigma^2+1) rescale for Euler.
        model_input = None
        if isinstance(sch, DPMSolverMultistepScheduler):
            tables = sch.tables(num_inference_steps)
            ts = tables[0]
            init_state = sch.init_state
            get_sample = lambda s: s.sample
            step = lambda s, eps, i: sch.step(s, eps, i, num_inference_steps,
                                              tables, first_index=start_index)
        elif isinstance(sch, (DDIMScheduler, PNDMScheduler)):
            ts_np = sch.timesteps(num_inference_steps)
            ts = jnp.asarray(ts_np, jnp.int32)
            last_prev = (ts_np[-1] - (ts_np[0] - ts_np[1])) if len(ts_np) > 1 else -1
            ts_prev = jnp.asarray(
                list(ts_np[1:]) + [max(int(last_prev), -1) if isinstance(sch, PNDMScheduler) else -1],
                jnp.int32,
            )
            if isinstance(sch, DDIMScheduler):
                init_state = lambda x: x
                get_sample = lambda s: s
                step = lambda s, eps, i: sch.step(eps, ts[i], ts_prev[i], s)
            else:
                init_state = sch.init_state
                get_sample = lambda s: s.sample
                step = lambda s, eps, i: sch.step(s, eps, ts[i], ts_prev[i])
        elif isinstance(sch, EulerDiscreteScheduler):
            ts, sigmas = sch.tables(num_inference_steps)
            init_state = lambda x: sch.init_state(x, sigmas)
            get_sample = lambda s: s
            model_input = lambda s, i: sch.model_input(s, sigmas[i])
            step = lambda s, eps, i: sch.step(s, eps, i, sigmas)
        elif isinstance(sch, UniPCMultistepScheduler):
            tables = sch.tables(num_inference_steps)
            ts = tables[0]
            init_state = sch.init_state
            get_sample = lambda s: s.sample
            step = lambda s, eps, i: sch.step(s, eps, i, num_inference_steps,
                                              tables, first_index=start_index)
        else:
            raise TypeError(f"unsupported scheduler {type(sch).__name__}")
        if model_input is None:
            model_input = lambda s, i: get_sample(s)

        # ---- img2img/inpaint frame adapters: where the init image sits at grid
        # point i in this scheduler's own state frame (i == N means fully clean)
        N = num_inference_steps
        if isinstance(sch, EulerDiscreteScheduler):
            # VE frame: x_i = x0 + sigma_i * eps; sigmas has length N+1, final 0.
            # Prepared latents must NOT go through init_state (that multiplies
            # by sigma_max for the pure-noise txt2img start).
            noised_init = lambda init, noise, i: init + sigmas[i] * noise
            prepare_state = lambda init, noise: noised_init(init, noise, start_index)
            set_sample = lambda s, x: x
            # continuation latents are ALREADY in the VE frame at sigma[start]
            wrap_state = lambda x: x
        else:
            def noised_init(init, noise, i):
                t = ts[jnp.minimum(i, N - 1)]
                return jnp.where(
                    i < N, sch.schedule.add_noise(init, noise, t), init
                )

            prepare_state = lambda init, noise: init_state(
                sch.schedule.add_noise(init, noise, ts[start_index])
                if start_index < N else init
            )
            set_sample = ((lambda s, x: x) if isinstance(sch, DDIMScheduler)
                          else (lambda s, x: s.replace(sample=x)))
            wrap_state = init_state  # fresh (empty) multistep history

        cfg_split = self._cfg_split
        tp = self._tp
        unet_mod = self._unet_tp if tp > 1 else self.unet

        def core(unet_params, vae_params, latents, ctx, added, paint, adapters,
                 guidance_scale, lora_scale):
            # frozen weights are jit ARGUMENTS — closure capture would embed them as
            # multi-GB HLO constants and cripple (remote) compilation.
            # ctx arrives as the (2, 77, hidden) [uncond ‖ cond] pair and is repeated
            # to the (local) batch HERE — so that under shard_map each device builds
            # its own CFG context and the global [uncond*n ‖ cond*n] layout never has
            # to shard across devices. `added` is the SDXL text_time pair
            # ((2, pooled_dim), (2, 6)) or None; it follows ctx's CFG layout.
            n = latents.shape[0]
            if cfg_split:
                # Each 'cfg' rank evaluates ONE guidance branch on the full local
                # batch: rank 0 the uncond context, rank 1 the cond. Guidance is
                # the linear combination (1-g)·eps_u + g·eps_c ≡ eps_u +
                # g·(eps_c - eps_u), i.e. one psum over the axis per step.
                # Batch-1 control states broadcast identically to both branches
                # (_match_batch, models/lora.py:97) so the split is exact.
                rank = jax.lax.axis_index("cfg")
                ctx_i = jax.lax.dynamic_index_in_dim(ctx, rank, 0, keepdims=False)
                if per_image_ctx:
                    # ctx is (2, n, 77, h): this rank's branch is already per-image
                    ctx_n = ctx_i
                else:
                    ctx_n = jnp.broadcast_to(ctx_i[None], (n,) + ctx.shape[1:])
                cfg_w = jnp.where(rank == 0, 1.0 - guidance_scale, guidance_scale)
                added_n = None
                if added is not None:
                    def branch(a):
                        a_i = jax.lax.dynamic_index_in_dim(a, rank, 0,
                                                           keepdims=False)
                        if per_image_ctx:
                            return a_i
                        return jnp.broadcast_to(a_i[None], (n,) + a.shape[1:])

                    added_n = tuple(branch(a) for a in added)
            else:
                def cfg_pair(a, m):
                    if per_image_ctx:
                        # (2, n, ...) image-major pairs -> block [u1..un ‖ c1..cn]
                        return a.reshape((-1,) + a.shape[2:])
                    return a if m == 1 else jnp.concatenate(
                        [jnp.repeat(a[:1], m, 0), jnp.repeat(a[1:], m, 0)], axis=0
                    )

                ctx_n = cfg_pair(ctx, n)
                added_n = (None if added is None
                           else tuple(cfg_pair(a, n) for a in added))

            def added_kwargs(m):
                # added_n already carries ctx_n's CFG batch layout
                if added_n is None:
                    return {}
                return dict(added_text_embeds=added_n[0], added_time_ids=added_n[1])

            if img2img:
                # `latents` are the VAE-encoded init latents; noise them to the
                # start grid point in the scheduler's own frame (paint[0] is the
                # per-image Gaussian noise — kept for inpaint re-injection too)
                state = prepare_state(latents, paint[0])
            elif continuation:
                # ensemble split: `latents` are a partial trajectory's state at
                # grid point start_index — no re-noising, no sigma_max scaling
                state = wrap_state(latents)
            else:
                state = init_state(latents)

            def tail(state, eps_g, i):
                new_state = step(state, eps_g, i)
                if inpaint:
                    # diffusers legacy-inpaint: after each update, re-inject the
                    # known region at its own noise level for the NEXT grid point
                    # (i+1 == N -> the clean init, so the final composite is free)
                    cur = get_sample(new_state)
                    tgt = noised_init(latents, paint[0], i + 1)
                    m = paint[1]
                    new_state = set_sample(new_state, m * cur + (1.0 - m) * tgt)
                return new_state

            def unet_eps(inp, t, m, cache, i):
                """One UNet evaluation; under `deepcache_interval` > 1 the deep
                levels run only every interval-th step (lax.cond full/shallow,
                ops per models/unet.py deepcache docstring) and `cache` carries
                the deep feature between steps."""
                kw = dict(tome=tome, **added_kwargs(m))
                if tome is not None:
                    # fold the scan index into the merge key: adjacent float
                    # timesteps can round to the same int32 (ops/tome.step_key)
                    from controllora_tpu.ops.tome import step_key

                    kw["tome_key"] = step_key(0, t, i)

                def call(**dkw):
                    return unet_mod.apply(
                        {"params": unet_params}, inp, t, ctx_n, adapters,
                        lora_scale, **kw, **dkw,
                    )

                if deepcache_interval <= 1:
                    return call(), cache

                def full_fn(_):
                    return call(deepcache="full")

                def shallow_fn(cache):
                    return call(deepcache="shallow", deepcache_feat=cache), cache

                return jax.lax.cond(
                    (i - start_index) % deepcache_interval == 0,
                    full_fn, shallow_fn, cache,
                )

            def body(carry, i):
                state, cache = carry
                lat = model_input(state, i)
                if cfg_split:
                    t = jnp.broadcast_to(ts[i], (n,))
                    eps, cache = unet_eps(lat, t, n, cache, i)
                    eps_g = jax.lax.psum(
                        eps.astype(jnp.float32) * cfg_w.astype(jnp.float32), "cfg"
                    )
                    return (tail(state, eps_g, i), cache), None
                lat2 = jnp.concatenate([lat, lat], axis=0)
                t = jnp.broadcast_to(ts[i], (lat2.shape[0],))
                eps, cache = unet_eps(lat2, t, lat2.shape[0], cache, i)
                eps_u, eps_c = jnp.split(eps, 2, axis=0)
                eps_g = eps_u + guidance_scale * (eps_c - eps_u)
                return (tail(state, eps_g, i), cache), None

            if deepcache_interval > 1:
                from controllora_tpu.models.unet import deepcache_feat_shape

                b_eval = n if cfg_split else 2 * n
                cache0 = jnp.zeros(
                    deepcache_feat_shape(self.unet.config, b_eval,
                                         latents.shape[1], latents.shape[2]),
                    self.unet.dtype,
                )
            else:
                cache0 = jnp.zeros((), self.unet.dtype)  # unused placeholder
            (state, _), _ = jax.lax.scan(
                body, (state, cache0),
                jnp.arange(start_index,
                           num_inference_steps if end_index is None else end_index),
            )
            if not decode:
                return get_sample(state)
            # per-image decode: batched 512² decode is 2.4× superlinear on v5e
            # (models/vae.py decode_per_image)
            from controllora_tpu.models.vae import decode_per_image

            return decode_per_image(self.vae, vae_params, get_sample(state))

        def sample_fn(unet_params, vae_params, latents, ctx, added, paint,
                      adapters, guidance_scale, lora_scale, fold):
            if fold and adapters:
                # collapse the whole adapter stack into the kernels + per-position
                # biases once — the 20-step loop then runs at plain-SD1.5 cost
                from controllora_tpu.ops.folding import fold_adapters

                unet_params, adapters = fold_adapters(unet_params, adapters,
                                                      lora_scale)
            return core(unet_params, vae_params, latents, ctx, added, paint,
                        adapters, guidance_scale, lora_scale)

        def paint_spec(paint, P):
            # (noise[, mask]): per-image noise shards with the latents on 'data',
            # the batch-1 latent mask replicates
            if paint is None:
                return P()
            return (P("data"),) if len(paint) == 1 else (P("data"), P())

        def ctx_spec(P):
            # per-image context pairs (2, n, 77, h) shard image-major with the
            # latents; the single (2, 77, h) pair replicates
            return P(None, "data") if per_image_ctx else P()

        if self.mesh is not None and tp > 1:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            def sharded(unet_params, vae_params, latents, ctx, added, paint,
                        adapters, guidance_scale, lora_scale, fold):
                # Tensor-parallel serving: adapters fold at GLOBAL level (the
                # folded kernels then shard like the base ones), the param tree
                # is prepped (GEGLU column re-blocking, row-bias pre-division)
                # and shard_map slices it per tp_param_specs. `core` runs the
                # local UNet (heads/tp per device) with in-model psums.
                from controllora_tpu.ops.folding import fold_adapters
                from controllora_tpu.parallel.tp import (
                    tp_bias_specs,
                    tp_param_specs,
                    tp_prepare_biases,
                    tp_prepare_params,
                )

                if adapters:
                    # __call__ guarantees foldability before we get here
                    unet_params, adapters = fold_adapters(unet_params, adapters,
                                                          lora_scale)
                unet_params = tp_prepare_params(unet_params, tp)
                adapters = tp_prepare_biases(adapters, tp)
                f = shard_map(
                    core,
                    mesh=self.mesh,
                    in_specs=(tp_param_specs(unet_params), P(), P("data"),
                              ctx_spec(P), ctx_spec(P), paint_spec(paint, P),
                              tp_bias_specs(adapters), P(), P()),
                    out_specs=P("data"),
                    check_vma=False,
                )
                return f(unet_params, vae_params, latents, ctx, added, paint,
                         adapters, guidance_scale, lora_scale)

            jitted = jax.jit(sharded, static_argnames=("fold",))
        elif self.mesh is not None:
            from functools import partial

            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            def sharded(unet_params, vae_params, latents, ctx, added, paint,
                        adapters, guidance_scale, lora_scale, fold):
                # Each device runs the sampler on its batch slice; weights,
                # context pair, scales, and (batch-1) control states replicate.
                # Specs never mention 'cfg': latents/scheduler state replicate
                # over it and both ranks hold the identical post-psum eps_g, so
                # decode is redundantly-replicated (free — it runs on otherwise
                # idle chips) and out_specs takes either copy.
                f = shard_map(
                    partial(sample_fn, fold=fold),
                    mesh=self.mesh,
                    in_specs=(P(), P(), P("data"), ctx_spec(P), ctx_spec(P),
                              paint_spec(paint, P), P(), P(), P()),
                    out_specs=P("data"),
                    check_vma=False,
                )
                return f(unet_params, vae_params, latents, ctx, added, paint,
                         adapters, guidance_scale, lora_scale)

            jitted = jax.jit(sharded, static_argnames=("fold",))
        else:
            jitted = jax.jit(sample_fn, static_argnames=("fold",))
        fn = lambda *a, **kw: jitted(self.frozen["unet"], self.frozen["vae"], *a, **kw)
        self._sample_cache[key] = fn
        return fn

    # ------------------------------------------------------------------ call

    def __call__(
        self,
        prompt: str,
        guide: Optional[np.ndarray] = None,  # (H, W, 3) in [-1, 1]
        negative_prompt: str = "",
        num_inference_steps: int = 20,
        guidance_scale: float = 9.0,
        num_images: int = 1,
        height: Optional[int] = None,
        width: Optional[int] = None,
        rng: Optional[jax.Array] = None,
        lora_scale: float = 1.0,
        extra_loras: Optional[Dict[str, AttnAdapter]] = None,
        extra_loras_where: str = "pre",
        extra_controls=None,
        extra_controls_where: str = "post",
        latents: Optional[jnp.ndarray] = None,
        image: Optional[np.ndarray] = None,
        strength: float = 0.8,
        mask: Optional[np.ndarray] = None,
        denoising_start: Optional[float] = None,
        denoising_end: Optional[float] = None,
        aesthetic_score: float = 6.0,
        negative_aesthetic_score: float = 2.5,
        return_array: bool = False,
        return_latents: bool = False,
        tome_ratio: float = 0.0,
        tome_min_tokens: int = 4096,
        deepcache_interval: int = 1,
    ):
        """Returns a list of HWC uint8 images (or float arrays in [-1,1]).

        `deepcache_interval` (1 disables — the default and the exact path):
        DeepCache (Ma et al. 2023) — the deep UNet levels run only every
        interval-th denoising step; in between, a cached deep feature is
        substituted and only the level-0 ops recompute (models/unet.py
        `deepcache` docstring). Interval 2-3 is the published speed/quality
        range; composes with `tome_ratio` and every mesh axis.

        `tome_ratio` (0 disables — the default and the exact path): token merging
        (ops/tome.py, the tomesd method) — before each level-0 self-attention,
        the given fraction of spatially redundant tokens merges into their
        most-similar neighbours and the output unmerges, cutting the quadratic
        attention cost ~(1-ratio)² for a small quality trade. 0.5 is the
        published sweet spot at 512². Composes with guides/folding (the folded
        per-position biases merge with the same token map) and the mesh axes.

        `image` + `strength`: image-to-image (SDEdit) — the init image is
        VAE-encoded (posterior mode), noised to the strength-selected grid
        point, and only the remaining `int(steps * strength)` denoising steps
        run. `mask` (H, W) in [0, 1], 1 = repaint (diffusers convention):
        inpainting — the known region is re-injected at its per-step noise
        level after every update; soft mask values blend. Both are
        beyond-reference (the reference apps serve text-to-image only) and
        compose with guides, extra LoRAs/controls, and every mesh axis.

        `return_latents`: skip the VAE decode and return the final (H/8, W/8, 4)
        scaled latents per image — latent hand-off for refiner/upscaler chains.

        `denoising_end` / `denoising_start`: the SDXL base→refiner
        ensemble-of-experts split (diffusers semantics). The base pipeline runs
        only grid indices [0, round(steps·end)) — pair with
        `return_latents=True` — and the refiner pipeline continues the SAME
        trajectory from `latents=` at [round(steps·start), steps) WITHOUT
        re-noising (unlike img2img). Use the same scheduler type and step count
        on both so the grids line up. 5-id text_time UNets (the refiner) take
        `aesthetic_score` / `negative_aesthetic_score` conditioning.

        `extra_controls`: optional sequence of (control_lora, params, guide) triples —
        additional ControlLoRAs composed into the same render (multi-condition
        control, e.g. canny + pose). Each triple's guide is encoded by its own hint
        encoder and its adapters join every attention layer's chain at
        `extra_controls_where` ('pre'|'post'); see merge_extra_controls.

        Per-image batching (mixed-request serving, beyond-reference): `prompt`
        (and `negative_prompt`) may be a LIST of n prompts — one per image — and
        `guide` may carry a batch of n guides (single-device; the mesh path keeps
        the replicated batch-1 guide). The whole mixed batch renders as ONE
        compiled sampler call, so heterogeneous requests reach the batched
        throughput optimum (docs/BENCHMARKS.md: 2.89 img/s at b4 vs 2.37 at b1);
        serving/engine.py builds micro-batches on top of this. Steps, resolution,
        guidance and lora scales stay batch-wide."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if isinstance(prompt, (list, tuple)):
            if num_images not in (1, len(prompt)):
                raise ValueError(
                    f"{len(prompt)} per-image prompts conflict with "
                    f"num_images={num_images}"
                )
            num_images = len(prompt)
        if guide is not None:
            guide = jnp.asarray(guide)[None] if guide.ndim == 3 else jnp.asarray(guide)
            height = height or guide.shape[1]
            width = width or guide.shape[2]
        if image is not None:
            image = jnp.asarray(image, jnp.float32)
            image = image[None] if image.ndim == 3 else image
            height = height or image.shape[1]
            width = width or image.shape[2]
        if latents is not None:
            _l4 = latents if latents.ndim == 4 else latents[None]
            height = height or _l4.shape[1] * 8
            width = width or _l4.shape[2] * 8
        height = height or 512
        width = width or 512
        lh, lw = height // 8, width // 8

        if mask is not None and image is None:
            raise ValueError("mask (inpainting) requires an init image")
        if image is not None and latents is not None:
            raise ValueError(
                "image and latents are mutually exclusive — img2img derives its "
                "start latents from the encoded init image"
            )

        per_image_ctx = isinstance(prompt, (list, tuple))
        encoded = self.encode_prompt(prompt, negative_prompt)
        added = None
        if isinstance(encoded, tuple):
            ctx, pooled = encoded
        else:
            ctx, pooled = encoded, None
        if self.unet.config.addition_embed_type == "text_time":
            if pooled is None:
                raise ValueError(
                    "this UNet needs text_time micro-conditioning; build the stack "
                    "with a pooled-projection text encoder "
                    "(zoo.build_models('sdxl' | 'sdxl-refiner'))"
                )
            # id-vector layout follows the conditioning width: 6 ids = SDXL-base
            # (orig_h, orig_w, crop_top, crop_left, target_h, target_w) — no
            # crop/rescale in this pipeline so original == target == render size
            # (diffusers _get_add_time_ids defaults); 5 ids = SDXL-refiner
            # (orig_h, orig_w, crop_top, crop_left, aesthetic_score) with the
            # cond/uncond score pair.
            want = self.unet.config.projection_class_embeddings_input_dim
            n_ids = ((want - pooled.shape[-1])
                     // self.unet.config.addition_time_embed_dim) if want else 6
            if n_ids == 5:
                tids = jnp.array(
                    [[height, width, 0, 0, negative_aesthetic_score],
                     [height, width, 0, 0, aesthetic_score]], jnp.float32,
                )
            else:
                tids = jnp.tile(
                    jnp.array([[height, width, 0, 0, height, width]], jnp.float32),
                    (2, 1),
                )
            if per_image_ctx:
                # pooled arrives (2, n, d); the shared size ids follow image-major
                tids = jnp.broadcast_to(
                    tids[:, None], (2, num_images, tids.shape[-1])
                )
            added = (pooled, tids)

        adapters = None
        if guide is not None and self.control_lora is not None:
            adapters = self.control_lora(
                self.control_params, guide, self.unet.config
            )
        if extra_loras:
            adapters = merge_extra_loras(adapters or {}, extra_loras, extra_loras_where)
        extra_guide_batches = []
        if extra_controls:
            for cl2, params2, guide2 in extra_controls:
                g2 = jnp.asarray(guide2)
                g2 = g2[None] if g2.ndim == 3 else g2
                extra_guide_batches.append(g2.shape[0])
                adapters = merge_extra_controls(
                    adapters or {}, cl2(params2, g2, self.unet.config),
                    extra_controls_where,
                )

        # img2img start-point: the first int(steps*strength) grid points are
        # skipped; strength 1 keeps the full schedule (the init image is then
        # noised all the way to the start of the schedule, diffusers semantics)
        paint = None
        start_index = 0
        if image is not None:
            s = float(min(max(strength, 0.0), 1.0))
            start_index = num_inference_steps - min(
                int(num_inference_steps * s), num_inference_steps
            )
        if denoising_start is not None:
            if image is not None:
                raise ValueError(
                    "denoising_start (latent trajectory continuation) and image "
                    "(img2img re-noising) are mutually exclusive"
                )
            if latents is None:
                raise ValueError(
                    "denoising_start continues a partial trajectory: pass the "
                    "base pipeline's return_latents output as latents="
                )
            start_index = int(round(num_inference_steps * float(denoising_start)))
        end_index = None
        if denoising_end is not None:
            end_index = int(round(num_inference_steps * float(denoising_end)))
            if not start_index < end_index <= num_inference_steps:
                raise ValueError(
                    f"denoising window [{start_index}, {end_index}) is empty or "
                    f"out of range for {num_inference_steps} steps"
                )

        tome = None
        if tome_ratio:
            from controllora_tpu.ops.tome import ToMeConfig

            if not 0.0 < tome_ratio <= 0.75:
                raise ValueError(
                    f"tome_ratio must be in (0, 0.75] (max merge = the 3/4 src "
                    f"fraction of the 2x2 dst grid), got {tome_ratio}"
                )
            # min_tokens: only blocks at least this long merge (default: level-0
            # at 512², tomesd's max_downsample=1; tests lower it for smoke widths)
            tome = ToMeConfig(ratio=float(tome_ratio),
                              min_tokens=int(tome_min_tokens))

        deepcache_interval = int(deepcache_interval)
        if deepcache_interval < 1:
            raise ValueError(
                f"deepcache_interval must be >= 1 (1 = exact path), "
                f"got {deepcache_interval}"
            )

        sampler = self._build_sampler(
            num_inference_steps, (lh, lw), adapters is not None,
            start_index=start_index, img2img=image is not None,
            inpaint=mask is not None, decode=not return_latents,
            end_index=end_index, continuation=denoising_start is not None,
            per_image_ctx=per_image_ctx, tome=tome,
            deepcache_interval=deepcache_interval,
        )
        foldable = bool(adapters) and all(
            s.main is not None and not s.pre and not s.post for s in adapters.values()
        )

        # All requested images render as ONE batched sampler call — serving-batch
        # throughput (docs/BENCHMARKS.md: 2.5 img/s at batch 4 vs 2.06 at batch 1)
        # reaches the apps' multi-sample requests. The CFG layout stays
        # [uncond*n ‖ cond*n]; batch-1 control biases broadcast over it.
        if image is not None:
            init_lat = self._encode_image(image)
            n = num_images
            if init_lat.shape[0] == 1 and n > 1:
                init_lat = jnp.repeat(init_lat, n, axis=0)
            elif init_lat.shape[0] != n and num_images != 1:
                raise ValueError(
                    f"init image batch {init_lat.shape[0]} conflicts with "
                    f"num_images={num_images}"
                )
            n = init_lat.shape[0] if num_images == 1 else n
            rng, k = jax.random.split(rng)
            noise = jax.random.normal(k, init_lat.shape, jnp.float32)
            if mask is not None:
                m = jnp.asarray(mask, jnp.float32)
                m = m[..., 0] if m.ndim == 3 else m
                # soft latent-space mask (area-style resize); 1 = repaint
                m = jnp.clip(jax.image.resize(m, (lh, lw), "linear"), 0.0, 1.0)
                paint = (noise, m[None, :, :, None])
            else:
                paint = (noise,)
            lat0 = init_lat
        elif latents is not None:
            lat0 = latents if latents.ndim == 4 else latents[None]
            n = lat0.shape[0]
            if num_images != 1 and num_images != n:
                raise ValueError(
                    f"explicit latents provide the batch ({n} image(s)); "
                    f"num_images={num_images} conflicts — pass a ({num_images}, H/8, "
                    "W/8, C) latents batch or drop num_images"
                )
        else:
            n = num_images
            rng, k = jax.random.split(rng)
            lat0 = jax.random.normal(k, (n, lh, lw, self.unet.config.in_channels),
                                     jnp.float32)
        if per_image_ctx and ctx.shape[1] != n:
            raise ValueError(
                f"{ctx.shape[1]} per-image prompts for a batch of {n} images — "
                "pass exactly one prompt per image (or a single string)"
            )
        if guide is not None and guide.shape[0] not in (1, n):
            raise ValueError(
                f"guide batch {guide.shape[0]} must be 1 (shared) or match the "
                f"image batch {n} (per-image guides)"
            )
        for m in extra_guide_batches:
            # same contract as the main guide: a batch that merely divides the
            # 2n CFG layout (e.g. 2 with n=3) would tile misaligned in
            # _match_batch instead of erroring
            if m not in (1, n):
                raise ValueError(
                    f"extra_controls guide batch {m} must be 1 (shared) or match "
                    f"the image batch {n} (per-image guides)"
                )
        if self.mesh is not None:
            n_dev = dict(self.mesh.shape).get("data", 1)
            if n % n_dev:
                raise ValueError(
                    f"data-parallel serving shards the image batch over {n_dev} "
                    f"devices; num_images={n} must be a multiple of the mesh size"
                )
            if guide is not None and guide.shape[0] != 1:
                raise ValueError(
                    "data-parallel serving supports a single (replicated) guide; got "
                    f"guide batch {guide.shape[0]}"
                )
            if self._tp > 1 and adapters and not foldable:
                raise ValueError(
                    "tensor-parallel serving (mesh 'model' axis) folds adapters "
                    "into the sharded kernels; pre/post adapter chains (mix / "
                    "multi-control composition) cannot fold — serve those on a "
                    "('data', 'cfg') mesh instead"
                )
        img = sampler(lat0, ctx, added, paint, adapters,
                      jnp.float32(guidance_scale), jnp.float32(lora_scale),
                      foldable)
        img = np.asarray(jax.device_get(img), np.float32)
        images = []
        for i in range(img.shape[0]):
            if return_latents or return_array:
                images.append(img[i])
            else:
                images.append(
                    np.clip((img[i] + 1.0) * 127.5, 0, 255).astype(np.uint8)
                )
        return images
