"""ControlLoRA training engine: one pjit-compiled train step over a data mesh.

TPU-native rebuild of the reference hot loop (reference
train_text_to_image_control_lora.py:741-867, SURVEY.md §3.1):

  * the whole step — VAE encode, noising, text encode, hint encode, UNet forward,
    adapter-only backward, clip + AdamW update — is ONE jitted function; no host
    round-trips (the reference crosses host/device every step for collate and loss
    logging),
  * frozen stacks (UNet/VAE/CLIP) run in bf16, adapters + optimizer in fp32
    (reference fp16-vs-fp32 policy, train:437-447),
  * gradients exist only for the adapter pytree (`jax.grad` w.r.t. the ControlLoRA
    params); XLA never materializes frozen-weight gradients,
  * data parallelism = batch sharded over the mesh 'data' axis; the psum for gradient
    averaging is emitted by XLA from the replicated output sharding (the reference
    relies on DDP all-reduce),
  * `jax.checkpoint` (remat) over the UNet apply trades FLOPs for HBM on the backward
    through the 860M-param frozen backbone.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from controllora_tpu.models.clip import CLIPTextModel
from controllora_tpu.models.control_lora import ControlLoRA
from controllora_tpu.models.unet import UNet2DConditionModel
from controllora_tpu.models.vae import AutoencoderKL
from controllora_tpu.schedulers import DDPMScheduler
from controllora_tpu.training.conditioning import resolve_text_conditioning


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any  # ControlLoRA param tree (fp32)
    opt_state: Any


def make_lr_schedule(
    learning_rate: float,
    lr_schedule: str = "constant",
    warmup_steps: int = 0,
    total_steps: int = 30_000,
    num_cycles: int = 1,
    power: float = 1.0,
):
    """The diffusers get_scheduler surface the reference exposes via
    --lr_scheduler (train:243-249, train_dreambooth_lora.py:291-308):
    constant[_with_warmup] / linear / cosine / cosine_with_restarts
    (`num_cycles` hard restarts, each decaying to 0) / polynomial (`power`,
    1e-7 floor). Returns an optax schedule (or a float for plain constant)."""
    decay_steps = max(total_steps - warmup_steps, 1)

    def _with_warmup(body):
        if not warmup_steps:
            return body
        return optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, warmup_steps), body],
            [warmup_steps],
        )

    if lr_schedule in ("constant", "constant_with_warmup"):
        sched = (_with_warmup(optax.constant_schedule(learning_rate))
                 if warmup_steps else learning_rate)
    elif lr_schedule == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, total_steps
        )
    elif lr_schedule == "cosine_with_restarts":
        seg = max(decay_steps // max(num_cycles, 1), 1)
        sched = _with_warmup(optax.join_schedules(
            [optax.cosine_decay_schedule(learning_rate, seg)
             for _ in range(max(num_cycles, 1))],
            [seg * (i + 1) for i in range(max(num_cycles, 1) - 1)],
        ))
    elif lr_schedule == "polynomial":
        sched = _with_warmup(optax.polynomial_schedule(
            init_value=learning_rate, end_value=1e-7, power=power,
            transition_steps=decay_steps,
        ))
    elif lr_schedule == "linear":
        sched = _with_warmup(
            optax.linear_schedule(learning_rate, 0.0, decay_steps)
        )
    else:
        raise ValueError(f"unknown lr_schedule {lr_schedule!r}")
    return sched


def make_optimizer(
    learning_rate: float = 1e-4,
    beta1: float = 0.9,
    beta2: float = 0.999,
    weight_decay: float = 1e-2,
    eps: float = 1e-8,
    max_grad_norm: float = 1.0,
    lr_schedule: str = "constant",
    warmup_steps: int = 0,
    total_steps: int = 30_000,
    grad_accumulation_steps: int = 1,
    use_8bit: bool = False,
    num_cycles: int = 1,
    power: float = 1.0,
) -> optax.GradientTransformation:
    """AdamW + global-norm clip matching the reference trainer defaults
    (train_text_to_image_control_lora.py:188, 209-255, 791-793). `use_8bit`
    swaps in block-wise int8 moment storage (reference train:500-508 /
    bitsandbytes; see training/adam8bit.py). Schedule names: make_lr_schedule."""
    sched = make_lr_schedule(learning_rate, lr_schedule, warmup_steps,
                             total_steps, num_cycles, power)
    if use_8bit:
        from controllora_tpu.training.adam8bit import adamw8bit

        adam = adamw8bit(sched, b1=beta1, b2=beta2, eps=eps,
                         weight_decay=weight_decay)
    else:
        adam = optax.adamw(sched, b1=beta1, b2=beta2, eps=eps,
                           weight_decay=weight_decay)
    tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), adam)
    if grad_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, grad_accumulation_steps)
    return tx


class ControlLoRATrainer:
    """Owns the models + frozen params and builds the jitted train/eval steps."""

    def __init__(
        self,
        control_lora: ControlLoRA,
        unet: UNet2DConditionModel,
        frozen: Dict[str, Any],  # {"unet": ..., "vae": ..., "text": ...} param trees
        vae: Optional[AutoencoderKL] = None,
        text_encoder: Optional[CLIPTextModel] = None,
        scheduler: Optional[DDPMScheduler] = None,
        optimizer: Optional[optax.GradientTransformation] = None,
        mesh: Optional[Mesh] = None,
        prediction_type: Optional[str] = None,
        snr_gamma: Optional[float] = None,
        remat_unet: bool = True,
        remat_policy: str = "dots",
        adapter_compute_dtype: Optional[Any] = None,
    ):
        self.control_lora = control_lora
        self.unet = unet
        self.vae = vae
        self.text_encoder = text_encoder
        self.frozen = frozen
        self.scheduler = scheduler or DDPMScheduler()
        self.optimizer = optimizer or make_optimizer()
        self.mesh = mesh
        self.remat_unet = remat_unet
        self.remat_policy = remat_policy
        # Mixed-precision adapter COMPUTE (master params + optimizer state stay
        # fp32): the adapters pytree threaded into the UNet is cast to this dtype,
        # so every lora/control matmul (lora_apply runs in the params' dtype) and
        # the injected control maps hit the MXU in bf16 like the frozen stack,
        # instead of fp32 at 1/4 peak. Gradients flow through the cast back to the
        # fp32 masters — the standard mixed-precision recipe, one rounding per
        # step. The reference's analog is fp16 autocast over the frozen stack with
        # fp32 adapters (train:437-447); this goes one step further and is OFF by
        # default for exact parity with that policy.
        self.adapter_compute_dtype = adapter_compute_dtype
        if prediction_type is not None:
            # --prediction_type override (reference train:761-765 via scheduler config)
            self.scheduler = DDPMScheduler(
                self.scheduler.schedule.replace(prediction_type=prediction_type)
            )
        self.snr_gamma = snr_gamma

    # ------------------------------------------------------------------ state

    def init_state(self, rng: jax.Array, image_size: int = 512) -> TrainState:
        params = self.control_lora.init(rng, image_size=image_size)

        def _mk(params):
            # one compiled program for the whole optimizer-state build — eager
            # optax init is hundreds of small dispatches (each a round trip on
            # remote-dispatch TPU runtimes)
            return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                              opt_state=self.optimizer.init(params))

        return jax.jit(_mk)(params)

    # ------------------------------------------------------------------ loss

    def _loss_fn(self, params, frozen, batch, rng):
        """batch: {"latents" or "pixel_values", "guide_values", "input_ids" or
        "encoder_hidden_states"} — NHWC images in [-1,1].

        `frozen` is threaded as a jit ARGUMENT, never captured: closure-captured
        frozen weights become multi-GB HLO constants, which bloats lowering and
        cripples (remote) compilation."""
        sch = self.scheduler
        rng_sample, rng_noise, rng_t = jax.random.split(rng, 3)

        if "latents" in batch:
            latents = batch["latents"]
        elif "latent_mean" in batch:
            # cached VAE posterior moments (data/latent_cache.py): sample fresh
            # per step — same training distribution as encode-per-step
            mean = batch["latent_mean"].astype(jnp.float32)
            std = jnp.exp(0.5 * batch["latent_logvar"].astype(jnp.float32))
            z = mean + std * jax.random.normal(rng_sample, mean.shape, jnp.float32)
            latents = z * self.vae.config.scaling_factor
        else:
            latents = self.vae.apply(
                {"params": frozen["vae"]},
                batch["pixel_values"],
                rng_sample,
                method=self.vae.encode,
            )
        latents = latents.astype(jnp.float32)
        b = latents.shape[0]

        noise = jax.random.normal(rng_noise, latents.shape, jnp.float32)
        t = jax.random.randint(rng_t, (b,), 0, sch.schedule.num_train_timesteps)
        noisy = sch.add_noise(latents, noise, t)

        ctx, added_kwargs = resolve_text_conditioning(
            batch, self.text_encoder, frozen.get("text"), self.unet.config, latents
        )

        adapters = self.control_lora(params, batch["guide_values"], self.unet.config)
        if self.adapter_compute_dtype is not None:
            cd = self.adapter_compute_dtype
            adapters = jax.tree.map(
                lambda x: x.astype(cd)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                adapters,
            )

        unet_apply = self.unet.apply
        if self.remat_unet:
            # "nothing" recomputes the whole forward in the backward (min HBM);
            # "dots" keeps MXU outputs resident (fewer recomputed matmuls, more HBM)
            # — measured tradeoff in docs/BENCHMARKS.md, selected via remat_policy.
            policy = {
                "nothing": jax.checkpoint_policies.nothing_saveable,
                "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                "dots_all": jax.checkpoint_policies.dots_saveable,
            }[self.remat_policy]
            unet_apply = jax.checkpoint(self.unet.apply, policy=policy)
        pred = unet_apply({"params": frozen["unet"]}, noisy, t, ctx, adapters,
                          **added_kwargs)

        target = sch.training_target(latents, noise, t)
        loss = (pred.astype(jnp.float32) - target) ** 2
        if self.snr_gamma is not None:
            acp = sch.schedule.alphas_cumprod[t]
            snr = acp / (1.0 - acp)
            w = jnp.minimum(snr, self.snr_gamma) / jnp.maximum(snr, 1e-8)
            loss = loss * w[:, None, None, None]
        return jnp.mean(loss)

    # ------------------------------------------------------------------ steps

    def make_train_step(self, return_grads: bool = False) -> Callable:
        """Build the jitted train step. Under a mesh, batch arrives sharded over 'data'
        and the state replicated; XLA emits the gradient all-reduce.

        Returns a wrapper with the historical (state, batch, rng) signature; the
        frozen stack is threaded as an argument of the underlying jit (see _loss_fn).

        `return_grads` adds the (all-reduced) gradient tree to the metrics dict —
        used by dp-correctness checks (__graft_entry__.dryrun_multichip) so one
        compiled program serves both the update and the gradient comparison."""

        def step_fn(state: TrainState, frozen, batch, rng) -> Tuple[TrainState, Dict[str, Any]]:
            # rng is used as given — the driver derives a per-step key
            # (jax.random.fold_in(run_key, step)); keeping derivation outside makes
            # fixed-noise overfit tests and recorded-noise parity runs possible.
            loss, grads = jax.value_and_grad(self._loss_fn)(
                state.params, frozen, batch, rng
            )
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            gnorm = optax.global_norm(grads)
            new_state = TrainState(
                step=state.step + 1, params=params, opt_state=opt_state
            )
            metrics = {"loss": loss, "grad_norm": gnorm}
            if return_grads:
                metrics["grads"] = grads
            return new_state, metrics

        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            data = NamedSharding(self.mesh, P("data"))
            jitted = jax.jit(
                step_fn,
                in_shardings=(repl, repl, data, repl),
                out_shardings=(repl, repl),
                donate_argnums=(0,),
            )
        else:
            jitted = jax.jit(step_fn, donate_argnums=(0,))

        def wrapper(state, batch, rng):
            return jitted(state, self.frozen, batch, rng)

        # AOT surface for benchmarking (bench.py AOT-compiles to time the compile
        # separately and read cost_analysis): thread the frozen stack exactly as
        # the call path does.
        wrapper.lower = lambda state, batch, rng: jitted.lower(
            state, self.frozen, batch, rng
        )
        return wrapper

    def make_eval_step(self) -> Callable:
        def eval_fn(state: TrainState, frozen, batch, rng):
            return self._loss_fn(state.params, frozen, batch, rng)

        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            data = NamedSharding(self.mesh, P("data"))
            jitted = jax.jit(eval_fn, in_shardings=(repl, repl, data, repl),
                             out_shardings=repl)
        else:
            jitted = jax.jit(eval_fn)
        return lambda state, batch, rng: jitted(state, self.frozen, batch, rng)
