"""DreamBooth-LoRA trainer: plain per-layer LoRA fine-tune of the frozen UNet.

Capability-parity target: reference train_dreambooth_lora.py (SURVEY.md §3.4) — one
rank-r LoRA per attention layer (:706-722), diffusion MSE on instance images, optional
prior preservation with a chunked dual loss (:898-910). Same pjit/mesh/bf16 economics as
the ControlLoRA trainer.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from controllora_tpu.models.lora import AttnAdapter, make_plain_lora_adapters
from controllora_tpu.schedulers import DDPMScheduler
from controllora_tpu.training.conditioning import resolve_text_conditioning
from controllora_tpu.training.trainer import TrainState, make_optimizer


class DreamBoothLoRATrainer:
    def __init__(
        self,
        unet,
        frozen: Dict[str, Any],
        vae=None,
        text_encoder=None,
        rank: int = 4,
        scheduler: Optional[DDPMScheduler] = None,
        optimizer: Optional[optax.GradientTransformation] = None,
        mesh=None,
        prior_loss_weight: float = 1.0,
        with_prior_preservation: bool = False,
        remat_unet: bool = True,
    ):
        self.unet = unet
        self.vae = vae
        self.text_encoder = text_encoder
        self.frozen = frozen
        self.rank = rank
        self.scheduler = scheduler or DDPMScheduler()
        self.optimizer = optimizer or make_optimizer(learning_rate=1e-4)
        self.mesh = mesh
        self.prior_loss_weight = prior_loss_weight
        self.with_prior_preservation = with_prior_preservation
        self.remat_unet = remat_unet

    # params here = {proc_name: lora params tree}; specs are rebuilt statically
    def init_state(self, rng: jax.Array) -> TrainState:
        adapters = make_plain_lora_adapters(rng, self.rank, self.unet.config)
        self._specs = {k: v.spec for k, v in adapters.items()}
        params = {k: v.params for k, v in adapters.items()}
        opt_state = self.optimizer.init(params)
        return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state)

    def _adapters_from(self, params):
        from controllora_tpu.models.lora import AdapterStack

        return {
            k: AdapterStack(main=AttnAdapter(params=p, spec=self._specs[k]))
            for k, p in params.items()
        }

    def _loss_fn(self, params, frozen, batch, rng):
        # `frozen` threaded as a jit argument (closure capture = multi-GB HLO consts)
        sch = self.scheduler
        rng_sample, rng_noise, rng_t = jax.random.split(rng, 3)
        if "latents" in batch:
            latents = batch["latents"]
        else:
            latents = self.vae.apply(
                {"params": frozen["vae"]}, batch["pixel_values"], rng_sample,
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

        adapters = self._adapters_from(params)
        unet_apply = self.unet.apply
        if self.remat_unet:
            unet_apply = jax.checkpoint(
                self.unet.apply, policy=jax.checkpoint_policies.nothing_saveable
            )
        pred = unet_apply({"params": frozen["unet"]}, noisy, t, ctx, adapters,
                          **added_kwargs)
        target = sch.training_target(latents, noise, t)

        if self.with_prior_preservation:
            # instance ‖ class halves (reference train_dreambooth_lora.py:898-910)
            pred_i, pred_c = jnp.split(pred, 2, axis=0)
            tgt_i, tgt_c = jnp.split(target, 2, axis=0)
            loss = jnp.mean((pred_i.astype(jnp.float32) - tgt_i) ** 2)
            prior = jnp.mean((pred_c.astype(jnp.float32) - tgt_c) ** 2)
            return loss + self.prior_loss_weight * prior
        return jnp.mean((pred.astype(jnp.float32) - target) ** 2)

    def make_train_step(self) -> Callable:
        def step_fn(state: TrainState, frozen, batch, rng) -> Tuple[TrainState, Dict[str, Any]]:
            loss, grads = jax.value_and_grad(self._loss_fn)(
                state.params, frozen, batch, rng
            )
            updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                TrainState(step=state.step + 1, params=params, opt_state=opt_state),
                {"loss": loss, "grad_norm": optax.global_norm(grads)},
            )

        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            data = NamedSharding(self.mesh, P("data"))
            jitted = jax.jit(step_fn, in_shardings=(repl, repl, data, repl),
                             out_shardings=(repl, repl), donate_argnums=(0,))
        else:
            jitted = jax.jit(step_fn, donate_argnums=(0,))
        return lambda state, batch, rng: jitted(state, self.frozen, batch, rng)
