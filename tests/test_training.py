"""Training-engine tests: loss decreases on the synthetic fill50k workload; the train
step compiles and runs sharded over an 8-device CPU mesh; checkpoint round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllora_tpu.config import ControlLoRAConfig
from controllora_tpu.data import Fill50kSynthetic
from controllora_tpu.data.registry import DatasetBase, batch_iterator
from controllora_tpu.models.control_lora import ControlLoRA
from controllora_tpu.models.unet import (
    UNet2DConditionModel,
    UNetConfig,
    derive_cross_attention_dims,
)
from controllora_tpu.parallel import make_mesh, replicate, shard_batch
from controllora_tpu.training.trainer import ControlLoRATrainer, TrainState, make_optimizer

TINY_UNET = UNetConfig(
    block_out_channels=(32, 64, 96, 96), layers_per_block=1, attention_head_dim=4
)
TINY_CONTROL = ControlLoRAConfig(
    block_out_channels=(8, 16, 16, 32),
    lora_block_in_channels=(32, 32, 32, 32),
    lora_block_out_channels=(32, 64, 96, 96),
    lora_cross_attention_dims=derive_cross_attention_dims(TINY_UNET),
)


def make_tiny_trainer(mesh=None, lr=1e-3, optimizer=None):
    unet = UNet2DConditionModel(TINY_UNET)
    unet_params = unet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, 8, 4)),
        jnp.array([1]),
        jnp.zeros((1, 77, 768)),
    )["params"]
    cl = ControlLoRA(TINY_CONTROL)
    return ControlLoRATrainer(
        control_lora=cl,
        unet=unet,
        frozen={"unet": unet_params},
        optimizer=optimizer or make_optimizer(learning_rate=lr),
        mesh=mesh,
        remat_unet=False,
    )


def make_batch(n, key=0):
    """Pre-encoded batch: latents + text context directly (VAE/CLIP covered elsewhere)."""
    k = jax.random.PRNGKey(key)
    k1, k2, k3 = jax.random.split(k, 3)
    return {
        "latents": jax.random.normal(k1, (n, 8, 8, 4)) * 0.5,
        "guide_values": jnp.tile(
            jax.random.normal(k2, (1, 64, 64, 3)) * 0.5, (n, 1, 1, 1)
        ),
        "encoder_hidden_states": jax.random.normal(k3, (n, 77, 768)) * 0.02,
    }


def test_train_step_decreases_loss():
    trainer = make_tiny_trainer(lr=2e-3)
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=64)
    step = trainer.make_train_step()
    batch = make_batch(2)
    rng = jax.random.PRNGKey(42)
    losses = []
    for i in range(25):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 25
    # same batch + same rng fold pattern: adapter must fit the noise residual
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.98, losses
    assert all(np.isfinite(losses))


def test_adapter_compute_bf16_trains_and_tracks_fp32():
    """--adapter_compute_bf16: bf16 adapter compute over fp32 masters must still
    learn (loss decreases), keep masters + optimizer state fp32, and track the
    fp32-compute trajectory closely over a few steps (one bf16 rounding per
    matmul per step, not divergence)."""
    batch = make_batch(2)
    rng = jax.random.PRNGKey(42)

    def run(adapter_compute_dtype, n=12):
        trainer = make_tiny_trainer(lr=2e-3)
        trainer.adapter_compute_dtype = adapter_compute_dtype
        state = trainer.init_state(jax.random.PRNGKey(0), image_size=64)
        step = trainer.make_train_step()
        losses = []
        for _ in range(n):
            state, metrics = step(state, batch, rng)
            losses.append(float(metrics["loss"]))
        return state, losses

    state_bf16, losses_bf16 = run(jnp.bfloat16)
    _, losses_fp32 = run(None)
    assert np.mean(losses_bf16[-3:]) < np.mean(losses_bf16[:3]) * 0.99, losses_bf16
    # master params and moments stay fp32 — only the threaded compute is cast
    assert all(l.dtype == jnp.float32
               for l in jax.tree.leaves(state_bf16.params))
    assert all(l.dtype == jnp.float32
               for l in jax.tree.leaves(state_bf16.opt_state)
               if jnp.issubdtype(l.dtype, jnp.floating))
    np.testing.assert_allclose(losses_bf16, losses_fp32, rtol=0.05)


def test_train_step_sharded_8dev():
    """Data-parallel over the virtual 8-device CPU mesh (SURVEY.md §4 test strategy)."""
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    trainer = make_tiny_trainer(mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=64)
    state = replicate(state, mesh)
    trainer.frozen = replicate(trainer.frozen, mesh)
    step = trainer.make_train_step()
    batch = shard_batch(make_batch(8), mesh)
    rng = replicate(jax.random.PRNGKey(1), mesh)
    state, metrics = step(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    # replicated output state matches an unsharded run's structure
    assert int(state.step) == 1


def test_sharded_matches_single_device():
    """The mesh all-reduce must produce the same update as a single-device run on the
    concatenated batch (up to fp tolerance)."""
    mesh = make_mesh()
    t1 = make_tiny_trainer(mesh=None)
    t2 = make_tiny_trainer(mesh=mesh)
    s1 = t1.init_state(jax.random.PRNGKey(0), image_size=64)
    s2 = jax.tree.map(lambda x: x.copy(), s1)
    s2 = replicate(s2, mesh)
    t2.frozen = replicate(t2.frozen, mesh)
    batch = make_batch(8)
    rng = jax.random.PRNGKey(7)
    s1, m1 = t1.make_train_step()(s1, batch, rng)
    s2, m2 = t2.make_train_step()(s2, shard_batch(batch, mesh), replicate(rng, mesh))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    l1 = jax.tree.leaves(s1.params)
    l2 = jax.tree.leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_grad_accumulation():
    trainer = make_tiny_trainer()
    trainer.optimizer = make_optimizer(learning_rate=1e-3, grad_accumulation_steps=2)
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=64)
    step = trainer.make_train_step()
    batch = make_batch(2)
    rng = jax.random.PRNGKey(3)
    p0 = jax.tree.leaves(state.params)[5].copy()
    state, _ = step(state, batch, rng)
    p1 = jax.tree.leaves(state.params)[5]
    # first micro-step: no update applied yet
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1))
    state, _ = step(state, batch, rng)
    assert int(state.step) == 2


def test_checkpoint_roundtrip(tmp_path):
    from controllora_tpu.training.checkpoint import (
        restore_train_state,
        save_train_state,
        save_control_lora,
        load_control_lora,
    )

    trainer = make_tiny_trainer()
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=64)
    step = trainer.make_train_step()
    state, _ = step(state, make_batch(2), jax.random.PRNGKey(0))

    out = str(tmp_path / "run")
    save_train_state(out, int(state.step), state)
    restored, at = restore_train_state(out, state)
    assert at == 1
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # missing checkpoint degrades to fresh start (reference train:723-727)
    none_state, at0 = restore_train_state(str(tmp_path / "empty"), state)
    assert none_state is None and at0 == 0

    # final artifact save/load
    art = str(tmp_path / "artifact")
    save_control_lora(art, state.params, TINY_CONTROL, formats=("safetensors",))
    params2, cfg2 = load_control_lora(art)
    assert cfg2 == TINY_CONTROL
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_async_checkpoint_roundtrip(tmp_path):
    """Async (non-blocking) orbax saves commit atomically: finalize + restore
    yields the exact state, and pruning never eats the in-flight save."""
    from controllora_tpu.training.checkpoint import (
        finalize_checkpoints,
        restore_train_state,
        save_train_state,
    )

    trainer = make_tiny_trainer()
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=64)
    step = trainer.make_train_step()
    out = str(tmp_path / "run")
    for i in range(3):
        state, _ = step(state, make_batch(2), jax.random.PRNGKey(i))
        save_train_state(out, int(state.step), jax.device_get(state), keep=2,
                         wait=False)
    finalize_checkpoints()
    restored, at = restore_train_state(out, state)
    assert at == 3
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    import os

    kept = sorted(d for d in os.listdir(out) if d.startswith("checkpoint-"))
    assert "checkpoint-3" in kept and len(kept) <= 3


def test_mesh_resize_resume(tmp_path):
    """Elastic restart: a checkpoint saved from an 8-device data-parallel run must
    restore onto a DIFFERENT topology (4-device mesh, single device) and continue
    bit-identically on the same global batch — dp keeps params replicated, so the
    orbax state is topology-free, and the data stream keys off global step +
    global batch, never the device count. Beyond-reference: torch DDP resume
    assumes an unchanged world size for step↔data reproducibility.

    SGD, not Adam: the comparand is params after a continued step, and Adam
    normalizes the update to ±lr — a near-zero gradient element whose SIGN flips
    under the topology-dependent psum reassociation flips its whole update
    (same reasoning as __graft_entry__'s grad-level dp check). SGD is linear in
    the gradient, so cross-topology drift stays at fp-reassociation scale."""
    import optax

    from controllora_tpu.training.checkpoint import (
        restore_train_state,
        save_train_state,
    )

    sgd = lambda: optax.sgd(1e-3)
    mesh8 = make_mesh()
    t8 = make_tiny_trainer(mesh=mesh8, optimizer=sgd())
    state = replicate(t8.init_state(jax.random.PRNGKey(0), image_size=64), mesh8)
    t8.frozen = replicate(t8.frozen, mesh8)
    step8 = t8.make_train_step()
    state, _ = step8(state, shard_batch(make_batch(8), mesh8),
                     replicate(jax.random.PRNGKey(1), mesh8))
    out = str(tmp_path / "run")
    save_train_state(out, int(state.step), jax.device_get(state))

    # ground truth: one more step on the original 8-device topology
    state, _ = step8(state, shard_batch(make_batch(8, key=9), mesh8),
                     replicate(jax.random.PRNGKey(2), mesh8))
    truth = jax.tree.leaves(jax.device_get(state).params)

    def continue_on(mesh):
        t = make_tiny_trainer(mesh=mesh, optimizer=sgd())
        target = jax.device_get(t.init_state(jax.random.PRNGKey(0), image_size=64))
        restored, at = restore_train_state(out, target)
        assert at == 1
        b, rng = make_batch(8, key=9), jax.random.PRNGKey(2)
        if mesh is not None:
            restored = replicate(restored, mesh)
            t.frozen = replicate(t.frozen, mesh)
            b, rng = shard_batch(b, mesh), replicate(rng, mesh)
        s, _ = t.make_train_step()(restored, b, rng)
        return jax.tree.leaves(jax.device_get(s).params)

    for resized in (continue_on(make_mesh(devices=jax.devices()[:4])),
                    continue_on(None)):
        for a, b in zip(truth, resized):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_eval_step():
    trainer = make_tiny_trainer()
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=64)
    eval_fn = trainer.make_eval_step()
    loss = eval_fn(state, make_batch(2), jax.random.PRNGKey(5))
    assert np.isfinite(float(loss))


def test_dreambooth_prior_preservation():
    """Chunked dual loss: instance ‖ class halves (reference
    train_dreambooth_lora.py:898-910)."""
    from controllora_tpu.training.dreambooth import DreamBoothLoRATrainer

    unet = UNet2DConditionModel(TINY_UNET)
    unet_params = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.array([1]),
        jnp.zeros((1, 77, 768)),
    )["params"]
    trainer = DreamBoothLoRATrainer(
        unet=unet, frozen={"unet": unet_params}, rank=2,
        optimizer=make_optimizer(learning_rate=1e-3),
        with_prior_preservation=True, prior_loss_weight=0.7, remat_unet=False,
    )
    state = trainer.init_state(jax.random.PRNGKey(1))
    step = trainer.make_train_step()
    # batch = instance(2) ‖ class(2)
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(2), (4, 8, 8, 4)) * 0.4,
        "encoder_hidden_states": jax.random.normal(
            jax.random.PRNGKey(3), (4, 77, 768)) * 0.02,
    }
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(7))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # fixed-noise overfit decreases


def test_fill50k_synthetic():
    ds = Fill50kSynthetic(resolution=64, size=100, seed=1)
    assert len(ds) == 100
    it = ds[3]
    assert it["pixel_values"].shape == (64, 64, 3)
    assert it["guide_values"].shape == (64, 64, 3)
    assert it["input_ids"].shape == (77,)
    assert it["pixel_values"].min() >= -1 and it["pixel_values"].max() <= 1
    # guide is a sparse ring: mostly background
    ring_frac = (it["guide_values"] > 0).mean()
    assert 0 < ring_frac < 0.2
    # deterministic per index
    np.testing.assert_allclose(ds[3]["pixel_values"], it["pixel_values"])
    # registry resolution
    assert DatasetBase.from_name("process/fill50k") is Fill50kSynthetic

    batches = batch_iterator(ds, 4, epochs=1)
    b = next(batches)
    assert b["pixel_values"].shape == (4, 64, 64, 3)
    assert b["input_ids"].dtype == np.int32


def test_lr_schedules_reference_surface():
    """make_lr_schedule covers the diffusers get_scheduler names the reference
    exposes (train_dreambooth_lora.py:291-308, :790-796): warmup ramps, hard
    cosine restarts, and the polynomial 1e-7 floor."""
    from controllora_tpu.training.trainer import make_lr_schedule

    lr = 1e-3
    s = make_lr_schedule(lr, "constant_with_warmup", warmup_steps=10, total_steps=100)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(5)), lr / 2, rtol=1e-6)
    np.testing.assert_allclose(float(s(10)), lr, rtol=1e-6)
    np.testing.assert_allclose(float(s(99)), lr, rtol=1e-6)

    # two hard restarts: decays to ~0 at each segment end, snaps back to peak
    s = make_lr_schedule(lr, "cosine_with_restarts", total_steps=100, num_cycles=2)
    np.testing.assert_allclose(float(s(0)), lr, rtol=1e-6)
    assert float(s(49)) < 0.01 * lr
    np.testing.assert_allclose(float(s(50)), lr, rtol=1e-6)
    assert float(s(99)) < 0.01 * lr

    # polynomial: power-law decay onto the diffusers lr_end floor (1e-7)
    s = make_lr_schedule(lr, "polynomial", total_steps=100, power=2.0)
    np.testing.assert_allclose(float(s(0)), lr, rtol=1e-6)
    np.testing.assert_allclose(float(s(50)), (lr - 1e-7) * 0.25 + 1e-7, rtol=1e-5)
    np.testing.assert_allclose(float(s(100)), 1e-7, rtol=1e-5)

    # linear with warmup: peak at warmup end, 0 at total
    s = make_lr_schedule(lr, "linear", warmup_steps=10, total_steps=100)
    np.testing.assert_allclose(float(s(10)), lr, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), 0.0, atol=1e-12)

    with pytest.raises(ValueError):
        make_lr_schedule(lr, "nope")
