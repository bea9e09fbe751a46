"""8-bit Adam (training/adam8bit.py) — the reference capability at
train_text_to_image_control_lora.py:500-508 (bitsandbytes AdamW8bit)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from controllora_tpu.training.adam8bit import (
    QMoment,
    _dequantize,
    _quantize,
    adamw8bit,
    scale_by_adam8bit,
)
from controllora_tpu.training.trainer import make_optimizer


def test_quantize_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1000,)).astype(np.float32))
    q = _quantize(x)
    assert q.q.dtype == jnp.int8
    back = _dequantize(q, x.shape)
    # sqrt-power int8 map: worst-case half-level error ~= absmax/127 (at full scale)
    err = np.abs(np.asarray(back - x))
    assert err.max() <= float(jnp.abs(x).max()) / 126.0 + 1e-7
    # small entries in a block dominated by a large one must NOT collapse to zero
    # (the linear-absmax failure mode): 1%-of-absmax survives with <20% rel error
    mixed = jnp.concatenate([jnp.ones((1,)), jnp.full((255,), 0.01)])
    back2 = np.asarray(_dequantize(_quantize(mixed), mixed.shape))
    rel = np.abs(back2[1:] - 0.01) / 0.01
    assert rel.max() < 0.2


def test_small_leaves_stay_fp32():
    params = {"big": jnp.zeros((8192,)), "bias": jnp.zeros((16,))}
    state = scale_by_adam8bit().init(params)
    assert isinstance(state.mu["big"], QMoment)
    assert not isinstance(state.mu["bias"], QMoment)
    assert state.mu["bias"].dtype == jnp.float32


def test_tracks_fp32_adam_on_quadratic():
    """100 steps on a quadratic: 8-bit trajectory stays near fp32 Adam's."""
    target = jnp.asarray(np.random.default_rng(1).normal(size=(4096,)), jnp.float32)

    def loss(p):
        return jnp.mean((p["w"] - target) ** 2)

    results = {}
    for name, tx in [
        ("fp32", optax.adam(1e-1)),
        ("int8", optax.chain(scale_by_adam8bit(), optax.scale_by_learning_rate(1e-1))),
    ]:
        p = {"w": jnp.zeros((4096,), jnp.float32)}
        st = tx.init(p)

        @jax.jit
        def step(p, st, tx=tx):
            g = jax.grad(loss)(p)
            u, st = tx.update(g, st, p)
            return optax.apply_updates(p, u), st

        for _ in range(100):
            p, st = step(p, st)
        results[name] = p["w"]

    l_fp32 = float(loss({"w": results["fp32"]}))
    l_int8 = float(loss({"w": results["int8"]}))
    assert l_int8 < 0.25 * float(jnp.mean(target**2)), "8-bit Adam failed to descend"
    assert abs(l_int8 - l_fp32) < 0.1 * float(jnp.mean(target**2))
    assert float(jnp.max(jnp.abs(results["int8"] - results["fp32"]))) < 0.35


def test_adamw8bit_decays_weights():
    p = {"w": jnp.full((4096,), 5.0)}
    tx = adamw8bit(1e-2, weight_decay=1e-1)
    st = tx.init(p)
    u, st = tx.update({"w": jnp.zeros((4096,))}, st, p)
    # zero grads: the only update is -lr * wd * w < 0
    assert float(u["w"][0]) < 0.0


def test_make_optimizer_8bit_flag_trains_jitted():
    tx = make_optimizer(learning_rate=1e-2, use_8bit=True)
    p = {"w": jnp.ones((4096,))}
    st = tx.init(p)

    @jax.jit
    def step(p, st):
        g = jax.grad(lambda q: jnp.sum(q["w"] ** 2))(p)
        u, st = tx.update(g, st, p)
        return optax.apply_updates(p, u), st

    for _ in range(3):
        p, st = step(p, st)
    assert float(jnp.sum(p["w"] ** 2)) < 4096.0


def test_state_memory_is_compressed():
    n = 1 << 16
    params = {"w": jnp.zeros((n,), jnp.float32)}
    st = scale_by_adam8bit().init(params)
    q_bytes = st.mu["w"].q.size + st.mu["w"].scale.size * 4
    assert q_bytes < 0.3 * (n * 4)
