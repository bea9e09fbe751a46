"""Unit tests for the pure adapter math (models/lora.py) against hand-computed numpy
references of the formulas in reference models.py:118-152 (plain), :222-287 (v1),
:357-431 (v2)."""

import jax
import jax.numpy as jnp
import numpy as np

from controllora_tpu.models.lora import (
    AdapterSpec,
    AdapterStack,
    AttnAdapter,
    adapt_key,
    adapt_output,
    adapt_query,
    adapt_value,
    adapt_hidden_pre_q,
    adapt_hidden_post_attn,
    init_adapter_params,
    init_lora_params,
    lora_apply,
    process_control_states,
)

RNG = jax.random.PRNGKey(0)


def rand_lora(rng, i, o, r=4):
    k1, k2 = jax.random.split(rng)
    return {
        "down": jax.random.normal(k1, (i, r)) * 0.3,
        "up": jax.random.normal(k2, (r, o)) * 0.3,
    }


def np_lora(p, x):
    return np.asarray(x) @ np.asarray(p["down"]) @ np.asarray(p["up"])


def test_lora_apply_matches_matmul():
    p = rand_lora(RNG, 8, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 8))
    np.testing.assert_allclose(np.asarray(lora_apply(p, x)), np_lora(p, x), rtol=1e-5)


def test_fresh_adapter_is_identity_perturbation():
    p = init_lora_params(RNG, 16, 16, 4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16))
    assert np.abs(np.asarray(lora_apply(p, x))).max() == 0.0


def test_plain_lora_query_pre_and_post_add():
    h = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 8))
    q = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 8))
    p = {"to_q": rand_lora(RNG, 8, 8)}
    scale = 0.7

    pre = AdapterStack(main=AttnAdapter(params=p, spec=AdapterSpec(kind="lora")))
    got = adapt_query(pre, q, h, scale)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(q) + scale * np_lora(p["to_q"], h), rtol=1e-5
    )

    post = AdapterStack(
        main=AttnAdapter(params=p, spec=AdapterSpec(kind="lora", post_add=True))
    )
    got = adapt_query(post, q, h, scale)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(q) + scale * np_lora(p["to_q"], q), rtol=1e-5
    )


def test_control_v1_query_math():
    """q += s * to_q_lora(h + process_control(h)) with self-add control
    (reference models.py:237-238, 201-220)."""
    B, L, H, C = 2, 6, 8, 12
    h = jax.random.normal(jax.random.PRNGKey(1), (B, L, H))
    q = jnp.zeros((B, L, H))
    c = jax.random.normal(jax.random.PRNGKey(2), (B, L, C))
    params = {
        "to_q": rand_lora(jax.random.PRNGKey(3), H, H),
        "to_control": rand_lora(jax.random.PRNGKey(4), C, H),
    }
    spec = AdapterSpec(kind="control_v1", control_self_add=False)
    a = AttnAdapter(params=params, control=c, spec=spec)
    got = adapt_query(AdapterStack(main=a), q, h, 1.0)
    ctrl = np_lora(params["to_control"], c)
    expect = np_lora(params["to_q"], np.asarray(h) + ctrl)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4)


def test_control_v1_self_add_requires_matching_channels():
    """control_self_add adds raw control to the projection (reference models.py:215-218)."""
    B, L, H = 1, 4, 8
    h = jnp.zeros((B, L, H))
    c = jax.random.normal(jax.random.PRNGKey(2), (B, L, H))
    params = {"to_control": rand_lora(jax.random.PRNGKey(4), H, H)}
    a = AttnAdapter(
        params=params, control=c, spec=AdapterSpec(kind="control_v1", control_self_add=True)
    )
    got = process_control_states(a, h, 1.0)
    expect = np.asarray(c) + np_lora(params["to_control"], c)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4)


def test_concat_hidden_cfg_batch_tile():
    """Control batch B broadcast to hidden batch 2B by TILING — a deliberate
    deviation from the reference's repeat-interleave (models.py:209-212), which
    only ever runs control batch 1 where the two agree. Under this pipeline's
    block CFG layout [u1..un ‖ c1..cn], tiling pairs guide i with hidden rows
    i and B+i; interleave would misalign every sample but the first (see
    tests/test_batch_serving.py::test_control_batch_tiles_not_interleaves)."""
    B, L, H, C = 2, 4, 8, 6
    h = jax.random.normal(jax.random.PRNGKey(1), (2 * B, L, H))
    c = jax.random.normal(jax.random.PRNGKey(2), (B, L, C))
    params = {"to_control": rand_lora(jax.random.PRNGKey(4), H + C, H)}
    spec = AdapterSpec(kind="control_v1", concat_hidden=True, control_self_add=False)
    a = AttnAdapter(params=params, control=c, spec=spec)
    got = process_control_states(a, h, 1.0)
    c_rep = np.tile(np.asarray(c), (2, 1, 1))
    expect = np_lora(params["to_control"], np.concatenate([np.asarray(h), c_rep], -1))
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4)


def test_value_chain_scale_quirk():
    """Pre/post value LoRAs are applied WITHOUT scale; main WITH scale
    (reference models.py:257-265)."""
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 8))
    v = jnp.zeros((1, 3, 8))
    p_pre = {"to_v": rand_lora(jax.random.PRNGKey(2), 8, 8)}
    p_main = {"to_v": rand_lora(jax.random.PRNGKey(3), 8, 8)}
    stack = AdapterStack(
        main=AttnAdapter(params=p_main, spec=AdapterSpec(kind="lora")),
        pre=(AttnAdapter(params=p_pre, spec=AdapterSpec(kind="lora")),),
    )
    scale = 0.5
    got = adapt_value(stack, v, ctx, scale)
    expect = np_lora(p_pre["to_v"], ctx) + scale * np_lora(p_main["to_v"], ctx)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4)


def test_key_skip_flags():
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 8))
    k = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 8))
    p = {"to_k": rand_lora(jax.random.PRNGKey(2), 8, 8)}
    skipped = AdapterStack(
        main=AttnAdapter(params=p, spec=AdapterSpec(kind="lora", key_skipped=True))
    )
    np.testing.assert_allclose(np.asarray(adapt_key(skipped, k, ctx, 1.0)), np.asarray(k))


def test_v2_hidden_residuals():
    """v2 adds control to hidden pre-q and post-attention with separate projections
    (reference models.py:366-372, 412-418)."""
    B, L, H, C = 1, 4, 8, 6
    h = jax.random.normal(jax.random.PRNGKey(1), (B, L, H))
    c = jax.random.normal(jax.random.PRNGKey(2), (B, L, C))
    params = {
        "to_control": rand_lora(jax.random.PRNGKey(3), H + C, H),
        "to_control_out": rand_lora(jax.random.PRNGKey(4), H + C, H),
    }
    spec = AdapterSpec(
        kind="control_v2",
        concat_hidden=True,
        control_self_add=False,
        key_skipped=True,
        value_skipped=True,
    )
    stack = AdapterStack(main=AttnAdapter(params=params, control=c, spec=spec))

    got_pre = adapt_hidden_pre_q(stack, h, 1.0)
    cat = np.concatenate([np.asarray(h), np.asarray(c)], -1)
    np.testing.assert_allclose(
        np.asarray(got_pre), np.asarray(h) + np_lora(params["to_control"], cat), rtol=1e-4
    )

    got_post = adapt_hidden_post_attn(stack, h, 1.0)
    np.testing.assert_allclose(
        np.asarray(got_post),
        np.asarray(h) + np_lora(params["to_control_out"], cat),
        rtol=1e-4,
    )


def test_output_chain_main_control_unconditional():
    """Main control adapter's out-LoRA applies even with output_skipped
    (reference models.py:279); plain-lora main honors the flag (:146-147)."""
    attn_h = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 8))
    out = jnp.zeros((1, 3, 8))
    p = {"to_out": rand_lora(jax.random.PRNGKey(2), 8, 8)}

    ctl = AdapterStack(
        main=AttnAdapter(
            params=p,
            control=jnp.zeros((1, 3, 8)),
            spec=AdapterSpec(kind="control_v1", output_skipped=True),
        )
    )
    got = adapt_output(ctl, out, attn_h, 1.0)
    np.testing.assert_allclose(np.asarray(got), np_lora(p["to_out"], attn_h), rtol=1e-4)

    plain = AdapterStack(
        main=AttnAdapter(params=p, spec=AdapterSpec(kind="lora", output_skipped=True))
    )
    np.testing.assert_allclose(np.asarray(adapt_output(plain, out, attn_h, 1.0)), 0.0)


def test_control_adapter_in_pre_chain():
    """A ControlLoRA processor can itself sit in a pre-chain: its control term is
    folded into the pre-LoRA's q input (reference models.py:232-236)."""
    B, L, H, C = 1, 4, 8, 6
    h = jax.random.normal(jax.random.PRNGKey(1), (B, L, H))
    q = jnp.zeros((B, L, H))
    c = jax.random.normal(jax.random.PRNGKey(2), (B, L, C))
    pre_params = {
        "to_q": rand_lora(jax.random.PRNGKey(3), H, H),
        "to_control": rand_lora(jax.random.PRNGKey(4), C, H),
    }
    main_params = {
        "to_q": rand_lora(jax.random.PRNGKey(5), H, H),
        "to_control": rand_lora(jax.random.PRNGKey(6), C, H),
    }
    spec = AdapterSpec(kind="control_v1", control_self_add=False)
    pre = AttnAdapter(params=pre_params, control=c, spec=spec)
    main = AttnAdapter(params=main_params, control=c, spec=spec)
    got = adapt_query(AdapterStack(main=main, pre=(pre,)), q, h, 1.0)

    ctrl_pre = np_lora(pre_params["to_control"], c)
    q1 = np_lora(pre_params["to_q"], np.asarray(h) + ctrl_pre)
    ctrl_main = np_lora(main_params["to_control"], c)
    expect = q1 + np_lora(main_params["to_q"], np.asarray(h) + ctrl_main)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4)


def test_init_adapter_params_structure():
    spec_v1 = AdapterSpec(kind="control_v1", concat_hidden=True)
    p = init_adapter_params(RNG, 320, 768, 4, spec_v1, control_rank=8, control_channels=256)
    assert set(p) == {"to_q", "to_k", "to_v", "to_out", "to_control"}
    assert p["to_k"]["down"].shape == (768, 4)
    assert p["to_control"]["down"].shape == (256 + 320, 8)

    spec_v2 = AdapterSpec(
        kind="control_v2", concat_hidden=True, key_skipped=True, value_skipped=True
    )
    p2 = init_adapter_params(RNG, 320, 768, 4, spec_v2, control_channels=256)
    assert set(p2) == {"to_q", "to_out", "to_control", "to_control_out"}
