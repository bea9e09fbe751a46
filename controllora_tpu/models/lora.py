"""LoRA and ControlLoRA attention-adapter math as pure functions.

This replaces the reference's stateful attention processors
(LoRACrossAttnProcessor / ControlLoRACrossAttnProcessor[V2], reference models.py:72-431)
with an explicit, jit-friendly representation:

  * adapter parameters are plain pytrees (dicts of {down, up} factor pairs),
  * control features are *threaded as arguments* instead of being injected into module
    state (reference models.py:198-199 `inject_control_states`),
  * an attention layer receives an `AdapterStack` = (pre, main, post) tuple mirroring
    the reference's `pre_loras` / self / `post_loras` chain protocol
    (reference models.py:192-196, mix_lora_and_control_lora.py:114-121).

Behavioral quirks of the reference preserved deliberately (documented for parity):
  * pre/post-chain value LoRAs are applied WITHOUT the `scale` factor
    (reference models.py:260, 265 — only the main adapter's to_v_lora is scaled),
  * the main control adapter's to_out_lora is applied unconditionally in the v1/v2
    control processors (reference models.py:279, 423 — the skip flag only controls
    whether the parameters exist),
  * CFG batch mismatch between control (B) and hidden (2B) is resolved by TILING
    the control batch to the hidden batch (see _match_batch: identical to the
    reference's repeat-interleave at models.py:209-212 for the only shape the
    reference ever runs, control batch 1, and correct — unlike interleave — for
    per-image control batches under the block [uncond ‖ cond] CFG layout);
    batch-1 control otherwise rides numpy-style broadcasting.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


# ---------------------------------------------------------------------------- params


def init_lora_params(rng: jax.Array, in_dim: int, out_dim: int, rank: int) -> Dict[str, Any]:
    """LoRA factor pair. Matches diffusers LoRALinearLayer init: down ~ N(0, 1/rank),
    up = 0 so a fresh adapter is the identity perturbation."""
    down = jax.random.normal(rng, (in_dim, rank), dtype=jnp.float32) / rank
    up = jnp.zeros((rank, out_dim), dtype=jnp.float32)
    return {"down": down, "up": up}


def lora_apply(p: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    """x @ down @ up, computed in the params' dtype (fp32 adapters over bf16 activations)."""
    dt = p["down"].dtype
    y = jnp.dot(x.astype(dt), p["down"], preferred_element_type=dt)
    return jnp.dot(y, p["up"], preferred_element_type=dt).astype(x.dtype)


# ---------------------------------------------------------------------------- specs


@struct.dataclass
class AdapterSpec:
    """Static flags of one attention adapter (the reference's processor constructor
    arguments, models.py:72-101, 155-188, 292-323)."""

    kind: str = struct.field(pytree_node=False, default="lora")  # lora|control_v1|control_v2
    post_add: bool = struct.field(pytree_node=False, default=False)
    concat_hidden: bool = struct.field(pytree_node=False, default=False)
    control_self_add: bool = struct.field(pytree_node=False, default=True)
    key_skipped: bool = struct.field(pytree_node=False, default=False)
    value_skipped: bool = struct.field(pytree_node=False, default=False)
    output_skipped: bool = struct.field(pytree_node=False, default=False)

    @property
    def is_control(self) -> bool:
        return self.kind in ("control_v1", "control_v2")


@struct.dataclass
class AttnAdapter:
    """One adapter: params pytree + (for control adapters) its control feature map."""

    params: Any
    control: Optional[jnp.ndarray] = None  # (Bc, L, Cc) flattened NLC control states
    spec: AdapterSpec = struct.field(pytree_node=False, default_factory=AdapterSpec)


@struct.dataclass
class AdapterStack:
    """The full adapter chain installed on one attention layer."""

    main: Optional[AttnAdapter] = None
    pre: Tuple[AttnAdapter, ...] = ()
    post: Tuple[AttnAdapter, ...] = ()

    def all_adapters(self):
        return (*self.pre, *((self.main,) if self.main is not None else ()), *self.post)


# ---------------------------------------------------------------------------- control math


def _match_batch(c: jnp.ndarray, b: int) -> jnp.ndarray:
    """Tile the control batch to the hidden batch (CFG uncond‖cond doubling).

    The reference repeat-interleaves here (models.py:209-212), but only ever runs
    control batch 1 — where interleave and tile are the same array. For per-image
    control batches (beyond-reference batch serving), this pipeline's CFG layout is
    the block concat [u1..un ‖ c1..cn] (diffusers convention), so guide i must pair
    with hidden rows i and n+i — i.e. TILE; the reference's interleave would
    misalign every sample but the first."""
    if c.shape[0] != b:
        rep = b // c.shape[0]
        c = jnp.tile(c, (rep,) + (1,) * (c.ndim - 1))
    return c


def process_control_states(
    adapter: AttnAdapter, hidden: jnp.ndarray, scale, which: str = "to_control"
) -> jnp.ndarray:
    """The reference's `process_control_states` (models.py:201-220, 336-355) as a pure fn.

    hidden: (B, L, H); adapter.control: (Bc, L, Cc). Returns the control residual term.
    """
    spec = adapter.spec
    c = adapter.control.astype(hidden.dtype)
    if c.shape[0] not in (1, hidden.shape[0]):
        # per-image control batch n under the CFG 2n hidden batch: align by tiling
        # (batch-1 control instead rides numpy broadcasting on the cheap path)
        c = _match_batch(c, hidden.shape[0])
    x = c
    if spec.concat_hidden:
        c = _match_batch(c, hidden.shape[0])
        x = jnp.concatenate([hidden, c], axis=-1)
    proj = scale * lora_apply(adapter.params[which], x)
    if spec.control_self_add:
        return c + proj
    return proj


# ---------------------------------------------------------------------------- chains
# Each helper folds the (pre, main, post) chain for one projection, faithfully
# reproducing the reference's ordering and flag handling.


def adapt_query(stack: AdapterStack, query: jnp.ndarray, hidden: jnp.ndarray, scale):
    """q-projection chain (reference models.py:231-243 for v1; :373-380 for v2)."""

    def chain_side(q, adapters, include_control: bool):
        for a in adapters:
            lora_in = q if a.spec.post_add else hidden
            if include_control and a.spec.kind == "control_v1":
                lora_in = lora_in + process_control_states(a, hidden, scale)
            q = q + scale * lora_apply(a.params["to_q"], lora_in)
        return q

    main = stack.main
    if main is None:
        return chain_side(query, (*stack.pre, *stack.post), True)

    v2 = main.spec.kind == "control_v2"
    query = chain_side(query, stack.pre, not v2)
    if main.spec.kind == "control_v1":
        lora_in = (query if main.spec.post_add else hidden) + process_control_states(
            main, hidden, scale
        )
        query = query + scale * lora_apply(main.params["to_q"], lora_in)
    else:  # plain lora or v2 (whose control was already folded into hidden)
        lora_in = query if main.spec.post_add else hidden
        query = query + scale * lora_apply(main.params["to_q"], lora_in)
    query = chain_side(query, stack.post, not v2)
    return query


def adapt_key(stack: AdapterStack, key: jnp.ndarray, ctx: jnp.ndarray, scale):
    """k-projection chain (reference models.py:248-256)."""
    for a in stack.pre:
        if not a.spec.key_skipped:
            key = key + scale * lora_apply(a.params["to_k"], key if a.spec.post_add else ctx)
    m = stack.main
    if m is not None and not m.spec.key_skipped:
        key = key + scale * lora_apply(m.params["to_k"], key if m.spec.post_add else ctx)
    for a in stack.post:
        if not a.spec.key_skipped:
            key = key + scale * lora_apply(a.params["to_k"], key if a.spec.post_add else ctx)
    return key


def adapt_value(stack: AdapterStack, value: jnp.ndarray, ctx: jnp.ndarray, scale):
    """v-projection chain (reference models.py:257-265). NOTE: the reference omits
    `scale` on pre/post value LoRAs (:260, :265) — preserved for parity."""
    for a in stack.pre:
        if not a.spec.value_skipped:
            value = value + lora_apply(a.params["to_v"], value if a.spec.post_add else ctx)
    m = stack.main
    if m is not None and not m.spec.value_skipped:
        value = value + scale * lora_apply(m.params["to_v"], value if m.spec.post_add else ctx)
    for a in stack.post:
        if not a.spec.value_skipped:
            value = value + lora_apply(a.params["to_v"], value if a.spec.post_add else ctx)
    return value


def adapt_hidden_pre_q(stack: AdapterStack, hidden: jnp.ndarray, scale):
    """v2-only: control residual added to hidden states before q-projection
    (reference models.py:366-372)."""
    for a in stack.pre:
        if a.spec.kind == "control_v2":
            hidden = hidden + process_control_states(a, hidden, scale)
    m = stack.main
    if m is not None and m.spec.kind == "control_v2":
        hidden = hidden + process_control_states(m, hidden, scale)
    for a in stack.post:
        if a.spec.kind == "control_v2":
            hidden = hidden + process_control_states(a, hidden, scale)
    return hidden


def adapt_hidden_post_attn(stack: AdapterStack, hidden: jnp.ndarray, scale):
    """v2-only: second control residual after attention, before the out projection
    (reference models.py:412-418)."""
    for a in stack.pre:
        if a.spec.kind == "control_v2":
            hidden = hidden + process_control_states(a, hidden, scale, "to_control_out")
    m = stack.main
    if m is not None and m.spec.kind == "control_v2":
        hidden = hidden + process_control_states(m, hidden, scale, "to_control_out")
    for a in stack.post:
        if a.spec.kind == "control_v2":
            hidden = hidden + process_control_states(a, hidden, scale, "to_control_out")
    return hidden


def adapt_output(stack: AdapterStack, out: jnp.ndarray, attn_hidden: jnp.ndarray, scale):
    """out-projection chain (reference models.py:275-283). The main *control* adapter's
    out-LoRA is unconditional (:279); plain-LoRA mains honor the skip flag (:146-147)."""
    for a in stack.pre:
        if not a.spec.output_skipped:
            out = out + scale * lora_apply(
                a.params["to_out"], out if a.spec.post_add else attn_hidden
            )
    m = stack.main
    if m is not None and (m.spec.is_control or not m.spec.output_skipped):
        out = out + scale * lora_apply(
            m.params["to_out"], out if m.spec.post_add else attn_hidden
        )
    for a in stack.post:
        if not a.spec.output_skipped:
            out = out + scale * lora_apply(
                a.params["to_out"], out if a.spec.post_add else attn_hidden
            )
    return out


# ---------------------------------------------------------------------------- plain LoRA sets


def make_plain_lora_adapters(
    rng: jax.Array,
    rank: int = 4,
    unet_config=None,
    post_add: bool = False,
) -> Dict[str, "AttnAdapter"]:
    """One plain LoRA adapter per UNet attention layer — the DreamBooth-LoRA model
    (reference train_dreambooth_lora.py:706-722: a LoRACrossAttnProcessor per
    `unet.attn_processors` entry, rank = --lora_rank). Returns {processor_name:
    AttnAdapter} for direct threading or merging via pipelines.merge_extra_loras."""
    from controllora_tpu.models import unet as unet_lib

    cfg = unet_config or unet_lib.UNetConfig()
    names = unet_lib.attention_processor_names(cfg)
    spec = AdapterSpec(kind="lora", post_add=post_add)
    out: Dict[str, AttnAdapter] = {}
    rngs = jax.random.split(rng, len(names))
    for r, name in zip(rngs, names):
        hidden = unet_lib.processor_hidden_size(name, cfg)
        cross = unet_lib.processor_cross_dim(name, cfg)
        out[name] = AttnAdapter(
            params=init_adapter_params(r, hidden, cross, rank, spec), spec=spec
        )
    return out


# ---------------------------------------------------------------------------- init


def init_adapter_params(
    rng: jax.Array,
    hidden_size: int,
    cross_attention_dim: Optional[int],
    rank: int,
    spec: AdapterSpec,
    control_rank: Optional[int] = None,
    control_channels: Optional[int] = None,
) -> Dict[str, Any]:
    """Build one adapter's parameter pytree (reference models.py:89-97, 185-188, 316-323)."""
    kv_in = hidden_size if spec.post_add else (cross_attention_dim or hidden_size)
    keys = jax.random.split(rng, 6)
    p: Dict[str, Any] = {"to_q": init_lora_params(keys[0], hidden_size, hidden_size, rank)}
    if not spec.key_skipped:
        p["to_k"] = init_lora_params(keys[1], kv_in, hidden_size, rank)
    if not spec.value_skipped:
        p["to_v"] = init_lora_params(keys[2], kv_in, hidden_size, rank)
    if spec.is_control or not spec.output_skipped:
        p["to_out"] = init_lora_params(keys[3], hidden_size, hidden_size, rank)
    if spec.is_control:
        crank = control_rank if control_rank is not None else rank
        cch = control_channels if control_channels is not None else hidden_size
        in_dim = cch + (hidden_size if spec.concat_hidden else 0)
        p["to_control"] = init_lora_params(keys[4], in_dim, hidden_size, crank)
        if spec.kind == "control_v2":
            p["to_control_out"] = init_lora_params(keys[5], in_dim, hidden_size, crank)
    return p
