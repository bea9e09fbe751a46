"""Inference-time adapter folding.

Every ControlLoRA/LoRA operation is affine in the hidden states h and the control
features c (LoRA layers have no bias; concat/self-add/chains are linear — reference
models.py:201-220, 231-287, 357-431). Therefore, for FIXED control states (one guide
image, constant across all denoising steps), the whole adapter stack collapses into

    proj(x) = x @ W' + bias(position)

where W' folds the rank-r factors into the base projection kernels and `bias` is a
per-position array computed ONCE per sample. The 20-step CFG loop then runs a UNet with
*zero* adapter overhead — the TPU-native answer to SURVEY.md §7 hard part 3 (the
reference pays the full processor chain on every attention call of every step).

Supported: main adapters of kind lora / control_v1 / control_v2 with all flag
combinations used by the reference configs. Pre/post chains (mix path) fall back to the
unfolded path.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from controllora_tpu.models.lora import AdapterStack, AttnAdapter
from controllora_tpu.models import unet as unet_lib


@struct.dataclass
class FoldedBias:
    """Per-attention-layer precomputed position biases (None = not present)."""

    q_bias: Optional[jnp.ndarray] = None  # (B, L, C) added after to_q
    k_bias: Optional[jnp.ndarray] = None  # v2 self-attn only
    v_bias: Optional[jnp.ndarray] = None  # v2 self-attn only
    out_bias: Optional[jnp.ndarray] = None  # added after to_out


def _mm(*ms):
    out = ms[0].astype(jnp.float32)
    for m in ms[1:]:
        out = out @ m.astype(jnp.float32)
    return out


def _split_control_down(down: jnp.ndarray, hidden: int):
    """to_control.down rows: first `hidden` rows act on h (concat_hidden), rest on c."""
    return down[:hidden], down[hidden:]


def _attn_param_path(name: str):
    """'down_blocks.0.attentions.1.transformer_blocks.0.attn2.processor' ->
    ('down_blocks_0_attentions_1', 'transformer_blocks_0', 'attn2')."""
    parts = name.split(".")
    if parts[0] == "mid_block":
        block = f"mid_attentions_{parts[2]}"
        rest = parts[3:]
    else:
        block = f"{parts[0]}_{parts[1]}_{parts[2]}_{parts[3]}"
        rest = parts[4:]
    assert rest[0] == "transformer_blocks"
    return (block, f"transformer_blocks_{rest[1]}", rest[2])


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def _set(tree, path, value):
    """Functional set returning a new shallow-copied tree along the path."""
    if not path:
        return value
    new = dict(tree)
    new[path[0]] = _set(tree[path[0]], path[1:], value)
    return new


def fold_adapters(
    unet_params: Dict[str, Any],
    adapters: Dict[str, AdapterStack],
    lora_scale: float = 1.0,
) -> Tuple[Dict[str, Any], Dict[str, FoldedBias]]:
    """Returns (folded unet params, {proc_name: FoldedBias}).

    Raises ValueError for stacks that can't fold (pre/post chains) — callers should
    fall back to threading the unfolded adapters.
    """
    s = lora_scale
    new_params = unet_params
    biases: Dict[str, FoldedBias] = {}

    for name, stack in adapters.items():
        if stack.pre or stack.post or stack.main is None:
            raise ValueError(f"cannot fold chained stack at {name}")
        a: AttnAdapter = stack.main
        spec = a.spec
        path = _attn_param_path(name)
        attn = _get(unet_params, path)
        dtype = attn["to_q"]["kernel"].dtype
        C = attn["to_q"]["kernel"].shape[0]
        is_self = name.split(".")[-2] == "attn1" if False else ".attn1." in name

        p = a.params
        Wq = attn["to_q"]["kernel"]
        eye = jnp.eye(C, dtype=jnp.float32)

        def lora_mat(pair):
            return _mm(pair["down"], pair["up"])  # (in, out) fp32

        q_bias = k_bias = v_bias = out_bias = None
        upd: Dict[str, jnp.ndarray] = {}

        if spec.kind == "lora":
            Dq = lora_mat(p["to_q"])
            if spec.post_add:
                upd["to_q"] = _mm(Wq, eye + s * Dq)
            else:
                upd["to_q"] = _mm(Wq) + s * Dq
            if "to_k" in p and not spec.key_skipped:
                Wk = attn["to_k"]["kernel"]
                Dk = lora_mat(p["to_k"])
                upd["to_k"] = _mm(Wk, eye + s * Dk) if spec.post_add else _mm(Wk) + s * Dk
            if "to_v" in p and not spec.value_skipped:
                Wv = attn["to_v"]["kernel"]
                Dv = lora_mat(p["to_v"])
                upd["to_v"] = _mm(Wv, eye + s * Dv) if spec.post_add else _mm(Wv) + s * Dv
            if "to_out" in p and not spec.output_skipped:
                Wo = attn["to_out_0"]["kernel"]
                Do = lora_mat(p["to_out"])
                upd["to_out_0"] = (
                    _mm(Wo, eye + s * Do) if spec.post_add else _mm(Wo) + s * Do
                )

        elif spec.kind == "control_v1":
            assert a.control is not None
            c = a.control.astype(jnp.float32)  # (B, L, Cc)
            Dq = lora_mat(p["to_q"])
            dc, uc = p["to_control"]["down"], p["to_control"]["up"]
            if spec.concat_hidden:
                d_h, d_c = _split_control_down(dc, C)
                A = s * _mm(d_h, uc)  # h -> control proj, (C, C)
                Pc = s * _mm(c, d_c, uc)  # (B, L, C) c-part
                if spec.control_self_add:
                    # reference: self_add forced off when control_channels explicit;
                    # with concat + self_add c must already be C-dim
                    Pc = c + Pc
                    # self-add has no h-linear part
            else:
                A = jnp.zeros((C, C), jnp.float32)
                Pc = s * _mm(c, dc, uc)
                if spec.control_self_add:
                    Pc = c + Pc
            # q = (h @ Wq [+ post_add]) + s * (base + P(h, c)) @ Dq
            if spec.post_add:
                # base = q0 = h @ Wq ; P adds A h + Pc
                upd["to_q"] = _mm(Wq, eye + s * Dq) + s * _mm(A, Dq)
            else:
                upd["to_q"] = _mm(Wq) + s * Dq + s * _mm(A, Dq)
            q_bias = s * _mm(Pc, Dq)
            if "to_k" in p and not spec.key_skipped:
                Wk = attn["to_k"]["kernel"]
                Dk = lora_mat(p["to_k"])
                upd["to_k"] = _mm(Wk, eye + s * Dk) if spec.post_add else _mm(Wk) + s * Dk
            if "to_v" in p and not spec.value_skipped:
                Wv = attn["to_v"]["kernel"]
                Dv = lora_mat(p["to_v"])
                upd["to_v"] = _mm(Wv, eye + s * Dv) if spec.post_add else _mm(Wv) + s * Dv
            # main control out-lora applies unconditionally (reference models.py:279)
            Wo = attn["to_out_0"]["kernel"]
            Do = lora_mat(p["to_out"])
            upd["to_out_0"] = _mm(Wo, eye + s * Do) if spec.post_add else _mm(Wo) + s * Do

        elif spec.kind == "control_v2":
            assert a.control is not None
            c = a.control.astype(jnp.float32)
            dc, uc = p["to_control"]["down"], p["to_control"]["up"]
            dco, uco = p["to_control_out"]["down"], p["to_control_out"]["up"]
            d_h, d_c = _split_control_down(dc, C)
            do_h, do_c = _split_control_down(dco, C)
            M = eye + s * _mm(d_h, uc)  # h' = h @ M + b
            b = s * _mm(c, d_c, uc)
            Mo = eye + s * _mm(do_h, uco)  # a' = a @ Mo + bo
            bo = s * _mm(c, do_c, uco)

            Dq = lora_mat(p["to_q"])
            Wq_eff = _mm(Wq) + s * Dq  # q = h' @ (Wq + s Dq)
            upd["to_q"] = _mm(M, Wq_eff)
            q_bias = _mm(b, Wq_eff)
            if is_self:
                Wk, Wv = attn["to_k"]["kernel"], attn["to_v"]["kernel"]
                upd["to_k"] = _mm(M, Wk)
                k_bias = _mm(b, Wk)
                upd["to_v"] = _mm(M, Wv)
                v_bias = _mm(b, Wv)
            Wo = attn["to_out_0"]["kernel"]
            Do = lora_mat(p["to_out"])
            Wo_eff = _mm(Wo) + s * Do  # out = a' @ (Wo + s Do)
            upd["to_out_0"] = _mm(Mo, Wo_eff)
            out_bias = _mm(bo, Wo_eff)
        else:
            raise ValueError(f"unknown adapter kind {spec.kind}")

        for proj, kernel in upd.items():
            node = dict(_get(new_params, path + (proj,)))
            node["kernel"] = kernel.astype(dtype)
            new_params = _set(new_params, path + (proj,), node)
        biases[name] = FoldedBias(
            q_bias=q_bias, k_bias=k_bias, v_bias=v_bias, out_bias=out_bias
        )

    return new_params, biases
