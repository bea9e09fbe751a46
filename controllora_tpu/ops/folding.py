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

All folds are computed as LOW-RANK updates — `W @ (I + s·D·U) = W + s·(W@D)@U`,
`(I + s·Dh·U) @ W = W + s·Dh·(U@W)` — never materializing identity or C×C×C dense
products. The whole fold costs ~100 MFLOP (vs ~1.6 TFLOP per UNet step), so it is
negligible even if the compiler schedules it inside the sampling loop.

Supported: main adapters of kind lora / control_v1 / control_v2 with all flag
combinations used by the reference configs. Pre/post chains (mix path) fall back to the
unfolded path.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import struct

from controllora_tpu.models.lora import AdapterStack, AttnAdapter


@struct.dataclass
class FoldedBias:
    """Per-attention-layer precomputed position biases (None = not present)."""

    q_bias: Optional[jnp.ndarray] = None  # (B, L, C) added after to_q
    k_bias: Optional[jnp.ndarray] = None  # v2 self-attn only
    v_bias: Optional[jnp.ndarray] = None  # v2 self-attn only
    out_bias: Optional[jnp.ndarray] = None  # added after to_out


def _f32(x):
    return x.astype(jnp.float32)


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


def _add_low_rank_post(W, down, up, s):
    """W @ (I + s·down·up) = W + s·(W@down)@up. W: (in, out) with out == down-in dim."""
    Wd = _f32(W) @ _f32(down)
    return _f32(W) + s * (Wd @ _f32(up))


def _add_low_rank_pre(W, down, up, s):
    """(I + s·down·up) @ W = W + s·down@(up@W)."""
    uW = _f32(up) @ _f32(W)
    return _f32(W) + s * (_f32(down) @ uW)


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
        is_self = ".attn1." in name

        p = a.params
        Wq = attn["to_q"]["kernel"]

        def lora_delta(pair):
            """s·D·U as an explicit (in, out) low-rank product (cheap: in·r·out)."""
            return s * (_f32(pair["down"]) @ _f32(pair["up"]))

        q_bias = k_bias = v_bias = out_bias = None
        upd: Dict[str, jnp.ndarray] = {}

        def fold_plain(proj_key, param_key, W):
            pr = p[param_key]
            if spec.post_add:
                return _add_low_rank_post(W, pr["down"], pr["up"], s)
            return _f32(W) + lora_delta(pr)

        if spec.kind == "lora":
            upd["to_q"] = fold_plain("to_q", "to_q", Wq)
            if "to_k" in p and not spec.key_skipped:
                upd["to_k"] = fold_plain("to_k", "to_k", attn["to_k"]["kernel"])
            if "to_v" in p and not spec.value_skipped:
                upd["to_v"] = fold_plain("to_v", "to_v", attn["to_v"]["kernel"])
            if "to_out" in p and not spec.output_skipped:
                upd["to_out_0"] = fold_plain(
                    "to_out", "to_out", attn["to_out_0"]["kernel"]
                )

        elif spec.kind == "control_v1":
            assert a.control is not None
            c = _f32(a.control)  # (B, L, Cc)
            dq, uq = _f32(p["to_q"]["down"]), _f32(p["to_q"]["up"])
            dc, uc = _f32(p["to_control"]["down"]), _f32(p["to_control"]["up"])
            if spec.concat_hidden:
                d_h, d_c = dc[:C], dc[C:]
                # h-linear control part A = s·d_h·uc folded through to_q_lora:
                # s·A·Dq·Uq = s²·d_h·[(uc@dq)@uq]  (all low-rank)
                A_through_q = (s * s) * (d_h @ ((uc @ dq) @ uq))
                Pc = s * ((c @ d_c) @ uc)  # (B, L, C)
                if spec.control_self_add:
                    Pc = c + Pc
            else:
                A_through_q = None
                Pc = s * ((c @ dc) @ uc)
                if spec.control_self_add:
                    Pc = c + Pc
            if spec.post_add:
                Wq2 = _add_low_rank_post(Wq, p["to_q"]["down"], p["to_q"]["up"], s)
            else:
                Wq2 = _f32(Wq) + lora_delta(p["to_q"])
            if A_through_q is not None:
                Wq2 = Wq2 + A_through_q
            upd["to_q"] = Wq2
            q_bias = s * ((Pc @ dq) @ uq)
            if "to_k" in p and not spec.key_skipped:
                upd["to_k"] = fold_plain("to_k", "to_k", attn["to_k"]["kernel"])
            if "to_v" in p and not spec.value_skipped:
                upd["to_v"] = fold_plain("to_v", "to_v", attn["to_v"]["kernel"])
            # main control out-lora applies unconditionally (reference models.py:279)
            if spec.post_add:
                upd["to_out_0"] = _add_low_rank_post(
                    attn["to_out_0"]["kernel"], p["to_out"]["down"], p["to_out"]["up"], s
                )
            else:
                upd["to_out_0"] = _f32(attn["to_out_0"]["kernel"]) + lora_delta(
                    p["to_out"]
                )

        elif spec.kind == "control_v2":
            assert a.control is not None
            c = _f32(a.control)
            dc, uc = _f32(p["to_control"]["down"]), _f32(p["to_control"]["up"])
            dco, uco = _f32(p["to_control_out"]["down"]), _f32(p["to_control_out"]["up"])
            d_h, d_c = dc[:C], dc[C:]
            do_h, do_c = dco[:C], dco[C:]
            b = s * ((c @ d_c) @ uc)  # h' = h@M + b, M = I + s·d_h·uc
            bo = s * ((c @ do_c) @ uco)  # a' = a@Mo + bo

            # q = h' @ Wq_eff, Wq_eff = Wq + s·Dq·Uq ; W' = M @ Wq_eff (low-rank pre)
            Wq_eff = _f32(Wq) + lora_delta(p["to_q"])
            upd["to_q"] = Wq_eff + s * (d_h @ (uc @ Wq_eff))
            q_bias = b @ Wq_eff
            if is_self:
                Wk, Wv = attn["to_k"]["kernel"], attn["to_v"]["kernel"]
                upd["to_k"] = _add_low_rank_pre(Wk, d_h, uc, s)
                k_bias = b @ _f32(Wk)
                upd["to_v"] = _add_low_rank_pre(Wv, d_h, uc, s)
                v_bias = b @ _f32(Wv)
            Wo_eff = _f32(attn["to_out_0"]["kernel"]) + lora_delta(p["to_out"])
            upd["to_out_0"] = Wo_eff + s * (do_h @ (uco @ Wo_eff))
            out_bias = bo @ Wo_eff
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
