"""Tensor-parallel serving of the frozen UNet's transformer blocks.

The serving latency floor on one chip is set by the level-0/1 transformer blocks
(docs/BENCHMARKS.md round-3 attribution: ~37 of 64 ms of the CFG eval); the
'cfg' mesh axis halves batch-1 latency but stops at 2 chips. This module adds a
Megatron-style 'model' axis that shards those blocks' matmuls over further
chips — the TPU-native latency axis beyond cfg=2 (reference has no multi-GPU
serving at all; apps/gradio_canny2image.py is single-device).

Scheme (exact, per transformer sub-layer; activations entering and leaving every
sub-layer stay replicated so the surrounding convs/norms are untouched):

* attention: `to_q/to_k/to_v` kernels column-sharded over 'model' — columns are
  head-major (`inner = heads*dim_head`), so a contiguous 1/k column slice is a
  contiguous block of heads and each device runs flash attention on its own
  heads. `to_out_0` is row-sharded; each device holds a partial projection and
  one `psum` over 'model' completes it. Additive constants that must appear
  once (the `to_out_0` bias, folded control `out_bias`) are pre-divided by k so
  the psum reconstitutes them exactly.
* GEGLU feed-forward: `net_0_proj` is column-sharded with its [a ‖ gate] column
  pairs re-blocked per rank (`a` and `gate` slices must land on the same
  device); `net_2` is row-sharded + psum, bias pre-divided.

Everything else (resnets, norms, proj_in/out convs, time embedding, VAE, CLIP)
replicates — by the round-3 attribution those run at 77–96% MXU and sharding
them would spend ICI on ops that are already compute-bound.

Adapters compose through `ops/folding.py`: control/LoRA stacks fold into the
kernels + per-position biases BEFORE the param tree is sharded, so the
tensor-parallel loop pays zero adapter overhead and the q/k/v position biases
shard with their columns. Unfoldable chains (mix pre/post) are rejected by the
pipeline with a clear error.

Used by `pipelines/text_to_image.py` when the serving mesh carries a 'model'
axis (`parallel.make_serving_mesh(model=k)`), and validated by
tests/test_tp_serving.py equivalence against the single-device render.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def _role(path: Tuple[str, ...]) -> str:
    """Sharding role of a UNet param leaf, by its flax path suffix."""
    if len(path) >= 3:
        mod, proj, leaf = path[-3], path[-2], path[-1]
        if mod.startswith("attn"):
            if proj in ("to_q", "to_k", "to_v"):
                return "col" if leaf == "kernel" else "rep"
            if proj == "to_out_0":
                return "row" if leaf == "kernel" else "scaled"
        if mod == "ff":
            if proj == "net_0_proj":
                return "geglu_col"
            if proj == "net_2":
                return "row" if leaf == "kernel" else "scaled"
    return "rep"


def _geglu_permute(x: jnp.ndarray, tp: int) -> jnp.ndarray:
    """Re-block GEGLU [a(F) ‖ gate(F)] columns into per-rank [a_r ‖ gate_r] pairs
    so a contiguous 1/tp slice carries matching a/gate halves."""
    f2 = x.shape[-1]
    assert f2 % (2 * tp) == 0, f"GEGLU width {f2} not divisible by 2*tp={2*tp}"
    f = f2 // 2
    y = x.reshape(x.shape[:-1] + (2, tp, f // tp))
    y = jnp.swapaxes(y, -3, -2)  # (..., tp, 2, f/tp)
    return y.reshape(x.shape)


def tp_prepare_params(params: Dict[str, Any], tp: int) -> Dict[str, Any]:
    """Host/global pass before shard_map slicing: permute GEGLU columns into
    per-rank blocks and pre-divide the row-parallel biases by tp (the per-rank
    partial sums then psum back to exactly kernel@x + bias)."""

    def walk(node, path):
        if not isinstance(node, dict):
            r = _role(path)
            if r == "geglu_col":
                return _geglu_permute(node, tp)
            if r == "scaled":
                return node / tp
            return node
        return {k: walk(v, path + (k,)) for k, v in node.items()}

    return walk(params, ())


def tp_param_specs(params: Dict[str, Any], axis: str = "model"):
    """PartitionSpec pytree for shard_map in_specs, matching tp_prepare_params."""

    def walk(node, path):
        if not isinstance(node, dict):
            r = _role(path)
            if r in ("col", "geglu_col"):
                return P(*([None] * (node.ndim - 1)), axis)
            if r == "row":
                return P(axis, *([None] * (node.ndim - 1)))
            return P()
        return {k: walk(v, path + (k,)) for k, v in node.items()}

    return walk(params, ())


def tp_prepare_biases(biases: Optional[Dict[str, Any]], tp: int):
    """Folded per-position biases (ops/folding.FoldedBias): q/k/v biases shard
    with their projection columns (no change here); `out_bias` is added after
    the row-parallel out projection, i.e. inside the psum — pre-divide by tp."""
    if not biases:
        return biases
    out = {}
    for name, fb in biases.items():
        out[name] = fb.replace(
            out_bias=None if fb.out_bias is None else fb.out_bias / tp
        )
    return out


def tp_bias_specs(biases: Optional[Dict[str, Any]], axis: str = "model"):
    """Spec pytree for the folded biases: inner-dim (q/k/v) biases column-shard
    on their last axis, out_bias replicates (pre-scaled)."""
    if not biases:
        return P()

    def col(b):
        return None if b is None else P(*([None] * (b.ndim - 1)), axis)

    out = {}
    for name, fb in biases.items():
        out[name] = fb.replace(
            q_bias=col(fb.q_bias),
            k_bias=col(fb.k_bias),
            v_bias=col(fb.v_bias),
            out_bias=None if fb.out_bias is None else P(),
        )
    return out


def validate_tp(config, tp: int) -> None:
    """Fail fast on configs the head-aligned column sharding cannot split."""
    hd = config.attention_head_dim
    n = len(config.block_out_channels)
    per_block = tuple(hd) if isinstance(hd, (tuple, list)) else ((hd,) * n)
    for i, heads in enumerate(per_block):
        # only levels that actually instantiate attention constrain the
        # sharding (SDXL level 0 is DownBlock2D/UpBlock2D — its 5-head config
        # entry never materializes); the mid block always uses the last entry
        has_attn = (
            config.down_block_types[i] == "CrossAttnDownBlock2D"
            or config.up_block_types[n - 1 - i] == "CrossAttnUpBlock2D"
            or i == n - 1
        )
        if has_attn and heads % tp:
            raise ValueError(
                f"tensor-parallel serving shards attention by whole heads: "
                f"heads={heads} (level {i}) not divisible by model-axis size {tp}"
            )
    for ch in config.block_out_channels:
        if (4 * ch) % tp:  # GEGLU inner = dim * 4
            raise ValueError(
                f"GEGLU inner width {4 * ch} not divisible by model-axis size {tp}"
            )
