"""Token merging (ToMe) for diffusion serving — static-shape TPU implementation.

Implements the token-merging acceleration of Bolya & Hoffman, "Token Merging for
Fast Stable Diffusion" (tomesd): before a transformer block's self-attention, spatially
redundant tokens are merged by bipartite soft matching (each merged *src* token is
averaged into its most-similar *dst* token), attention runs on the reduced sequence,
and the output is unmerged (each merged position receives its representative's value).
At 512² the level-0 blocks hold L=4096 tokens whose attention cost is quadratic; a 0.5
merge ratio cuts it ~4× with small quality impact (the technique trades exactness for
speed — it is OFF by default and never part of the exact headline benchmark path).

TPU-first design decisions (vs the CUDA/torch original):
  * everything is static-shape: the merge count ``r`` is a Python int derived from
    (L, ratio) at trace time, so the whole sampler still compiles to one XLA program;
  * the unmerge is expressed as ONE gather via a precomputed inverse index map —
    no scatter of the big activation tensor (three small int32 scatters build the map);
  * the random dst choice per 2D window is drawn from a jax PRNG key (callers derive
    a per-denoising-step key with ``jax.random.fold_in``, mirroring tomesd's fresh
    generator draw each call, which averages merge artifacts across steps);
  * merging is LINEAR (a row-averaging matrix), so it commutes exactly with the
    per-token linear projections — the folded serving path merges its precomputed
    per-position biases with the same map and stays mathematically identical to
    merging after projection.

No reference-counterpart: beyond HighCWu/ControlLoRA (which serves unaccelerated
diffusers pipelines); the algorithm follows the published tomesd method.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ToMeConfig:
    """Static token-merging settings (part of the jit cache key via static args).

    ratio: fraction of ALL tokens to merge (0 disables; capped at 1 - 1/(sx·sy)).
    sx, sy: stride of the dst grid — one dst token per sx×sy window.
    min_tokens: only blocks with L >= min_tokens merge (default: level-0 at 512²,
        matching tomesd's max_downsample=1 default).
    """

    ratio: float = struct.field(pytree_node=False, default=0.5)
    sx: int = struct.field(pytree_node=False, default=2)
    sy: int = struct.field(pytree_node=False, default=2)
    min_tokens: int = struct.field(pytree_node=False, default=4096)


def merge_count(cfg: ToMeConfig, length: int) -> int:
    """Static number of merged tokens for a block of `length` tokens."""
    n_dst = length // (cfg.sx * cfg.sy)
    return max(0, min(int(length * cfg.ratio), length - n_dst))


def build_merge(
    metric: jnp.ndarray,  # (B, L, C) token features the similarity is computed on
    hh: int,
    ww: int,
    cfg: ToMeConfig,
    key: jax.Array,
) -> Tuple[Callable[[jnp.ndarray], jnp.ndarray], Callable[[jnp.ndarray], jnp.ndarray], int]:
    """Bipartite-soft-matching merge/unmerge closures for one transformer block.

    Returns (merge, unmerge, merged_len):
      merge(x):   (B, L, C') -> (B, L-r, C'), rows = [unmerged srcs ‖ dst means]
      unmerge(y): (B, L-r, C') -> (B, L, C'), merged positions read their dst row
    Both close over per-batch index maps computed ONCE from `metric`, so they can
    be applied to any same-length tensor (hidden states, folded biases, control
    states) with exactly consistent token bookkeeping.
    """
    B, L, C = metric.shape
    if hh % cfg.sy or ww % cfg.sx:
        raise ValueError(
            f"token grid {hh}x{ww} must tile the ToMe window {cfg.sy}x{cfg.sx}"
        )
    r = merge_count(cfg, L)
    if r <= 0:
        return (lambda x: x), (lambda y: y), L

    nsy, nsx = hh // cfg.sy, ww // cfg.sx
    n_dst = nsy * nsx
    n_src = L - n_dst

    # one random dst position per window (shared across the batch, like tomesd)
    rand = jax.random.randint(key, (nsy, nsx), 0, cfg.sx * cfg.sy)
    dy, dx = rand // cfg.sx, rand % cfg.sx
    ys = jnp.arange(nsy)[:, None] * cfg.sy + dy
    xs = jnp.arange(nsx)[None, :] * cfg.sx + dx
    dst_mask = jnp.zeros((L,), bool).at[(ys * ww + xs).reshape(-1)].set(True)

    # position-ordered src/dst index lists via one stable sort (static shapes; no
    # dynamic nonzero): non-dst positions sort first, each group in position order
    order = jnp.argsort(dst_mask.astype(jnp.int32) * L + jnp.arange(L))
    src_pos, dst_pos = order[:n_src], order[n_src:]  # (Ns,), (Nd,)

    mnorm = metric.astype(jnp.float32)
    mnorm = mnorm / (jnp.linalg.norm(mnorm, axis=-1, keepdims=True) + 1e-6)
    scores = jnp.einsum(
        "bsc,bdc->bsd", mnorm[:, src_pos], mnorm[:, dst_pos]
    )  # (B, Ns, Nd) cosine similarity
    node_max = scores.max(-1)
    node_idx = scores.argmax(-1).astype(jnp.int32)  # most-similar dst per src
    edge_order = jnp.argsort(-node_max, axis=-1).astype(jnp.int32)  # (B, Ns)
    merged_e, unm_e = edge_order[:, :r], edge_order[:, r:]
    dst_of_merged = jnp.take_along_axis(node_idx, merged_e, 1)  # (B, r)
    brow = jnp.arange(B)[:, None]

    def merge(x: jnp.ndarray) -> jnp.ndarray:
        xb = jnp.broadcast_to(x, (B,) + x.shape[1:]) if x.shape[0] != B else x
        xsrc, xdst = xb[:, src_pos], xb[:, dst_pos]
        unm = jnp.take_along_axis(xsrc, unm_e[..., None], 1)
        msrc = jnp.take_along_axis(xsrc, merged_e[..., None], 1)
        # mean of (dst, its merged srcs) — fp32 accumulation for bf16 inputs
        sums = jnp.zeros((B, n_dst, xb.shape[-1]), jnp.float32)
        sums = sums.at[brow, dst_of_merged].add(msrc.astype(jnp.float32))
        counts = jnp.ones((B, n_dst), jnp.float32).at[brow, dst_of_merged].add(1.0)
        dst_new = ((xdst.astype(jnp.float32) + sums) / counts[..., None]).astype(xb.dtype)
        return jnp.concatenate([unm, dst_new], axis=1)  # (B, L - r, C')

    # inverse map: output position -> row of the merged tensor (built once,
    # reused as a single gather per unmerge)
    inv = jnp.zeros((B, L), jnp.int32)
    inv = inv.at[brow, jnp.take(src_pos, unm_e)].set(
        jnp.broadcast_to(jnp.arange(n_src - r, dtype=jnp.int32), (B, n_src - r))
    )
    inv = inv.at[:, dst_pos].set(n_src - r + jnp.arange(n_dst, dtype=jnp.int32))
    inv = inv.at[brow, jnp.take(src_pos, merged_e)].set(n_src - r + dst_of_merged)

    def unmerge(y: jnp.ndarray) -> jnp.ndarray:
        return jnp.take_along_axis(y, inv[..., None], 1)

    return merge, unmerge, L - r


def step_key(seed: int, timestep: jnp.ndarray, index=None) -> jax.Array:
    """Per-denoising-step merge randomness (tomesd draws a fresh generator sample
    per call; varying the dst grid across steps averages out merge artifacts).

    `index` (the sampler's scan step, when the caller has one) is folded in on top
    of the timestep: float timestep grids can round two adjacent steps to the same
    int32, which would silently reuse one merge grid and weaken the averaging."""
    t = jnp.asarray(timestep).reshape(-1)[0].astype(jnp.int32)
    key = jax.random.fold_in(jax.random.PRNGKey(seed), t)
    if index is not None:
        key = jax.random.fold_in(key, jnp.asarray(index).astype(jnp.int32))
    return key


def maybe_tome(
    tome: Optional[ToMeConfig], hh: int, ww: int
) -> bool:
    """Whether a block on an hh×ww token grid participates in merging: long
    enough, tiles the dst window, and has a nonzero merge count."""
    if tome is None or tome.ratio <= 0 or hh * ww < tome.min_tokens:
        return False
    if hh % tome.sy or ww % tome.sx:
        return False  # deep-level odd grids (e.g. 1×1 on smoke widths) skip
    return merge_count(tome, hh * ww) > 0


__all__ = ["ToMeConfig", "build_merge", "merge_count", "step_key", "maybe_tome"]
