"""Device mesh + sharding helpers.

The reference's only parallelism is data-parallel DDP via accelerate (reference
train_text_to_image_control_lora.py:683-685; SURVEY.md §2.4). TPU-native equivalent:
a `jax.sharding.Mesh` with the batch sharded over the 'data' axis and parameters
replicated — XLA inserts the gradient all-reduce (psum over ICI) automatically from the
jit output shardings. A 'model' axis is provisioned for optional tensor parallelism of
the frozen UNet (not required for parity: 7M trainable / 860M frozen fits one chip).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Tuple[str, ...] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over all (or the given) devices. Default: 1-D data-parallel."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names)


def make_serving_mesh(
    devices: Optional[Sequence[jax.Device]] = None, cfg: bool = True,
    model: int = 1,
) -> Mesh:
    """Serving mesh: up to three axes ('data', 'cfg', 'model').

    * 'data' shards the image batch (throughput; zero collectives),
    * 'cfg' (size 2) splits the [uncond ‖ cond] guidance pair (latency; one
      eps-psum per step),
    * 'model' (`model=k`) tensor-parallelizes the UNet transformer blocks
      (latency beyond cfg=2; see parallel/tp.py). Innermost so its psums ride
      adjacent-chip ICI links.

    Falls back to pure data-parallel for odd device counts or cfg=False."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model > 1:
        if n % (2 * model if cfg else model):
            raise ValueError(
                f"{n} devices cannot tile (data, "
                f"{'cfg=2, ' if cfg else ''}model={model})"
            )
        if cfg:
            return make_mesh((n // (2 * model), 2, model),
                             ("data", "cfg", "model"), devices)
        return make_mesh((n // model, model), ("data", "model"), devices)
    if cfg and n > 1 and n % 2 == 0:
        return make_mesh((n // 2, 2), ("data", "cfg"), devices)
    return make_mesh(devices=devices)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch pytree with the leading dim sharded over the data axis."""
    def put(x):
        spec = P(axis, *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_spec(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
