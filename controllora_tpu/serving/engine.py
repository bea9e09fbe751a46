"""Continuous micro-batching serving engine.

Production serving component (beyond-reference: the reference's only serving
surface is a single-request gradio callback, reference
apps/gradio_canny2image.py:66-92). Concurrent requests are coalesced into
per-image-prompt batches so mixed traffic runs at the measured batched-serving
optimum (docs/BENCHMARKS.md: 2.89 img/s/chip at batch 4 vs 2.37 at batch 1 on
512² 20-step CFG) instead of the single-request latency point.

TPU-shaped design decisions:

* **Bucketed batch shapes.** XLA compiles one program per shape; arbitrary batch
  sizes would recompile constantly. Batches pad up to the next bucket (default
  1/2/4/8 — bench-measured; b4 is the per-chip optimum) by repeating the last
  request, and padded outputs are dropped. Every bucket's program compiles once
  and is cached by the pipeline's sampler cache.
* **Composition-independent results.** Each request's initial latents derive
  from its own seed at submit time and ride the pipeline's `latents=` argument,
  so a request renders the same image whether it lands in a batch of 1 or 8
  (up to fp reassociation — pinned by tests/test_serving_engine.py).
* **Compatibility groups.** Only requests with identical (steps, resolution,
  guidance, lora_scale, guided-ness) can share a compiled program / batch-wide
  scalars; incompatible arrivals are held for the next batch rather than
  blocking the stream.
* **One dispatch thread.** A single worker owns the device: batches form under a
  `max_wait_ms` deadline (latency bound) while the previous batch computes, so
  host-side queueing overlaps device execution — the same overlap discipline as
  the training prefetcher (data/fastloader.py).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence

import numpy as np


@dataclass
class Request:
    prompt: str
    negative_prompt: str = ""
    guide: Optional[np.ndarray] = None  # (H, W, 3) in [-1, 1]
    num_inference_steps: int = 20
    guidance_scale: float = 9.0
    height: int = 512
    width: int = 512
    seed: int = 0
    lora_scale: float = 1.0
    return_array: bool = False
    # internal
    _latents: Any = field(default=None, repr=False)
    _future: Any = field(default=None, repr=False)
    _guide_fp: Any = field(default=None, repr=False)  # guide identity on a data mesh

    @property
    def group_key(self):
        """Requests sharing this key can render in one batched sampler call —
        same compiled program (steps/shape/guided-ness are trace-static) and
        same batch-wide scalars (guidance/lora scales are single jit args)."""
        return (
            self.num_inference_steps, self.height, self.width,
            float(self.guidance_scale), float(self.lora_scale),
            self.guide is not None, self.return_array, self._guide_fp,
        )


class BatchingEngine:
    def __init__(
        self,
        pipe,
        max_wait_ms: float = 25.0,
        buckets: Sequence[int] = (1, 2, 4, 8),
        pipe_kwargs: Optional[Dict[str, Any]] = None,
    ):
        """`pipe`: a StableDiffusionControlLoRAPipeline (any model family / mesh).
        `max_wait_ms`: how long a forming batch waits for companions once it has
        its first request. `buckets`: allowed batch shapes (sorted ascending);
        the largest is the batch-size cap. `pipe_kwargs`: extra kwargs applied to
        EVERY batched pipeline call — the deployment-level speed/quality knobs
        (`tome_ratio=`, `deepcache_interval=`); engine-wide (not per-request) so
        they never fragment the compatibility groups or the compiled-program set."""
        self.pipe = pipe
        self.pipe_kwargs = dict(pipe_kwargs or {})
        self.max_wait_ms = float(max_wait_ms)
        self.buckets = tuple(sorted(int(b) for b in buckets))
        if not self.buckets or self.buckets[0] < 1:
            raise ValueError(f"buckets must be positive ints, got {buckets!r}")
        # Mesh-aware bucket snapping: the data-parallel pipeline requires the
        # image batch to be a multiple of the mesh 'data' axis
        # (pipelines/text_to_image.py "data-parallel serving shards ..."), so
        # under-full buckets snap UP to the next multiple — a lone request on a
        # data-4 mesh renders as a padded batch of 4 instead of erroring.
        self._data_axis = 1
        mesh = getattr(pipe, "mesh", None)
        if mesh is not None:
            self._data_axis = int(dict(mesh.shape).get("data", 1))
        if self._data_axis > 1:
            d = self._data_axis
            self.buckets = tuple(sorted({((b + d - 1) // d) * d for b in self.buckets}))
        self._q: "queue.Queue[Request]" = queue.Queue()
        self._held: list = []  # incompatible leftovers, FIFO priority next round
        self._stop = threading.Event()
        self.stats: Dict[str, Any] = {
            "requests": 0, "batches": 0, "padded_slots": 0, "batch_sizes": {},
            "errors": 0,
        }
        self._worker = threading.Thread(target=self._loop, daemon=True,
                                        name="serving-batcher")
        self._worker.start()

    # ------------------------------------------------------------------ client

    def submit(self, prompt: str, **kw) -> Future:
        """Enqueue one request; resolves to its rendered image (HWC uint8, or
        float array with return_array=True)."""
        req = Request(prompt=prompt, **kw)
        if req.guide is not None:
            g = np.asarray(req.guide, np.float32)
            if g.ndim != 3 or g.shape[:2] != (req.height, req.width):
                raise ValueError(
                    f"guide shape {g.shape} must be ({req.height}, {req.width}, 3)"
                )
            req.guide = g
        # per-request initial latents from the request's own seed: the render is
        # then independent of which batch the request lands in
        import jax

        lh, lw = req.height // 8, req.width // 8
        c = self.pipe.unet.config.in_channels
        req._latents = np.asarray(jax.random.normal(
            jax.random.PRNGKey(req.seed), (1, lh, lw, c), np.float32
        ))
        # Data-parallel meshes accept only a single replicated guide per batched
        # call, so guided requests coalesce by guide IDENTITY: the fingerprint
        # joins the group key and _run passes one shared (H, W, 3) guide. A
        # cryptographic digest — a 64-bit Python hash collision would silently
        # render a colliding request with the wrong conditioning image.
        if self._data_axis > 1 and req.guide is not None:
            import hashlib

            req._guide_fp = hashlib.sha256(req.guide.tobytes()).digest()
        req._future = Future()
        self._q.put(req)
        return req._future

    def stop(self, timeout: float = 10.0) -> None:
        self._stop.set()
        self._worker.join(timeout=timeout)

    # ------------------------------------------------------------------ worker

    def _take_first(self) -> Optional[Request]:
        if self._held:
            return self._held.pop(0)
        try:
            return self._q.get(timeout=0.05)
        except queue.Empty:
            return None

    def _loop(self) -> None:
        while not self._stop.is_set():
            first = self._take_first()
            if first is None:
                continue
            batch = [first]
            cap = self.buckets[-1]
            deadline = time.monotonic() + self.max_wait_ms / 1000.0
            # pull compatible companions from held leftovers first …
            keep = []
            for r in self._held:
                (batch if len(batch) < cap and r.group_key == first.group_key
                 else keep).append(r)
            self._held = keep
            # … then from the live queue until the deadline / bucket cap
            while len(batch) < cap:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    r = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if r.group_key == first.group_key:
                    batch.append(r)
                else:
                    self._held.append(r)
            self._run(batch)

    def _run(self, batch) -> None:
        import jax

        n = len(batch)
        bucket = next(b for b in self.buckets if b >= n) if n <= self.buckets[-1] \
            else self.buckets[-1]
        pad = bucket - n
        reqs = batch + [batch[-1]] * pad  # padded slots repeat the last request
        first = batch[0]
        kw: Dict[str, Any] = dict(
            self.pipe_kwargs,
            negative_prompt=[r.negative_prompt for r in reqs],
            num_inference_steps=first.num_inference_steps,
            guidance_scale=first.guidance_scale,
            height=first.height, width=first.width,
            lora_scale=first.lora_scale,
            latents=np.concatenate([r._latents for r in reqs], axis=0),
            return_array=first.return_array,
        )
        if first.guide is not None:
            if self._data_axis > 1:
                # mesh path: one replicated guide (the group key pinned identity)
                kw["guide"] = first.guide
            else:
                kw["guide"] = np.stack([r.guide for r in reqs])
        try:
            t0 = time.monotonic()
            imgs = self.pipe([r.prompt for r in reqs], **kw)
            dt = time.monotonic() - t0
            for r, img in zip(batch, imgs[:n]):
                r._future.set_result(img)
            self.stats["requests"] += n
            self.stats["batches"] += 1
            self.stats["padded_slots"] += pad
            sizes = self.stats["batch_sizes"]
            sizes[bucket] = sizes.get(bucket, 0) + 1
            self.stats["last_batch_seconds"] = dt
        except Exception as e:  # fail the whole batch, keep serving
            self.stats["errors"] += 1
            for r in batch:
                if not r._future.done():
                    r._future.set_exception(e)
