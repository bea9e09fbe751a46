"""Native data plane: builds/loads the C extension and provides a threaded
double-buffered prefetcher.

The reference feeds training through torch DataLoader worker processes (reference
train:657-663). TPU-host equivalent: per-batch sample synthesis/conversion in C
(native/fastloader.c, pthread-parallel) + a background-thread prefetch queue that
overlaps host data work with device steps.

Falls back transparently to the pure-Python datasets when a compiler is unavailable.
"""

from __future__ import annotations

import os
import queue
import subprocess
import sysconfig
import threading
from typing import Dict, Iterator, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_mod = None
_build_err: Optional[str] = None


def _build_and_load():
    """Compile native/fastloader.c into a loadable extension (cached)."""
    global _mod, _build_err
    if _mod is not None or _build_err is not None:
        return _mod
    try:
        import importlib.util

        so_path = os.path.join(_NATIVE_DIR, "_fastloader.so")
        src = os.path.join(_NATIVE_DIR, "fastloader.c")
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < os.path.getmtime(src)):
            include = sysconfig.get_paths()["include"]
            cmd = [
                os.environ.get("CC", "gcc"), "-O3", "-shared", "-fPIC", "-pthread",
                f"-I{include}", src, "-o", so_path, "-lm",
            ]
            subprocess.run(cmd, check=True, capture_output=True)
        spec = importlib.util.spec_from_file_location("_fastloader", so_path)
        _mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(_mod)
    except Exception as e:  # pragma: no cover
        _build_err = str(e)
        _mod = None
    return _mod


def native_available() -> bool:
    return _build_and_load() is not None


def fill50k_batch_native(specs: np.ndarray, resolution: int,
                         nthreads: int = 8):
    """specs: (B, 9) float32 [cx, cy, radius, bg RGB, fg RGB] -> (pixels, guides)
    float32 NHWC in [-1, 1]."""
    mod = _build_and_load()
    assert mod is not None, f"native loader unavailable: {_build_err}"
    b = specs.shape[0]
    pixels = np.empty((b, resolution, resolution, 3), np.float32)
    guides = np.empty((b, resolution, resolution, 3), np.float32)
    mod.fill50k_batch(
        np.ascontiguousarray(specs, np.float32), pixels, guides, resolution, nthreads
    )
    return pixels, guides


def normalize_u8_native(src: np.ndarray, nthreads: int = 8) -> np.ndarray:
    """uint8 (B, ...) -> float32 [-1, 1], multi-threaded in C."""
    mod = _build_and_load()
    assert mod is not None, f"native loader unavailable: {_build_err}"
    dst = np.empty(src.shape, np.float32)
    mod.normalize_u8(np.ascontiguousarray(src), dst, src.shape[0], nthreads)
    return dst


class NativeFill50kBatcher:
    """Batch-level fill50k synthesis in C; drop-in replacement for
    registry.batch_iterator over Fill50kSynthetic."""

    def __init__(self, dataset, batch_size: int, seed: int = 0, nthreads: int = 8,
                 start_step: int = 0):
        self.ds = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.nthreads = nthreads
        self.start_step = start_step

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(self.seed)
        n = len(self.ds)
        # resume fast-forward: replay the index draws only (no synthesis) so the
        # post-resume batch sequence equals the uninterrupted run's
        for _ in range(self.start_step):
            rng.integers(0, n, self.batch_size)
        while True:
            idx = rng.integers(0, n, self.batch_size)
            specs = np.empty((self.batch_size, 9), np.float32)
            ids = np.empty((self.batch_size, 77), np.int32)
            from controllora_tpu.data.fill50k import _COLORS

            for row, i in enumerate(idx):
                bg, fg, cx, cy, radius = self.ds._sample_spec(int(i))
                specs[row] = [cx, cy, radius, *_COLORS[bg], *_COLORS[fg]]
                ids[row] = self.ds.tokenizer([f"{fg} circle with {bg} background"])[0]
            pixels, guides = fill50k_batch_native(
                specs, self.ds.resolution, self.nthreads
            )
            yield {"pixel_values": pixels, "guide_values": guides, "input_ids": ids}


class NativeNormalizeBatcher:
    """batch_iterator-compatible batcher for datasets exposing ``getitem_u8``
    (e.g. the HF-dataset adapter): samples stay uint8 through decode/crop and the
    whole batch's [-1, 1] float conversion runs as ONE threaded C call per tensor
    (native normalize_u8) — 4 bytes/px less host traffic and no per-sample numpy
    division. Index order, epoch structure, and `start_step` fast-forward match
    registry.batch_iterator exactly (same RNG consumption), so resume semantics
    are identical to the python path."""

    def __init__(self, dataset, batch_size: int, seed: int = 0, shuffle: bool = True,
                 drop_last: bool = True, start_step: int = 0, nthreads: int = 8):
        assert hasattr(dataset, "getitem_u8"), "dataset must expose getitem_u8"
        self.ds = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.start_step = start_step
        self.nthreads = nthreads

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(self.seed)
        n = len(self.ds)
        bs = self.batch_size
        skip = self.start_step
        while True:
            order = rng.permutation(n) if self.shuffle else np.arange(n)
            for s in range(0, n - (bs - 1 if self.drop_last else 0), bs):
                if skip > 0:
                    skip -= 1
                    continue
                items = [self.ds.getitem_u8(int(i)) for i in order[s : s + bs]]
                pix = np.stack([it["pixel_values_u8"] for it in items])
                gui = np.stack([it["guide_values_u8"] for it in items])
                yield {
                    "pixel_values": normalize_u8_native(pix, self.nthreads),
                    "guide_values": normalize_u8_native(gui, self.nthreads),
                    "input_ids": np.stack([it["input_ids"] for it in items]),
                }


class Prefetcher:
    """Background-thread prefetch queue: overlaps host batch prep with device steps
    (the torch-DataLoader-workers equivalent for the jit loop)."""

    def __init__(self, iterator, depth: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._it = iterator
        self._done = object()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for item in self._it:
                self._q.put(item)
        finally:
            self._q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            raise StopIteration
        return item
