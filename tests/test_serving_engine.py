"""Micro-batching serving engine: coalescing, exactness, grouping, HTTP front.

The engine's contract: a request's image is identical (up to fp reassociation)
whether it rendered alone or inside any coalesced batch — per-request seeds
produce per-request latents, and the per-image-prompt pipeline keeps rows
independent. These tests drive the real engine worker thread over the smoke
stack.
"""

import base64
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllora_tpu.config import ControlLoRAConfig
from controllora_tpu.data.tokenizer import HashTokenizer
from controllora_tpu.models.control_lora import ControlLoRA
from controllora_tpu.models import zoo
from controllora_tpu.models.unet import derive_cross_attention_dims
from controllora_tpu.pipelines import StableDiffusionControlLoRAPipeline
from controllora_tpu.serving import BatchingEngine

TINY_CONTROL = ControlLoRAConfig(
    block_out_channels=(8, 16, 16, 32),
    lora_block_in_channels=(32, 32, 32, 32),
    lora_block_out_channels=(32, 64, 96, 96),
    lora_cross_attention_dims=derive_cross_attention_dims(zoo.SMOKE_UNET),
)


@pytest.fixture(scope="module")
def pipe():
    unet, vae, text = zoo.build_models("smoke", dtype=jnp.float32)
    frozen = zoo.random_frozen(jax.random.PRNGKey(0), unet, vae, text,
                               latent_size=8, param_dtype=jnp.float32)
    cl = ControlLoRA(TINY_CONTROL)
    cp = jax.tree.map(lambda x: x + 0.01,
                      cl.init(jax.random.PRNGKey(1), image_size=64))
    return StableDiffusionControlLoRAPipeline(
        unet, vae, text, HashTokenizer(), frozen, cl, cp
    )


def make_guide():
    g = np.zeros((64, 64, 3), np.float32) - 1.0
    g[20:40, 20:40] = 1.0
    return g


COMMON = dict(num_inference_steps=2, height=64, width=64, return_array=True)


def solo_render(pipe, prompt, seed, steps=2, guide=None, **kw):
    """Direct single-request pipeline render with the engine's seed->latents rule."""
    lat = jax.random.normal(jax.random.PRNGKey(seed), (1, 8, 8, 4), np.float32)
    return pipe(prompt, guide=guide, num_inference_steps=steps, latents=lat,
                return_array=True, **kw)[0]


def test_coalesced_batch_matches_solo_renders(pipe):
    """Requests submitted together coalesce into one batch, and each result
    equals the request's solo render."""
    eng = BatchingEngine(pipe, max_wait_ms=3000.0, buckets=(1, 2, 4))
    try:
        futs = [
            eng.submit(f"prompt {i}", seed=100 + i, guide=make_guide(), **COMMON)
            for i in range(3)
        ]
        results = [f.result(timeout=600) for f in futs]
        assert eng.stats["batches"] == 1
        assert eng.stats["batch_sizes"] == {4: 1}  # 3 requests pad to bucket 4
        assert eng.stats["padded_slots"] == 1
        for i, img in enumerate(results):
            ref = solo_render(pipe, f"prompt {i}", 100 + i, guide=make_guide())
            np.testing.assert_allclose(img, ref, atol=5e-4)
    finally:
        eng.stop()


def test_incompatible_requests_split_batches(pipe):
    """Different step counts cannot share a compiled program: the engine must
    split them into separate (correct) batches rather than merging."""
    eng = BatchingEngine(pipe, max_wait_ms=3000.0, buckets=(1, 2, 4))
    try:
        f1 = eng.submit("two steps", seed=7, **COMMON)
        kw3 = dict(COMMON, num_inference_steps=3)
        f2 = eng.submit("three steps", seed=8, **kw3)
        a = f1.result(timeout=600)
        b = f2.result(timeout=600)
        assert eng.stats["batches"] == 2
        np.testing.assert_allclose(a, solo_render(pipe, "two steps", 7), atol=5e-4)
        np.testing.assert_allclose(
            b, solo_render(pipe, "three steps", 8, steps=3), atol=5e-4)
    finally:
        eng.stop()


class _FlakyPipe:
    """Delegating pipeline wrapper whose first `fail_times` calls raise inside
    the engine worker — exercises the batch-failure path (futures rejected,
    stats['errors'] counted, worker keeps serving)."""

    def __init__(self, inner, fail_times=1):
        self._inner = inner
        self._fail_times = fail_times
        self.calls = 0

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def __call__(self, *args, **kwargs):
        self.calls += 1
        if self.calls <= self._fail_times:
            raise RuntimeError("injected batch failure")
        return self._inner(*args, **kwargs)


def test_error_isolation(pipe):
    """A failing batch rejects its own futures and the engine keeps serving."""
    flaky = _FlakyPipe(pipe, fail_times=1)
    eng = BatchingEngine(flaky, max_wait_ms=3000.0, buckets=(1, 2))
    try:
        # both requests coalesce into the batch that fails inside the worker
        f1 = eng.submit("x", seed=1, **COMMON)
        f2 = eng.submit("y", seed=2, **COMMON)
        with pytest.raises(RuntimeError, match="injected batch failure"):
            f1.result(timeout=600)
        with pytest.raises(RuntimeError, match="injected batch failure"):
            f2.result(timeout=600)
        assert eng.stats["errors"] == 1
        # the worker survived: a subsequent request renders normally
        ok = eng.submit("z", seed=3, **COMMON).result(timeout=600)
        np.testing.assert_allclose(ok, solo_render(pipe, "z", 3), atol=5e-4)
        assert eng.stats["requests"] == 1  # only the successful one counted
        # submit-time validation is separate from worker failures
        with pytest.raises(ValueError, match="guide shape"):
            eng.submit("w", seed=4, guide=np.zeros((32, 32, 3), np.float32),
                       **COMMON)
        assert eng.stats["errors"] == 1
    finally:
        eng.stop()


@pytest.fixture(scope="module")
def meshed_pipe():
    """Same smoke stack on a 2-device data mesh (virtual CPU devices)."""
    from controllora_tpu.parallel import make_mesh

    unet, vae, text = zoo.build_models("smoke", dtype=jnp.float32)
    frozen = zoo.random_frozen(jax.random.PRNGKey(0), unet, vae, text,
                               latent_size=8, param_dtype=jnp.float32)
    cl = ControlLoRA(TINY_CONTROL)
    cp = jax.tree.map(lambda x: x + 0.01,
                      cl.init(jax.random.PRNGKey(1), image_size=64))
    mesh = make_mesh(devices=jax.devices()[:2])
    return StableDiffusionControlLoRAPipeline(
        unet, vae, text, HashTokenizer(), frozen, cl, cp, mesh=mesh
    )


def test_mesh_bucket_snapping(meshed_pipe):
    """On a data-2 mesh, buckets snap UP to multiples of the data axis so
    under-full batches never violate the pipeline's n %% mesh check."""
    eng = BatchingEngine(meshed_pipe, max_wait_ms=10.0, buckets=(1, 2, 4))
    eng.stop()
    assert eng.buckets == (2, 4)


def test_mesh_lone_guided_request(pipe, meshed_pipe):
    """A lone guided request on a data mesh pads to the snapped bucket and
    renders the same image as the unmeshed solo render."""
    eng = BatchingEngine(meshed_pipe, max_wait_ms=30.0, buckets=(1, 2))
    try:
        img = eng.submit("solo on mesh", seed=11, guide=make_guide(),
                         **COMMON).result(timeout=600)
        assert eng.stats["batch_sizes"] == {2: 1}
        assert eng.stats["padded_slots"] == 1
        ref = solo_render(pipe, "solo on mesh", 11, guide=make_guide())
        # sharded vs single-device GEMM reassociation (same bound as
        # __graft_entry__.dryrun_multichip's serve check)
        np.testing.assert_allclose(img, ref, atol=2e-3)
    finally:
        eng.stop()


def test_mesh_guided_traffic_groups_by_guide(pipe, meshed_pipe):
    """Guided requests on a data mesh coalesce only with identical guides
    (the mesh supports one replicated guide per call); different guides
    render in separate batches, each still correct."""
    g1 = make_guide()
    g2 = -make_guide()
    eng = BatchingEngine(meshed_pipe, max_wait_ms=3000.0, buckets=(1, 2))
    try:
        futs = [
            eng.submit("a", seed=21, guide=g1, **COMMON),
            eng.submit("b", seed=22, guide=g1, **COMMON),
            eng.submit("c", seed=23, guide=g2, **COMMON),
        ]
        imgs = [f.result(timeout=600) for f in futs]
        assert eng.stats["batches"] == 2  # {a,b} share g1; c renders alone
        assert eng.stats["errors"] == 0
        for (prompt, seed, g), img in zip(
                [("a", 21, g1), ("b", 22, g1), ("c", 23, g2)], imgs):
            ref = solo_render(pipe, prompt, seed, guide=g)
            np.testing.assert_allclose(img, ref, atol=2e-3)
    finally:
        eng.stop()


def test_http_server_end_to_end(pipe):
    """POST /generate through the stdlib server -> engine -> pipeline -> PNG."""
    from scripts.serve import build_server

    eng = BatchingEngine(pipe, max_wait_ms=20.0, buckets=(1, 2))
    server = build_server(eng, "127.0.0.1", 0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        port = server.server_address[1]
        req = {"prompt": "hello", "steps": 2, "height": 64, "width": 64,
               "seed": 5}
        body = json.dumps(req).encode()
        with urllib.request.urlopen(
                urllib.request.Request(
                    f"http://127.0.0.1:{port}/generate", data=body,
                    headers={"Content-Type": "application/json"}),
                timeout=600) as r:
            out = json.loads(r.read())
        png = base64.b64decode(out["image"])
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        from apps._webui import _decode_image

        img = _decode_image(png)
        assert img.shape == (64, 64, 3)
        # uint8 render equals the solo render quantized
        ref = solo_render(pipe, "hello", 5)
        ref8 = np.clip((ref + 1.0) * 127.5, 0, 255).astype(np.uint8)
        assert np.abs(img.astype(int) - ref8.astype(int)).max() <= 1
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=60) as r:
            assert r.read() == b"ok"
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=60) as r:
            stats = json.loads(r.read())
        assert stats["requests"] >= 1
    finally:
        server.shutdown()
        eng.stop()


def test_engine_pipe_kwargs_speed_knobs(pipe):
    """Engine-wide pipe_kwargs (the serve.py --tome_ratio/--deepcache_interval
    deployment knobs) apply to every batch: the accelerated render differs from
    the exact solo render but stays finite and deterministic across batches."""
    eng = BatchingEngine(pipe, max_wait_ms=50.0, buckets=(1, 2),
                         pipe_kwargs=dict(deepcache_interval=2, tome_ratio=0.5,
                                          tome_min_tokens=0))
    try:
        kw = dict(COMMON, num_inference_steps=4)
        a = eng.submit("knobs", seed=31, **kw).result(timeout=600)
        b = eng.submit("knobs", seed=31, **kw).result(timeout=600)
        assert np.isfinite(a).all()
        np.testing.assert_array_equal(a, b)
        exact = solo_render(pipe, "knobs", 31, steps=4)
        assert np.abs(a.astype(np.float32) - exact.astype(np.float32)).max() > 0
        assert eng.stats["errors"] == 0
    finally:
        eng.stop()
