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


def test_error_isolation(pipe):
    """A failing batch rejects its own futures and the engine keeps serving."""
    eng = BatchingEngine(pipe, max_wait_ms=50.0, buckets=(1, 2))
    try:
        bad = eng.submit("x", seed=1, num_inference_steps=2, height=64, width=64,
                         guide=np.zeros((64, 64, 3), np.float32),
                         return_array=True)
        # sabotage: a guide whose spatial shape can't feed the hint encoder
        bad2 = eng.submit("y", seed=2, **COMMON)
        assert bad.result(timeout=600) is not None
        assert bad2.result(timeout=600) is not None
        with pytest.raises(ValueError, match="guide shape"):
            eng.submit("z", seed=3, guide=np.zeros((32, 32, 3), np.float32),
                       **COMMON)
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
