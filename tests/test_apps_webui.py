"""Web-UI app path: a real HTTP round-trip through the stdlib fallback UI
(apps/_webui.py) driving the canny2image `process()` callback — the same
resize -> Canny -> BGR-flip -> normalize -> CFG-sample chain the gradio route runs
(reference apps/gradio_canny2image.py:66-92). gradio itself is not installable in
this container; this exercises the web surface end-to-end instead of only the CLI."""

import base64
import io
import json
import os
import sys
import threading
import urllib.request

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from controllora_tpu.config import ControlLoRAConfig
from controllora_tpu.models import zoo
from controllora_tpu.models.control_lora import ControlLoRA
from controllora_tpu.models.unet import derive_cross_attention_dims


@pytest.fixture(scope="module")
def server_url(tmp_path_factory):
    from PIL import Image  # noqa: F401  (decoders needed below)

    from apps._webui import build_server
    from apps.gradio_canny2image import build_processor
    from controllora_tpu.training.checkpoint import save_control_lora

    # tiny ControlLoRA artifact matching the smoke UNet
    cfg = ControlLoRAConfig(
        block_out_channels=(8, 16, 16, 32),
        lora_block_in_channels=(32, 32, 32, 32),
        lora_block_out_channels=(32, 64, 96, 96),
        lora_cross_attention_dims=derive_cross_attention_dims(zoo.SMOKE_UNET),
    )
    params = ControlLoRA(cfg).init(jax.random.PRNGKey(1), image_size=64)
    art = str(tmp_path_factory.mktemp("art"))
    save_control_lora(art, params, cfg, formats=("safetensors",))

    class Args:
        pretrained_model_name_or_path = None
        model_variant = "smoke"
        control_lora_dir = art

    process = build_processor(Args())
    from apps.gradio_canny2image import DEFAULTS

    server = build_server("canny2image test", process, DEFAULTS,
                          host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield url
    server.shutdown()


def _png_b64(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def make_input():
    img = np.zeros((64, 64, 3), np.uint8)
    img[16:48, 16:48] = 255  # a square: strong canny edges
    return img


def test_index_form(server_url):
    html = urllib.request.urlopen(f"{server_url}/", timeout=30).read().decode()
    assert "canny2image test" in html
    assert 'name="low_threshold"' in html  # app fields rendered


def test_api_generates_images(server_url):
    from PIL import Image

    req = {
        "image": _png_b64(make_input()),
        "prompt": "a red square",
        "num_samples": 1, "image_resolution": 64, "ddim_steps": 2,
        "scale": 5.0, "seed": 3, "low_threshold": 100, "high_threshold": 200,
    }
    resp = urllib.request.urlopen(
        urllib.request.Request(
            f"{server_url}/api", data=json.dumps(req).encode(),
            headers={"Content-Type": "application/json"},
        ),
        timeout=600,
    )
    out = json.loads(resp.read())
    # [inverted detected map] + num_samples renders (reference apps:92 layout)
    assert len(out["images"]) == 2
    for b64 in out["images"]:
        arr = np.asarray(Image.open(io.BytesIO(base64.b64decode(b64))))
        assert arr.shape == (64, 64, 3)
    # the detected map really is the (inverted) canny of the input square
    edges = 255 - np.asarray(
        Image.open(io.BytesIO(base64.b64decode(out["images"][0])))
    )
    assert (edges > 0).sum() > 50  # the square outline fired


def test_generate_multipart_form(server_url):
    boundary = "testboundary42"
    png = base64.b64decode(_png_b64(make_input()))
    parts = []

    def field(name, value):
        parts.append(
            f'--{boundary}\r\nContent-Disposition: form-data; name="{name}"'
            f"\r\n\r\n{value}\r\n".encode()
        )

    parts.append(
        (f'--{boundary}\r\nContent-Disposition: form-data; name="image"; '
         f'filename="in.png"\r\nContent-Type: image/png\r\n\r\n').encode()
        + png + b"\r\n"
    )
    field("prompt", "a red square")
    field("num_samples", "1")
    field("image_resolution", "64")
    field("ddim_steps", "2")
    field("seed", "3")
    parts.append(f"--{boundary}--\r\n".encode())
    body = b"".join(parts)
    resp = urllib.request.urlopen(
        urllib.request.Request(
            f"{server_url}/generate", data=body,
            headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
        ),
        timeout=600,
    )
    html = resp.read().decode()
    assert resp.status == 200
    assert html.count("data:image/png;base64,") == 2
