#!/usr/bin/env python
"""Production HTTP serving front-end over the micro-batching engine.

Beyond-reference (the reference serves demos only, one gradio request at a
time — apps/gradio_canny2image.py): this is a deployment entry point. A
stdlib ThreadingHTTPServer accepts concurrent JSON requests; every request
becomes one image rendered through `controllora_tpu.serving.BatchingEngine`,
which coalesces concurrent traffic into bucketed per-image-prompt batches at
the bench-measured per-chip optimum (docs/BENCHMARKS.md). Works with any model
family and any serving mesh (data / cfg / model axes).

    python scripts/serve.py --model_variant sd15 \
        --pretrained_model_name_or_path /ckpts/sd15 \
        --control_lora_dir runs/canny --port 8000 --serving_mesh data,cfg

API:
    GET  /healthz  -> 200 "ok"
    GET  /stats    -> engine + process statistics JSON
    POST /generate -> JSON request:
        {"prompt": str, "negative_prompt": str, "steps": int, "seed": int,
         "guidance_scale": float, "width": int, "height": int,
         "guide": <base64 PNG, optional — annotator-space condition image>}
      response: {"image": <base64 PNG>, "seconds": float}
"""

import argparse
import base64
import json
import os
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained_model_name_or_path", type=str, default=None)
    p.add_argument("--model_variant", type=str, default="sd15")
    p.add_argument("--control_lora_dir", type=str, default=None)
    p.add_argument("--scheduler", type=str, default="dpm++",
                   choices=("dpm++", "ddim", "pndm", "euler", "unipc"))
    p.add_argument("--serving_mesh", type=str, default=None,
                   help="'data' | 'cfg' | 'cfg,model=K' | 'data,cfg' …")
    p.add_argument("--host", type=str, default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_wait_ms", type=float, default=25.0)
    p.add_argument("--buckets", type=str, default="1,2,4",
                   help="allowed batch shapes (compiled once each); "
                        "bench-measured optimum is 4 per chip")
    p.add_argument("--warmup", action="store_true",
                   help="compile every bucket at 512^2/20 steps before listening "
                        "(guided AND unguided programs when a ControlLoRA is loaded)")
    p.add_argument("--result_timeout_s", type=float, default=600.0,
                   help="per-request cap on waiting for the engine; 504 past it")
    p.add_argument("--preset", type=str, default="exact",
                   choices=("exact", "tome", "turbo"),
                   help="speed/quality preset (docs/BENCHMARKS.md 'accelerated "
                        "presets', TPU-measured): exact = bitwise-faithful "
                        "sampler; tome = token merging 0.5 (+7%% at 512^2 b4); "
                        "turbo = ToMe 0.5 + DeepCache interval 2 (+37%%). "
                        "Explicit --tome_ratio/--deepcache_interval override "
                        "the preset's value")
    p.add_argument("--tome_ratio", type=float, default=None,
                   help="deployment-wide token merging (0 = exact; 0.5 = "
                        "published sweet spot) applied to every batch")
    p.add_argument("--deepcache_interval", type=int, default=None,
                   help="deployment-wide DeepCache interval (1 = exact; 2-3 = "
                        "published speed/quality range) applied to every batch")
    args = p.parse_args(argv)
    preset = {"exact": (0.0, 1), "tome": (0.5, 1), "turbo": (0.5, 2)}[args.preset]
    if args.tome_ratio is None:
        args.tome_ratio = preset[0]
    if args.deepcache_interval is None:
        args.deepcache_interval = preset[1]
    return args


def build_pipeline(args):
    import jax
    import jax.numpy as jnp

    from controllora_tpu.data.tokenizer import default_tokenizer
    from controllora_tpu.models import zoo
    from controllora_tpu.models.control_lora import ControlLoRA
    from controllora_tpu.pipelines import StableDiffusionControlLoRAPipeline
    from controllora_tpu.schedulers import (
        DDIMScheduler, DPMSolverMultistepScheduler, EulerDiscreteScheduler,
        PNDMScheduler, UniPCMultistepScheduler,
    )
    from scripts.sample import build_serving_mesh

    dtype = (jnp.bfloat16 if args.model_variant in ("sd15", "sd21", "sdxl")
             else jnp.float32)
    unet, vae, text_encoder = zoo.build_models(args.model_variant, dtype=dtype)
    if args.pretrained_model_name_or_path:
        frozen = zoo.load_frozen(args.pretrained_model_name_or_path,
                                 param_dtype=dtype)
    else:
        frozen = zoo.random_frozen(jax.random.PRNGKey(0), unet, vae, text_encoder,
                                   latent_size=64, param_dtype=dtype)
        print("WARNING: random frozen stack (no pretrained weights)")
    control_lora = control_params = None
    if args.control_lora_dir:
        from controllora_tpu.training.checkpoint import load_control_lora

        control_params, ccfg = load_control_lora(args.control_lora_dir)
        control_lora = ControlLoRA(ccfg, dtype=dtype)
    scheduler = {"dpm++": DPMSolverMultistepScheduler, "ddim": DDIMScheduler,
                 "pndm": PNDMScheduler, "euler": EulerDiscreteScheduler,
                 "unipc": UniPCMultistepScheduler}[args.scheduler]()
    mesh = build_serving_mesh(args.serving_mesh)
    if mesh is not None:
        print(f"serving mesh: {dict(mesh.shape)}")
    tokenizer = default_tokenizer(
        require_clip=bool(args.pretrained_model_name_or_path))
    return StableDiffusionControlLoRAPipeline(
        unet, vae, text_encoder, tokenizer, frozen, control_lora, control_params,
        scheduler=scheduler, mesh=mesh,
    )


def build_server(engine, host: str, port: int,
                 result_timeout_s: float = 600.0) -> ThreadingHTTPServer:
    from concurrent.futures import TimeoutError as FutureTimeout

    from apps._webui import _decode_image, _png_bytes

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):
            pass

        def _send(self, code, ctype, payload: bytes):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, "text/plain", b"ok")
            elif self.path == "/stats":
                self._send(200, "application/json",
                           json.dumps(engine.stats).encode("utf-8"))
            else:
                self._send(404, "text/plain", b"not found")

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, "text/plain", b"not found")
                return
            body = self.rfile.read(int(self.headers.get("Content-Length", "0")))
            try:
                req = json.loads(body)
                kw = dict(
                    negative_prompt=str(req.get("negative_prompt", "")),
                    num_inference_steps=int(req.get("steps", 20)),
                    guidance_scale=float(req.get("guidance_scale", 9.0)),
                    height=int(req.get("height", 512)),
                    width=int(req.get("width", 512)),
                    seed=int(req.get("seed", 0)),
                )
                if req.get("guide"):
                    g = _decode_image(base64.b64decode(req["guide"]))
                    kw["guide"] = g.astype(np.float32) / 127.5 - 1.0
                t0 = time.monotonic()
                # bounded wait: a wedged/stopped engine worker must not pin
                # this connection (and its server thread) forever
                img = engine.submit(str(req.get("prompt", "")), **kw).result(
                    timeout=result_timeout_s)
                payload = json.dumps({
                    "image": base64.b64encode(_png_bytes(img)).decode("ascii"),
                    "seconds": round(time.monotonic() - t0, 3),
                }).encode("utf-8")
                self._send(200, "application/json", payload)
            except FutureTimeout:
                self._send(504, "application/json", json.dumps({
                    "error": f"render exceeded {result_timeout_s:.0f}s engine budget"
                }).encode("utf-8"))
            except Exception as e:
                self._send(500, "application/json",
                           json.dumps({"error": str(e)}).encode("utf-8"))

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    args = parse_args(argv)
    from controllora_tpu.serving import BatchingEngine

    pipe = build_pipeline(args)
    buckets = tuple(int(b) for b in args.buckets.split(","))
    speed_kw = {}
    if args.tome_ratio:
        speed_kw["tome_ratio"] = args.tome_ratio
    if args.deepcache_interval > 1:
        speed_kw["deepcache_interval"] = args.deepcache_interval
    engine = BatchingEngine(pipe, max_wait_ms=args.max_wait_ms, buckets=buckets,
                            pipe_kwargs=speed_kw)
    if args.warmup:
        # compile each bucket's program before taking traffic — engine.buckets
        # (mesh-snapped), and BOTH the unguided and guided programs when a
        # ControlLoRA is loaded (they are distinct compiled samplers: use_control
        # is part of the sampler cache key)
        variants = [dict()]
        if pipe.control_lora is not None:
            variants.append(dict(
                guide=np.zeros((512, 512, 3), np.float32)))
        for kw in variants:
            for b in engine.buckets:
                futs = [engine.submit(f"warmup {i}", num_inference_steps=20, **kw)
                        for i in range(b)]
                for f in futs:
                    f.result()
        print(f"warmup done: buckets {engine.buckets} compiled "
              f"({'guided+unguided' if len(variants) == 2 else 'unguided'})")
    server = build_server(engine, args.host, args.port,
                          result_timeout_s=args.result_timeout_s)
    print(f"serving at http://{args.host}:{server.server_address[1]}/ "
          f"(buckets {buckets}, max_wait {args.max_wait_ms} ms)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        engine.stop()


if __name__ == "__main__":
    main()
