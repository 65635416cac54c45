"""Serving entry point: a minimal HTTP inference server around the jitted
MirrorFusion pipeline.

The reference has no serving story (batch scripts only); on TPU the pipeline
is one cached jitted program per (shape, steps) key, so a resident server
amortizes compilation across requests — first request per shape pays the
compile (or hits --compilation_cache_dir), subsequent requests run at the
benchmark rate.  Pure stdlib (http.server), single-threaded by design: the
chip is the serial resource; concurrent requests queue in the listen backlog.

API (JSON in, JSON out; images as base64 PNG or nested float lists):

  GET  /healthz           -> {"status": "ok", "device": "...", "requests": N}
  POST /generate          body: {
      "prompt": str,                       required
      "image": b64 PNG | [[..]],          required (masked image)
      "mask": b64 PNG | [[..]],           required (white = mirror region)
      "depth": b64 PNG | [[..]],          when the model is depth-conditioned
      "normals": ...,                      per normals_conditioning_mode
      "num_inference_steps": int = 50, "guidance_scale": float = 7.5,
      "seed": int = 0, "num_images_per_prompt": int = 1,
      "scheduler": "unipc" | "ddim",
    }                      -> {"images": [b64 PNG, ...], "latency_s": float}

Start: python -m reflecting_reality_tpu.cli.serve \
         --base_model_path ... --brushnet_path ... \
         --depth_conditioning_mode concat [--port 8000] [--warmup 512]
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import logging
import time
from http.server import BaseHTTPRequestHandler, HTTPServer
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)


def _decode_image(value, channels: Optional[int] = None) -> np.ndarray:
    """b64-PNG string, nested lists, or ndarray -> float32 HWC in [0, 1]
    ([-1,1] passes through untouched for pre-normalized arrays)."""
    if isinstance(value, str):
        from PIL import Image

        img = Image.open(io.BytesIO(base64.b64decode(value)))
        arr = np.asarray(img)
        if img.mode in ("I", "I;16", "I;16B", "I;16L", "I;16N"):
            # 16-bit PNG decodes to uint16/int32 with values up to 65535;
            # dividing by 255 would silently blow the [0,1] contract.
            arr = arr.astype(np.float32) / 65535.0
        elif np.issubdtype(arr.dtype, np.integer):
            arr = arr.astype(np.float32) / float(np.iinfo(arr.dtype).max)
        else:
            arr = arr.astype(np.float32)
    else:
        arr = np.asarray(value, np.float32)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if channels is not None and arr.shape[-1] != channels:
        if arr.shape[-1] == 1:
            arr = np.repeat(arr, channels, axis=-1)
        else:
            arr = arr[..., :channels]
    return arr


def _encode_png(arr: np.ndarray) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


class PipelineServer:
    def __init__(self, pipe, default_steps: int = 50):
        self.pipe = pipe
        self.default_steps = default_steps
        self.requests = 0

    def generate(self, payload: dict) -> dict:
        t0 = time.perf_counter()
        prompt = payload["prompt"]
        image = _decode_image(payload["image"], channels=3)
        mask = _decode_image(payload["mask"], channels=3)
        depth = payload.get("depth")
        if depth is not None:
            depth = _decode_image(depth, channels=1)
        normals = payload.get("normals")
        if normals is not None and self.pipe.normals_conditioning_mode != "ip_adapter":
            normals = _decode_image(normals, channels=3)
        elif normals is not None:
            normals = np.asarray(normals, np.float32)

        out = self.pipe(
            prompt=prompt,
            image=image,
            mask=mask,
            depth=depth,
            normals=normals,
            num_inference_steps=int(payload.get("num_inference_steps",
                                                self.default_steps)),
            guidance_scale=float(payload.get("guidance_scale", 7.5)),
            seed=int(payload.get("seed", 0)),
            num_images_per_prompt=int(payload.get("num_images_per_prompt", 1)),
            scheduler=payload.get("scheduler", "unipc"),
        )
        self.requests += 1
        return {
            "images": [_encode_png(img) for img in out],
            "latency_s": round(time.perf_counter() - t0, 3),
        }


def make_handler(server: PipelineServer):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                self._reply(200, {
                    "status": "ok",
                    "device": jax.devices()[0].platform,
                    "requests": server.requests,
                })
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                return self._reply(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n))
                if not isinstance(payload, dict):
                    raise ValueError("body must be a JSON object")
                self._reply(200, server.generate(payload))
            except KeyError as e:
                self._reply(400, {"error": f"missing field: {e}"})
            except (json.JSONDecodeError, ValueError, TypeError) as e:
                self._reply(400, {"error": f"bad request: {e}"})
            except Exception as e:  # surface the error to the client
                logger.exception("generate failed")
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *a):  # route through logging, not stderr
            logger.info("%s " + fmt, self.address_string(), *a)

    return Handler


def build_pipeline(args):
    import jax.numpy as jnp

    from reflecting_reality_tpu.pipelines.brushnet_pipeline import (
        StableDiffusionBrushNetPipeline,
    )

    dtype = {"fp32": jnp.float32, "bf16": jnp.bfloat16}[args.weight_dtype]
    pipe = StableDiffusionBrushNetPipeline.from_pretrained(
        args.base_model_path,
        brushnet_path=args.brushnet_path,
        unet_path=args.unet_path,
        depth_conditioning_mode=args.depth_conditioning_mode,
        normals_conditioning_mode=args.normals_conditioning_mode,
        dtype=dtype,
    )
    if args.weight_dtype == "bf16":
        pipe.cast_params()
    if args.deep_cache:
        pipe.enable_deep_cache(args.deep_cache)
    if args.encoder_reuse:
        pipe.enable_encoder_reuse(args.encoder_reuse)
    if args.int8:
        pipe.enable_int8()
    return pipe


def warmup(server: PipelineServer, resolution: int, steps: int, depth: bool,
           normals_mode: Optional[str] = None):
    """Compile the (resolution, steps) program before accepting traffic.
    ndarrays pass straight through _decode_image's array branch."""
    logger.info("warmup: compiling %dx%d @ %d steps", resolution, resolution, steps)
    t0 = time.perf_counter()
    payload = {
        "prompt": "warmup",
        "image": np.zeros((resolution, resolution, 3), np.float32),
        "mask": np.ones((resolution, resolution, 3), np.float32),
        "num_inference_steps": steps,
    }
    if depth:
        payload["depth"] = np.zeros((resolution, resolution, 1), np.float32)
    if normals_mode in ("concat", "latents"):
        payload["normals"] = np.zeros((resolution, resolution, 3), np.float32)
    elif normals_mode == "ip_adapter":
        payload["normals"] = np.array([[0.0, 0.0, 1.0]], np.float32)
    server.generate(payload)
    logger.info("warmup done in %.1fs", time.perf_counter() - t0)


def build_parser():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--base_model_path", type=str, required=True)
    p.add_argument("--brushnet_path", type=str, required=True)
    p.add_argument("--unet_path", type=str, default=None)
    p.add_argument("--depth_conditioning_mode", type=str, default=None,
                   choices=[None, "concat", "latents"])
    p.add_argument("--normals_conditioning_mode", type=str, default=None,
                   choices=[None, "concat", "latents", "ip_adapter"])
    p.add_argument("--weight_dtype", type=str, default="bf16",
                   choices=["fp32", "bf16"])
    p.add_argument("--deep_cache", type=int, default=None,
                   help="opt-in DeepCache interval (approximate, faster)")
    p.add_argument("--encoder_reuse", type=int, default=None,
                   help="opt-in encoder-reuse interval (approximate; "
                        "mutually exclusive with --deep_cache)")
    p.add_argument("--int8", action="store_true",
                   help="W8A8 quantized serving (approximate; ~1.44x the "
                        "exact denoise rate on v5e)")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--warmup", type=int, default=None, metavar="RES",
                   help="pre-compile at this resolution before serving")
    p.add_argument("--compilation_cache_dir", type=str, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from reflecting_reality_tpu.core.jit_cache import enable_compilation_cache

    enable_compilation_cache(args.compilation_cache_dir)
    pipe = build_pipeline(args)
    server = PipelineServer(pipe, default_steps=args.num_inference_steps)
    if args.warmup:
        warmup(server, args.warmup, args.num_inference_steps,
               depth=args.depth_conditioning_mode is not None,
               normals_mode=args.normals_conditioning_mode)

    httpd = HTTPServer((args.host, args.port), make_handler(server))
    logger.info("serving on http://%s:%d", args.host, args.port)
    httpd.serve_forever()


if __name__ == "__main__":
    main()
