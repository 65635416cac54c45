"""Serving entry point: a minimal HTTP inference server around the jitted
MirrorFusion pipeline.

The reference has no serving story (batch scripts only); on TPU the pipeline
is one cached jitted program per (shape, steps) key, so a resident server
amortizes compilation across requests — first request per shape pays the
compile (or hits --compilation_cache_dir), subsequent requests run at the
benchmark rate.  Pure stdlib (http.server).

Two serving modes:
  --max_batch 1 (default): single-threaded; the chip is the serial resource
    and concurrent requests queue in the listen backlog.
  --max_batch N: micro-batching — handler threads enqueue requests, a worker
    drains up to N compatible ones into ONE batched pipeline call (padded to
    power-of-2 buckets so XLA compiles one program per bucket).  Measured
    512² throughput rises ~12% at bs4 (results.csv denoise_512_bs4); int8
    serving gains more (1.19x at bs4).  See BatchingPipelineServer.

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
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, HTTPServer, ThreadingHTTPServer
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


def _parse_payload(payload: dict, pipe, default_steps: int) -> dict:
    """Decode a /generate request into pipeline kwargs (handler thread:
    the CPU-side PNG decode overlaps the chip's work on other requests)."""
    depth = payload.get("depth")
    if depth is not None:
        depth = _decode_image(depth, channels=1)
    normals = payload.get("normals")
    if normals is not None and pipe.normals_conditioning_mode != "ip_adapter":
        normals = _decode_image(normals, channels=3)
    elif normals is not None:
        normals = np.asarray(normals, np.float32)
    return dict(
        prompt=payload["prompt"],
        image=_decode_image(payload["image"], channels=3),
        mask=_decode_image(payload["mask"], channels=3),
        depth=depth,
        normals=normals,
        num_inference_steps=int(payload.get("num_inference_steps",
                                            default_steps)),
        guidance_scale=float(payload.get("guidance_scale", 7.5)),
        negative_prompt=payload.get("negative_prompt"),
        seed=int(payload.get("seed", 0)),
        num_images_per_prompt=int(payload.get("num_images_per_prompt", 1)),
        scheduler=payload.get("scheduler", "unipc"),
        dispatch=payload.get("dispatch", getattr(pipe, "_serve_dispatch", "scan")),
        deterministic_vae_encode=bool(
            payload.get("deterministic_vae_encode", False)),
    )


class PipelineServer:
    def __init__(self, pipe, default_steps: int = 50):
        self.pipe = pipe
        self.default_steps = default_steps
        self.requests = 0

    def stats(self) -> dict:
        return {"requests": self.requests}

    def generate(self, payload: dict) -> dict:
        t0 = time.perf_counter()
        out = self.pipe(**_parse_payload(payload, self.pipe, self.default_steps))
        self.requests += 1
        return {
            "images": [_encode_png(img) for img in out],
            "latency_s": round(time.perf_counter() - t0, 3),
        }


class OverloadedError(RuntimeError):
    """Raised when the pending-request queue is full (served as HTTP 503)."""


class _Pending:
    """One queued /generate request: parsed kwargs + a completion event."""

    __slots__ = ("parsed", "event", "images", "error", "batch_size")

    def __init__(self, parsed):
        self.parsed = parsed
        self.event = threading.Event()
        self.images = None
        self.error = None
        self.batch_size = 0


class BatchingPipelineServer(PipelineServer):
    """Micro-batching front end for the single-chip pipeline.

    The chip is the serial resource, and the measured MXU efficiency rises
    with batch (512²: 0.82 images/s at bs1 -> 0.92 at bs4, results.csv), so
    while one batch denoises, newly arrived requests accumulate in a queue;
    when the worker frees up it drains up to `max_batch` COMPATIBLE requests
    (same image shape / steps / guidance / scheduler / ...) into one batched
    pipeline call.  Batches are padded up to power-of-2 buckets so XLA
    compiles one program per bucket size, not per arrival pattern.

    Per-request seeds are honored exactly: the worker pre-draws each
    request's initial noise with the same PRNG-key derivation the pipeline
    uses for a solo call and passes the stacked noise via `latents`.  (The
    one batch-level difference: the stochastic VAE encode of the
    conditioning image draws from a single batch key; send
    "deterministic_vae_encode": true for bit-identical solo/batched
    results.)  Incompatible requests are re-queued and served in a later
    batch — arrival order is preserved per compatibility class, not
    globally.
    """

    def __init__(self, pipe, default_steps: int = 50, max_batch: int = 4,
                 max_queue: Optional[int] = None,
                 batch_window_s: float = 0.0):
        super().__init__(pipe, default_steps)
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self.max_batch = max_batch
        self.max_queue = max_queue
        # batch_window_s > 0: when the worker frees up with a partial batch,
        # wait up to this long for more compatible arrivals before launching.
        # Trades p50 latency for batch occupancy — worth it when request
        # parsing trickles arrivals slower than the chip drains them (the
        # batched call's marginal image cost is far below the solo call's).
        self.batch_window_s = batch_window_s
        self.batches = 0
        self.batched_requests = 0
        self.rejected = 0
        self._queue: "queue.Queue[Optional[_Pending]]" = queue.Queue()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def stats(self) -> dict:
        return {
            "requests": self.requests,
            "batches": self.batches,
            "mean_batch_size": round(
                self.batched_requests / max(1, self.batches), 3),
            "queue_depth": self._queue.qsize(),
            "max_batch": self.max_batch,
            "rejected": self.rejected,
        }

    def close(self):
        self._queue.put(None)
        self._worker.join(timeout=30)

    # -- handler side ------------------------------------------------------

    def generate(self, payload: dict) -> dict:
        t0 = time.perf_counter()
        if self.max_queue is not None and self._queue.qsize() >= self.max_queue:
            # backpressure: shed load instead of growing unbounded latency
            self.rejected += 1
            raise OverloadedError(
                f"queue full ({self.max_queue} pending); retry later")
        req = _Pending(_parse_payload(payload, self.pipe, self.default_steps))
        self._queue.put(req)
        req.event.wait()
        if req.error is not None:
            raise req.error
        self.requests += 1
        return {
            "images": [_encode_png(img) for img in req.images],
            "latency_s": round(time.perf_counter() - t0, 3),
            "batch_size": req.batch_size,
        }

    # -- worker side -------------------------------------------------------

    @staticmethod
    def _key(parsed: dict):
        """Requests sharing this key can share one compiled batched call."""
        def shp(x):
            return None if x is None else tuple(np.shape(x))

        return (
            shp(parsed["image"]), shp(parsed["mask"]), shp(parsed["depth"]),
            shp(parsed["normals"]), parsed["num_inference_steps"],
            parsed["guidance_scale"], parsed["negative_prompt"],
            parsed["num_images_per_prompt"], parsed["scheduler"],
            parsed["dispatch"], parsed["deterministic_vae_encode"],
        )

    def _drain(self, first: _Pending) -> list:
        """Collect up to max_batch requests compatible with `first`;
        incompatible ones go back to the queue tail."""
        batch, putback = [first], []
        key = self._key(first.parsed)
        for _ in range(self._queue.qsize()):
            if len(batch) >= self.max_batch:
                break
            try:
                nxt = self._queue.get_nowait()
            except queue.Empty:
                break
            if nxt is None:
                putback.append(nxt)  # keep the shutdown sentinel queued
            elif self._key(nxt.parsed) == key:
                batch.append(nxt)
            else:
                putback.append(nxt)
        for item in putback:
            self._queue.put(item)
        return batch

    def _wait_window(self, batch, key):
        """Hold a partial batch up to batch_window_s for compatible
        arrivals; incompatible ones are set aside (not re-examined) and
        returned to the queue when the window closes."""
        deadline = time.perf_counter() + self.batch_window_s
        putback = []
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:  # shutdown sentinel: keep it queued, stop waiting
                putback.append(nxt)
                break
            if self._key(nxt.parsed) == key:
                batch.append(nxt)
            else:
                putback.append(nxt)
        for item in putback:
            self._queue.put(item)
        return batch

    def _run(self):
        while True:
            first = self._queue.get()
            if first is None:
                return
            batch = self._drain(first)
            if self.batch_window_s > 0 and len(batch) < self.max_batch:
                batch = self._wait_window(batch, self._key(first.parsed))
            try:
                self._execute(batch)
            except Exception as e:  # delivered to every waiting handler
                for req in batch:
                    req.error = e
            finally:
                for req in batch:
                    req.event.set()

    def _execute(self, batch: list) -> None:
        import jax
        import jax.numpy as jnp

        pipe = self.pipe
        n = len(batch)
        nip = batch[0].parsed["num_images_per_prompt"]
        bucket = min(1 << (n - 1).bit_length(), self.max_batch)
        if getattr(pipe, "_dp_mesh", None) is not None:
            # data-parallel generation shards batch_size = bucket * nip over
            # the mesh, so pad the bucket until it divides evenly
            # (multi-chip serving: max_batch == k * mesh size)
            mesh_n = pipe._dp_mesh[0].devices.size
            while (bucket * nip) % mesh_n:
                bucket += 1
        # pad with copies of the last request; padded outputs are dropped
        parsed = [r.parsed for r in batch] + [batch[-1].parsed] * (bucket - n)
        p0 = parsed[0]

        def stack(name):
            vals = [q[name] for q in parsed]
            if vals[0] is None:
                return None
            out = np.stack(vals, axis=0)
            # interleaved per-prompt repeat, matching encode_prompt's
            # jnp.repeat(cond, num_images_per_prompt, axis=0)
            return np.repeat(out, nip, axis=0) if nip > 1 else out

        image = stack("image")
        h, w = image.shape[1:3]
        hl, wl = h // pipe.vae_scale_factor, w // pipe.vae_scale_factor
        ch = pipe.unet_module.in_channels
        # per-request initial noise, exactly the solo-call derivation:
        # rng_noise = split(PRNGKey(seed), 4)[0]
        keys = jnp.stack([
            jax.random.split(jax.random.PRNGKey(q["seed"]), 4)[0]
            for q in parsed
        ])
        noise = jax.vmap(
            lambda k: jax.random.normal(k, (nip, hl, wl, ch), jnp.float32)
        )(keys).reshape(bucket * nip, hl, wl, ch)

        out = pipe(
            prompt=[q["prompt"] for q in parsed],
            image=image,
            mask=stack("mask"),
            depth=stack("depth"),
            normals=stack("normals"),
            num_inference_steps=p0["num_inference_steps"],
            guidance_scale=p0["guidance_scale"],
            negative_prompt=p0["negative_prompt"],
            num_images_per_prompt=nip,
            seed=p0["seed"],          # batch-level key for the VAE encode
            latents=noise,
            scheduler=p0["scheduler"],
            dispatch=p0["dispatch"],
            deterministic_vae_encode=p0["deterministic_vae_encode"],
        )
        for k, req in enumerate(batch):
            req.images = out[k * nip:(k + 1) * nip]
            req.batch_size = n
        self.batches += 1
        self.batched_requests += n


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
                    **server.stats(),
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
            except OverloadedError as e:
                self._reply(503, {"error": str(e)})
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
    if args.data_parallel:
        import jax

        from reflecting_reality_tpu.parallel.mesh import make_mesh

        pipe.enable_data_parallel(make_mesh(len(jax.devices())))
    # default denoise dispatch for requests that don't specify one:
    # "per_step" compiles k-step segments instead of the full scan, cutting
    # time-to-first-request at high resolutions (1024² scan: tens of
    # minutes cold; segments: ~1-2 min) at equal warm throughput
    pipe._serve_dispatch = args.dispatch
    return pipe


def warmup(server: PipelineServer, resolution: int, steps: int, depth: bool,
           normals_mode: Optional[str] = None):
    """Compile the (resolution, steps) programs before accepting traffic —
    the solo call plus, under micro-batching, the full max_batch bucket.
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
    if getattr(server, "max_batch", 1) > 1:
        # compile the full max_batch bucket so the first real batch runs
        # warm (driving _execute directly guarantees the bucket size;
        # queue-raced warmup requests might batch smaller)
        reqs = [_Pending(_parse_payload(dict(payload), server.pipe, steps))
                for _ in range(server.max_batch)]
        server._execute(reqs)
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
    p.add_argument("--data_parallel", action="store_true",
                   help="shard each batched call over all local chips "
                        "(pair with --max_batch >= device count; buckets "
                        "pad up to a mesh multiple)")
    p.add_argument("--max_batch", type=int, default=1,
                   help="micro-batching: drain up to N queued compatible "
                        "requests into one batched pipeline call (padded to "
                        "power-of-2 buckets; ~12%% more images/s at bs4). "
                        "1 = serial single-request serving")
    p.add_argument("--dispatch", type=str, default="scan",
                   choices=["scan", "per_step"],
                   help="denoise dispatch: 'scan' (one compiled loop, best "
                        "steady-state) or 'per_step' (chunked segments, much "
                        "faster first-request compile at high resolutions)")
    p.add_argument("--attention_backend", type=str, default="flash",
                   choices=["flash", "xla"],
                   help="attention kernel: 'flash' (Pallas, 2.7x at 4096 "
                        "tokens) or 'xla' (einsum)")
    p.add_argument("--batch_window", type=float, default=0.0,
                   help="with --max_batch > 1: hold a partial batch up to "
                        "this many seconds for more compatible requests "
                        "before launching (raises batch occupancy when "
                        "arrivals trickle; adds up to the window to p50)")
    p.add_argument("--max_queue", type=int, default=None,
                   help="backpressure: 503 new requests when this many are "
                        "already pending (micro-batching mode only)")
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

    from reflecting_reality_tpu.ops.attention import set_attention_backend

    # flash by default — 2.7x at the 4096-token self-attention; short/wide
    # shapes still route to XLA inside dot_product_attention
    set_attention_backend(args.attention_backend)
    pipe = build_pipeline(args)
    if args.max_batch > 1:
        # concurrent handler threads feed the worker's queue; the chip
        # stays the serial resource behind the micro-batcher
        server = BatchingPipelineServer(
            pipe, default_steps=args.num_inference_steps,
            max_batch=args.max_batch, max_queue=args.max_queue,
            batch_window_s=args.batch_window,
        )
        server_cls = ThreadingHTTPServer
    else:
        server = PipelineServer(pipe, default_steps=args.num_inference_steps)
        server_cls = HTTPServer
    if args.warmup:
        warmup(server, args.warmup, args.num_inference_steps,
               depth=args.depth_conditioning_mode is not None,
               normals_mode=args.normals_conditioning_mode)

    httpd = server_cls((args.host, args.port), make_handler(server))
    logger.info("serving on http://%s:%d (max_batch=%d)",
                args.host, args.port, args.max_batch)
    httpd.serve_forever()


if __name__ == "__main__":
    main()
