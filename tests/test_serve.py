"""HTTP serving layer: healthz + generate round-trip over a real socket
against the tiny pipeline (rebuild addition; the reference ships batch
scripts only)."""

import base64
import io
import json
import threading
import urllib.request
from http.server import HTTPServer

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reflecting_reality_tpu.cli.serve import PipelineServer, make_handler
from reflecting_reality_tpu.data.tokenizer import HashTokenizer
from reflecting_reality_tpu.models.brushnet import BrushNetModel
from reflecting_reality_tpu.models.clip_text import CLIPTextModel
from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel
from reflecting_reality_tpu.models.vae import AutoencoderKL
from reflecting_reality_tpu.pipelines.brushnet_pipeline import (
    StableDiffusionBrushNetPipeline,
)

H = W = 64


@pytest.fixture(scope="module")
def tiny_pipe():
    cfg = dict(
        block_out_channels=(8, 16, 16, 16),
        attention_head_dim=2,
        cross_attention_dim=32,
        norm_num_groups=4,
        layers_per_block=2,
    )
    unet = UNet2DConditionModel(sample_size=8, **cfg)
    brushnet = BrushNetModel(conditioning_channels=6, **cfg)
    vae = AutoencoderKL(block_out_channels=(8, 8, 8, 8), norm_num_groups=4)
    text = CLIPTextModel(vocab_size=1000, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=64)
    rngs = jax.random.split(jax.random.PRNGKey(0), 4)
    sample = jnp.zeros((1, 8, 8, 4))
    t = jnp.array([1])
    ehs = jnp.zeros((1, 77, 32))
    return StableDiffusionBrushNetPipeline(
        vae=(vae, vae.init(rngs[2], jnp.zeros((1, H, W, 3)), jax.random.PRNGKey(9))),
        text_encoder=(text, text.init(rngs[3], jnp.zeros((1, 77), jnp.int32))),
        tokenizer=HashTokenizer(vocab_size=1000),
        unet=(unet, unet.init(rngs[0], sample, t, ehs)),
        brushnet=(brushnet, brushnet.init(rngs[1], sample, t, ehs,
                                          jnp.zeros((1, 8, 8, 6)))),
        depth_conditioning_mode="concat",
    )


@pytest.fixture(scope="module")
def served(tiny_pipe):
    pipe = tiny_pipe
    server = PipelineServer(pipe, default_steps=2)
    httpd = HTTPServer(("127.0.0.1", 0), make_handler(server))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _payload(seed=0):
    rng = np.random.RandomState(7)
    mask = np.zeros((H, W, 3), np.float32)
    mask[16:48, 16:48] = 1.0
    return {
        "prompt": "a mirror",
        "image": rng.rand(H, W, 3).astype(np.float32).tolist(),
        "mask": mask.tolist(),
        "depth": rng.rand(H, W, 1).astype(np.float32).tolist(),
        "num_inference_steps": 2,
        "seed": seed,
    }


def test_healthz(served):
    with urllib.request.urlopen(served + "/healthz", timeout=60) as r:
        body = json.loads(r.read())
    assert r.status == 200 and body["status"] == "ok"


def test_generate_roundtrip(served):
    from PIL import Image

    status, body = _post(served + "/generate", _payload())
    assert status == 200, body
    assert len(body["images"]) == 1 and body["latency_s"] > 0
    img = Image.open(io.BytesIO(base64.b64decode(body["images"][0])))
    assert img.size == (W, H)

    # warm-path determinism: same seed, same bytes
    status2, body2 = _post(served + "/generate", _payload())
    assert status2 == 200 and body2["images"] == body["images"]


def test_generate_b64_png_input(served):
    from PIL import Image

    def png_b64(arr):
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    rng = np.random.RandomState(7)
    mask = np.zeros((H, W), np.uint8)
    mask[16:48, 16:48] = 255
    payload = {
        "prompt": "a mirror",
        "image": png_b64(rng.randint(0, 256, (H, W, 3), np.uint8)),
        "mask": png_b64(mask),
        "depth": rng.rand(H, W, 1).astype(np.float32).tolist(),
        "num_inference_steps": 2,
    }
    status, body = _post(served + "/generate", payload)
    assert status == 200, body


def test_generate_missing_field_400(served):
    status, body = _post(served + "/generate", {"prompt": "x"})
    assert status == 400 and "missing field" in body["error"]


def test_unknown_path_404(served):
    status, body = _post(served + "/nope", {})
    assert status == 404


def test_decode_image_bit_depths():
    """PNG decode honors the actual bit depth: 16-bit PNGs decode to [0,1]
    by /65535, uint8 by /255 (a 16-bit depth map used to come out ~257x
    too hot — advisor finding, round 1)."""
    import base64
    import io

    import numpy as np
    from PIL import Image

    from reflecting_reality_tpu.cli.serve import _decode_image

    def b64_of(img):
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    a16 = np.linspace(0, 65535, 32 * 32).reshape(32, 32).astype(np.uint16)
    out16 = _decode_image(b64_of(Image.fromarray(a16)), channels=1)
    assert out16.min() == 0.0 and abs(out16.max() - 1.0) < 1e-4

    a8 = np.full((8, 8), 255, np.uint8)
    out8 = _decode_image(b64_of(Image.fromarray(a8)), channels=1)
    assert abs(out8.max() - 1.0) < 1e-6

    # float arrays pass through untouched
    arr = np.linspace(-1, 1, 64).reshape(8, 8).astype(np.float32)
    np.testing.assert_array_equal(_decode_image(arr.tolist(), channels=1)[..., 0], arr)


def _distinct_payload(seed):
    """Per-seed distinct image/depth so batched requests are real work."""
    rng = np.random.RandomState(100 + seed)
    mask = np.zeros((H, W, 3), np.float32)
    mask[16:48, 16:48] = 1.0
    return {
        "prompt": f"a mirror {seed}",
        "image": rng.rand(H, W, 3).astype(np.float32).tolist(),
        "mask": mask.tolist(),
        "depth": rng.rand(H, W, 1).astype(np.float32).tolist(),
        "num_inference_steps": 2,
        "seed": seed,
        "deterministic_vae_encode": True,
    }


class TestBatchingServer:
    """Micro-batched serving (BatchingPipelineServer): request parity,
    drain compatibility, bucket padding, and live concurrent round-trip."""

    @pytest.mark.medium
    def test_batched_matches_solo(self, tiny_pipe):
        """3 distinct requests through one padded bucket-4 batched call ==
        the 3 solo pipeline calls (deterministic VAE encode; per-request
        seeds travel as pre-drawn latents)."""
        from reflecting_reality_tpu.cli.serve import (
            BatchingPipelineServer,
            _Pending,
            _parse_payload,
        )

        srv = BatchingPipelineServer(tiny_pipe, default_steps=2, max_batch=4)
        srv.close()  # stop the worker; drive _execute directly (deterministic)
        payloads = [_distinct_payload(s) for s in (0, 3, 11)]
        reqs = [_Pending(_parse_payload(p, tiny_pipe, 2)) for p in payloads]
        srv._execute(reqs)
        assert srv.batches == 1 and srv.batched_requests == 3
        for p, r in zip(payloads, reqs):
            assert r.batch_size == 3 and len(r.images) == 1
            solo = tiny_pipe(**_parse_payload(p, tiny_pipe, 2))
            diff = np.abs(solo[0].astype(np.int16) - r.images[0].astype(np.int16))
            assert diff.max() <= 1, f"seed {p['seed']}: max uint8 diff {diff.max()}"

    def test_batched_num_images_per_prompt(self, tiny_pipe):
        """nip>1 in a batch: outputs split per request, 2 images each,
        matching the solo call's images."""
        from reflecting_reality_tpu.cli.serve import (
            BatchingPipelineServer,
            _Pending,
            _parse_payload,
        )

        srv = BatchingPipelineServer(tiny_pipe, default_steps=2, max_batch=2)
        srv.close()
        payloads = [dict(_distinct_payload(s), num_images_per_prompt=2)
                    for s in (1, 7)]
        reqs = [_Pending(_parse_payload(p, tiny_pipe, 2)) for p in payloads]
        srv._execute(reqs)
        for p, r in zip(payloads, reqs):
            assert len(r.images) == 2
            solo = tiny_pipe(**_parse_payload(p, tiny_pipe, 2))
            for k in range(2):
                diff = np.abs(solo[k].astype(np.int16) - r.images[k].astype(np.int16))
                assert diff.max() <= 1

    def test_drain_splits_incompatible(self, tiny_pipe):
        """_drain groups only requests sharing the compiled-call key; an
        incompatible request (different steps) goes back to the queue."""
        from reflecting_reality_tpu.cli.serve import (
            BatchingPipelineServer,
            _Pending,
            _parse_payload,
        )

        srv = BatchingPipelineServer(tiny_pipe, default_steps=2, max_batch=8)
        srv.close()
        a1 = _Pending(_parse_payload(_distinct_payload(0), tiny_pipe, 2))
        a2 = _Pending(_parse_payload(_distinct_payload(1), tiny_pipe, 2))
        other = _Pending(_parse_payload(
            dict(_distinct_payload(2), num_inference_steps=3), tiny_pipe, 2))
        srv._queue.put(a2)
        srv._queue.put(other)
        batch = srv._drain(a1)
        assert batch == [a1, a2]
        assert srv._queue.get_nowait() is other

    def test_batch_window_accumulates(self, tiny_pipe):
        """batch_window_s holds a partial batch for late-arriving compatible
        requests: two requests 0.5 s apart land in ONE batched call instead
        of two solo calls."""
        import time

        from reflecting_reality_tpu.cli.serve import BatchingPipelineServer

        srv = BatchingPipelineServer(tiny_pipe, default_steps=2, max_batch=4,
                                     batch_window_s=10.0)
        try:
            results = {}

            def go(k, delay):
                time.sleep(delay)
                results[k] = srv.generate(_distinct_payload(k))

            threads = [threading.Thread(target=go, args=(0, 0.0)),
                       threading.Thread(target=go, args=(1, 0.5))]
            for th in threads:
                th.start()
            for th in threads:
                th.join()
            assert results[0]["batch_size"] == 2
            assert results[1]["batch_size"] == 2
            assert srv.stats()["batches"] == 1
        finally:
            srv.close()

    def test_concurrent_http_roundtrip(self, tiny_pipe):
        """Live worker + ThreadingHTTPServer: concurrent posts all succeed,
        bytes match the solo server, healthz reports batch stats."""
        from http.server import ThreadingHTTPServer

        from reflecting_reality_tpu.cli.serve import (
            BatchingPipelineServer,
            make_handler,
        )

        server = BatchingPipelineServer(tiny_pipe, default_steps=2, max_batch=4)
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        url = f"http://127.0.0.1:{httpd.server_port}"
        try:
            results = [None] * 3
            def go(k):
                results[k] = _post(url + "/generate", _distinct_payload(k))

            threads = [threading.Thread(target=go, args=(k,)) for k in range(3)]
            for th in threads:
                th.start()
            for th in threads:
                th.join()
            from PIL import Image

            def pixels(b64png):
                return np.asarray(
                    Image.open(io.BytesIO(base64.b64decode(b64png)))
                ).astype(np.int16)

            for k, (status, body) in enumerate(results):
                assert status == 200, body
                assert len(body["images"]) == 1 and body["batch_size"] >= 1
                solo_status, solo_body = _post(
                    url + "/generate", _distinct_payload(k))
                assert solo_status == 200
                # batched vs solo programs may differ by 1 uint8 step from
                # batch-size-dependent XLA fusion; the content must match
                diff = np.abs(pixels(solo_body["images"][0])
                              - pixels(body["images"][0]))
                assert diff.max() <= 1, f"seed {k}: max diff {diff.max()}"
            with urllib.request.urlopen(url + "/healthz", timeout=60) as r:
                stats = json.loads(r.read())
            assert stats["requests"] == 6 and stats["batches"] >= 2
            assert stats["max_batch"] == 4
        finally:
            httpd.shutdown()
            server.close()

    def test_worker_error_recovery(self, tiny_pipe):
        """A request the pipeline rejects (no depth on a depth-conditioned
        model) 400s without wedging the worker; the next request succeeds."""
        from http.server import ThreadingHTTPServer

        from reflecting_reality_tpu.cli.serve import (
            BatchingPipelineServer,
            make_handler,
        )

        server = BatchingPipelineServer(tiny_pipe, default_steps=2, max_batch=2)
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        url = f"http://127.0.0.1:{httpd.server_port}"
        try:
            bad = _distinct_payload(0)
            del bad["depth"]
            status, body = _post(url + "/generate", bad)
            assert status == 400 and "depth" in body["error"]
            status, body = _post(url + "/generate", _distinct_payload(1))
            assert status == 200, body
        finally:
            httpd.shutdown()
            server.close()

    @pytest.mark.medium
    def test_data_parallel_micro_batching(self, tiny_pipe):
        """DP generation + micro-batching: buckets pad up to a mesh
        multiple so the sharded batch divides evenly; a solo request on a
        2-device mesh still works (padded to 2) and matches the non-DP
        output."""
        from reflecting_reality_tpu.cli.serve import (
            BatchingPipelineServer,
            _Pending,
            _parse_payload,
        )
        from reflecting_reality_tpu.parallel.mesh import make_mesh

        solo = tiny_pipe(**_parse_payload(_distinct_payload(0), tiny_pipe, 2))

        tiny_pipe.enable_data_parallel(make_mesh(2))
        try:
            srv = BatchingPipelineServer(tiny_pipe, default_steps=2, max_batch=4)
            srv.close()
            # 1 request -> bucket pads 1 -> 2 (mesh multiple)
            req = _Pending(_parse_payload(_distinct_payload(0), tiny_pipe, 2))
            srv._execute([req])
            assert req.batch_size == 1 and len(req.images) == 1
            diff = np.abs(solo[0].astype(np.int16) - req.images[0].astype(np.int16))
            assert diff.max() <= 1, f"max diff {diff.max()}"
            # 3 requests -> bucket 4 (already a mesh multiple)
            reqs = [_Pending(_parse_payload(_distinct_payload(s), tiny_pipe, 2))
                    for s in (0, 1, 2)]
            srv._execute(reqs)
            assert all(len(r.images) == 1 for r in reqs)
        finally:
            tiny_pipe.disable_data_parallel()

    @pytest.mark.medium
    def test_backpressure_503(self, tiny_pipe):
        """max_queue sheds load with 503 instead of growing unbounded
        latency; a request after the queue drains succeeds."""
        from reflecting_reality_tpu.cli.serve import (
            BatchingPipelineServer,
            OverloadedError,
            _Pending,
            _parse_payload,
        )

        srv = BatchingPipelineServer(tiny_pipe, default_steps=2,
                                     max_batch=2, max_queue=1)
        srv.close()  # no worker: queued items stay pending
        srv._queue.put(_Pending(_parse_payload(_distinct_payload(0),
                                               tiny_pipe, 2)))
        with pytest.raises(OverloadedError):
            srv.generate(_distinct_payload(1))
        assert srv.stats()["rejected"] == 1
        # drain manually; the next admission check passes
        first = srv._queue.get_nowait()
        srv._execute([first])
        assert len(first.images) == 1
        assert srv._queue.qsize() == 0


@pytest.mark.medium
def test_dispatch_per_step_payload(served):
    """payload dispatch='per_step' routes through the chunked-segment path
    and matches the scan output (segment==scan parity is golden-pinned in
    the pipeline tests; this pins the serving plumbing)."""
    scan_status, scan_body = _post(served + "/generate", _payload())
    p = dict(_payload(), dispatch="per_step")
    ps_status, ps_body = _post(served + "/generate", p)
    assert scan_status == 200 and ps_status == 200, (scan_body, ps_body)

    def pixels(b64png):
        from PIL import Image

        return np.asarray(
            Image.open(io.BytesIO(base64.b64decode(b64png)))).astype(np.int16)

    diff = np.abs(pixels(scan_body["images"][0]) - pixels(ps_body["images"][0]))
    assert diff.max() <= 1, f"max diff {diff.max()}"


@pytest.mark.medium
def test_warmup_compiles_batch_bucket(tiny_pipe):
    """warmup() on a batching server pre-compiles both the solo program and
    the full max_batch bucket."""
    from reflecting_reality_tpu.cli.serve import BatchingPipelineServer, warmup

    srv = BatchingPipelineServer(tiny_pipe, default_steps=2, max_batch=2)
    try:
        warmup(srv, H, 2, depth=True)
        assert srv.requests == 1          # the solo warmup request
        assert srv.batched_requests >= 2  # plus the full-bucket _execute
    finally:
        srv.close()
