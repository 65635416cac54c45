"""Training-step tests on the 8-device virtual CPU mesh (SURVEY.md §4:
mesh tests replace the reference's missing distributed tests — same step on
1 vs N devices must agree).

Models are 2-block miniatures and fixtures are module-scoped: each extra
`make_train_step` config costs a full XLA compile on CPU, so the variant
behaviors (train_base_unet / EMA / SNR-gamma / v-prediction) are asserted
in one combined build."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reflecting_reality_tpu.models.brushnet import BrushNetModel
from reflecting_reality_tpu.models.clip_text import CLIPTextModel
from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel
from reflecting_reality_tpu.models.vae import AutoencoderKL
from reflecting_reality_tpu.parallel.mesh import make_mesh, shard_batch, replicate_tree
from reflecting_reality_tpu.training.train_step import TrainConfig, make_train_step

CFG = dict(
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    block_out_channels=(8, 16),
    attention_head_dim=2,
    cross_attention_dim=16,
    norm_num_groups=4,
    layers_per_block=1,
)
BCFG = dict(
    down_block_types=("DownBlock2D", "DownBlock2D"),
    mid_block_type="MidBlock2D",
    up_block_types=("UpBlock2D", "UpBlock2D"),
    block_out_channels=(8, 16),
    attention_head_dim=2,
    cross_attention_dim=16,
    norm_num_groups=4,
    layers_per_block=1,
)
H = W = 16  # pixels; latents 2x2


def build(**kw):
    unet = UNet2DConditionModel(sample_size=2, **CFG)
    brushnet = BrushNetModel(conditioning_channels=6, **BCFG)
    vae = AutoencoderKL(block_out_channels=(4, 4, 4, 4), norm_num_groups=2)
    text = CLIPTextModel(vocab_size=100, hidden_size=16, num_hidden_layers=1,
                         num_attention_heads=2, intermediate_size=32)
    r = jax.random.split(jax.random.PRNGKey(0), 4)
    sample = jnp.zeros((1, 2, 2, 4))
    t = jnp.array([1])
    ehs = jnp.zeros((1, 7, 16))
    uparams = unet.init(r[0], sample, t, ehs)
    bparams = brushnet.init(r[1], sample, t, ehs, jnp.zeros((1, 2, 2, 6)))
    vparams = vae.init(r[2], jnp.zeros((1, H, W, 3)), jax.random.PRNGKey(9))
    tparams = text.init(r[3], jnp.zeros((1, 7), jnp.int32))
    config = TrainConfig(
        learning_rate=1e-3, lr_warmup_steps=0, max_train_steps=100, **kw,
    )
    step_fn, init_state = make_train_step(unet, brushnet, vae, text, config)
    state = init_state(bparams, uparams, vparams, tparams)
    return step_fn, state


def batch_of(n):
    r = np.random.RandomState(0)
    return {
        "pixel_values": jnp.asarray(r.randn(n, H, W, 3), jnp.float32),
        "conditioning_pixel_values": jnp.asarray(r.randn(n, H, W, 3), jnp.float32),
        "masks": jnp.asarray((r.rand(n, H, W, 1) > 0.5), jnp.float32),
        "depths": jnp.asarray(r.randn(n, H, W, 1), jnp.float32),
        "input_ids": jnp.asarray(r.randint(0, 100, (n, 7)), jnp.int32),
    }


@pytest.fixture(scope="module")
def default_run():
    step_fn, state = build()
    s1, m1 = jax.jit(step_fn)(state, batch_of(8), jax.random.PRNGKey(0))
    return step_fn, state, s1, m1


class TestTrainStep:
    def test_loss_finite_and_zero_convs_update(self, default_run):
        _, state, s1, m1 = default_run
        assert np.isfinite(float(m1["loss"]))
        assert int(s1.step) == 1
        zc0 = state.trainable["brushnet"]["params"]["brushnet_mid_block"]["kernel"]
        zc1 = s1.trainable["brushnet"]["params"]["brushnet_mid_block"]["kernel"]
        assert float(jnp.abs(zc1 - zc0).max()) > 0

    def test_frozen_unet_stays_frozen(self, default_run):
        _, state, s1, _ = default_run
        assert "unet" not in state.trainable
        for a, b in zip(
            jax.tree_util.tree_leaves(state.frozen["unet"]),
            jax.tree_util.tree_leaves(s1.frozen["unet"]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.medium
    def test_variant_config_combined(self):
        """train_base_unet + EMA + SNR-gamma + v-prediction in one compile."""
        step_fn, state = build(
            train_base_unet=True, use_ema=True, snr_gamma=5.0,
            prediction_type="v_prediction",
        )
        s1, m = jax.jit(step_fn)(state, batch_of(2), jax.random.PRNGKey(0))
        assert np.isfinite(float(m["loss"]))
        # base unet trained
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state.trainable["unet"], s1.trainable["unet"],
        )
        assert max(jax.tree_util.tree_leaves(diff)) > 0
        # EMA after 1 step: ramp decay = min(0.9999, 1/10) = 0.1
        e = s1.ema["brushnet"]["params"]["conv_in_condition"]["kernel"]
        p0 = state.trainable["brushnet"]["params"]["conv_in_condition"]["kernel"]
        p1 = s1.trainable["brushnet"]["params"]["conv_in_condition"]["kernel"]
        np.testing.assert_allclose(
            np.asarray(e), np.asarray(p0 * 0.1 + p1 * 0.9), rtol=1e-5, atol=1e-7
        )

    @pytest.mark.medium
    def test_ema_bf16_storage(self):
        """ema_dtype='bf16' keeps the shadow copy bf16 across updates (fp32
        accumulate, bf16 store — the 16 GB-chip memory knob)."""
        step_fn, state = build(use_ema=True, ema_dtype="bf16")
        assert all(
            leaf.dtype == jnp.bfloat16
            for leaf in jax.tree_util.tree_leaves(state.ema)
        )
        s1, m = jax.jit(step_fn)(state, batch_of(2), jax.random.PRNGKey(0))
        assert np.isfinite(float(m["loss"]))
        assert all(
            leaf.dtype == jnp.bfloat16
            for leaf in jax.tree_util.tree_leaves(s1.ema)
        )
        e = np.asarray(
            s1.ema["brushnet"]["params"]["conv_in_condition"]["kernel"],
            np.float32)
        p0 = np.asarray(state.trainable["brushnet"]["params"]["conv_in_condition"]["kernel"])
        p1 = np.asarray(s1.trainable["brushnet"]["params"]["conv_in_condition"]["kernel"])
        np.testing.assert_allclose(e, p0 * 0.1 + p1 * 0.9, rtol=1e-2, atol=1e-3)


class TestDataParallel:
    @pytest.mark.medium
    def test_mesh_step_matches_single_device(self, default_run):
        """Same global batch: 8-way sharded step == single-device step
        (the gradient psum the compiler inserts must reproduce DDP exactly)."""
        step_fn, state, s_single, m_single = default_run
        batch = batch_of(8)

        mesh = make_mesh(8)
        state_r = replicate_tree(state, mesh)
        batch_s = shard_batch(batch, mesh)
        s_mesh, m_mesh = jax.jit(step_fn)(state_r, batch_s, jax.random.PRNGKey(0))

        np.testing.assert_allclose(
            float(m_single["loss"]), float(m_mesh["loss"]), rtol=1e-5
        )
        a = np.asarray(s_single.trainable["brushnet"]["params"]["conv_in_condition"]["kernel"])
        b = np.asarray(s_mesh.trainable["brushnet"]["params"]["conv_in_condition"]["kernel"])
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


class TestTrainingOptions:
    @pytest.mark.medium
    def test_grad_accumulation_and_checkpointing(self):
        """K=2 accumulation: params move only every 2nd step; remat on."""
        step_fn, state = build(gradient_accumulation_steps=2,
                               gradient_checkpointing=True)
        step_fn = jax.jit(step_fn)
        b = batch_of(2)
        p0 = state.trainable["brushnet"]["params"]["conv_in_condition"]["kernel"]
        s1, m1 = step_fn(state, b, jax.random.PRNGKey(0))
        p1 = s1.trainable["brushnet"]["params"]["conv_in_condition"]["kernel"]
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))  # mid-accum
        s2, m2 = step_fn(s1, b, jax.random.PRNGKey(1))
        p2 = s2.trainable["brushnet"]["params"]["conv_in_condition"]["kernel"]
        assert float(jnp.abs(p2 - p1).max()) > 0                        # applied
        assert np.isfinite(float(m2["loss"]))


class TestMultihostHelpers:
    """parallel.multihost: the Accelerate barrier/gather surface in
    single-process mode (pod behavior needs real hosts; these pin the
    single-process no-op contracts the CLIs rely on)."""

    def test_single_process_surface(self):
        from reflecting_reality_tpu.parallel import multihost

        multihost.initialize()  # idempotent no-op
        assert multihost.is_main_process()
        multihost.barrier("test")  # returns immediately at process_count 1
        assert multihost.local_shard([1, 2, 3]) == [1, 2, 3]


class TestRematPolicy:
    @pytest.mark.medium
    def test_dots_policy_matches_full(self):
        """gradient_checkpointing_policy='dots' (save matmul outputs) must be
        numerically equivalent to full-graph remat — it changes only what is
        recomputed in the backward pass."""
        results = {}
        for policy in ("full", "dots"):
            step_fn, state = build(
                gradient_checkpointing=True,
                gradient_checkpointing_policy=policy,
            )
            s1, m = jax.jit(step_fn)(state, batch_of(2), jax.random.PRNGKey(0))
            results[policy] = (float(m["loss"]), float(m["grad_norm"]))
        np.testing.assert_allclose(
            results["full"], results["dots"], rtol=1e-5
        )


class TestLatentCache:
    @pytest.mark.medium
    def test_cached_moments_step_equals_direct(self):
        """A step fed precomputed VAE moments (latent_moments keys) must be
        BIT-IDENTICAL to the pixel-encoding step under the same rng: the
        cached DiagonalGaussian is the same distribution the encoder
        produces, and the stochastic draw uses the same split keys."""
        from reflecting_reality_tpu.models.vae import AutoencoderKL

        step_fn, state = build()
        batch = batch_of(2)
        rng = jax.random.PRNGKey(5)
        _, m_direct = jax.jit(step_fn)(state, batch, rng)

        vae = AutoencoderKL(block_out_channels=(4, 4, 4, 4), norm_num_groups=2)

        def moments(img):
            d = vae.apply(state.frozen["vae"], img, method=vae.encode)
            return jnp.concatenate([d.mean, d.logvar], axis=-1)

        hl = wl = H // 8
        cached = {
            "latent_moments": moments(batch["pixel_values"]),
            "cond_latent_moments": moments(batch["conditioning_pixel_values"]),
            "masks": batch["masks"],
            "depths": batch["depths"],
            "input_ids": batch["input_ids"],
        }
        _, m_cached = jax.jit(step_fn)(state, cached, rng)
        np.testing.assert_array_equal(
            np.asarray(m_direct["loss"]), np.asarray(m_cached["loss"])
        )
        # grads are mathematically identical (latents are stop_gradient'ed)
        # but the cached program fuses differently -> ulp-level reassociation
        np.testing.assert_allclose(
            np.asarray(m_direct["grad_norm"]), np.asarray(m_cached["grad_norm"]),
            rtol=1e-4,
        )

    def test_precompute_tool_and_dataset_roundtrip(self, tmp_path):
        """tools/precompute_latents.py -> LatentCachedDataset -> one train
        step through cli-style wiring on synthetic data."""
        pytest.importorskip("h5py")
        from tests.tiny_checkpoint import make_synmirror_data, make_tiny_sd_checkpoint
        from reflecting_reality_tpu.tools import precompute_latents
        from reflecting_reality_tpu.data.latent_cache import LatentCachedDataset
        from reflecting_reality_tpu.data.tokenizer import HashTokenizer
        import pandas as pd
        import os

        base = str(tmp_path / "base")
        data = str(tmp_path / "data")
        cache = str(tmp_path / "cache")
        make_tiny_sd_checkpoint(base)
        make_synmirror_data(data, n=4, size=64)

        precompute_latents.main([
            "--pretrained_model_name_or_path", base,
            "--train_data_dir", data,
            "--output_dir", cache,
            "--resolution", "64",
            "--batch_size", "2",
            "--depth_conditioning_mode", "concat",
        ])
        files = sorted(os.listdir(cache))
        assert len(files) == 4

        df = pd.read_csv(os.path.join(data, "train.csv"))
        ds = LatentCachedDataset(cache, df, HashTokenizer(100), seed=0)
        ex = ds[0]
        assert ex["latent_moments"].shape == (8, 8, 8)
        assert ex["cond_latent_moments"].shape == (8, 8, 8)
        assert ex["masks"].shape == (8, 8, 1)
        assert ex["depths"].shape == (8, 8, 1)
        assert ex["input_ids"].shape == (77,)


class TestAsyncCheckpointer:
    def test_background_save_matches_sync(self, tmp_path):
        """AsyncCheckpointer writes the same checkpoint-N layout as the
        blocking save_state; wait() makes it durable."""
        from reflecting_reality_tpu.training import checkpoint as ckpt

        step_fn, state = build()
        unet = UNet2DConditionModel(sample_size=2, **CFG)
        brushnet = BrushNetModel(conditioning_channels=6, **BCFG)

        sync_dir, async_dir = str(tmp_path / "sync"), str(tmp_path / "async")
        ckpt.save_state(sync_dir, 1, state, brushnet, unet)

        saver = ckpt.AsyncCheckpointer()
        saver.save(async_dir, 1, state, brushnet, unet)
        saver.wait()

        import os

        from reflecting_reality_tpu.core.io import load_safetensors

        rel = os.path.join("checkpoint-1", "brushnet",
                           "diffusion_pytorch_model.safetensors")
        a = load_safetensors(os.path.join(sync_dir, rel))
        b = load_safetensors(os.path.join(async_dir, rel))
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
        # resume from the async checkpoint round-trips the step counter
        restored = ckpt.load_state(
            os.path.join(async_dir, "checkpoint-1"), state)
        assert int(jax.device_get(restored.step)) == int(jax.device_get(state.step))

    def test_background_error_surfaces_on_wait(self, tmp_path):
        """A failing background write re-raises at the next wait()/save()
        instead of disappearing."""
        from reflecting_reality_tpu.training import checkpoint as ckpt

        step_fn, state = build()
        unet = UNet2DConditionModel(sample_size=2, **CFG)
        brushnet = BrushNetModel(conditioning_channels=6, **BCFG)

        import os

        target = str(tmp_path / "file_not_dir")
        with open(target, "w") as f:
            f.write("x")  # save under a file path -> NotADirectoryError
        saver = ckpt.AsyncCheckpointer()
        saver.save(os.path.join(target, "sub"), 1, state, brushnet, unet)
        with pytest.raises(OSError):
            saver.wait()
        saver.wait()  # error is consumed; subsequent waits are clean

    def test_atomic_publish_and_partial_skip(self, tmp_path):
        """save_state publishes via checkpoint-N.tmp + rename, so a crashed
        write never leaves a checkpoint-N that latest_checkpoint would pick
        (ADVICE r4: a retry loop must not resume from a partial dir)."""
        import os

        from reflecting_reality_tpu.training import checkpoint as ckpt

        step_fn, state = build()
        unet = UNet2DConditionModel(sample_size=2, **CFG)
        brushnet = BrushNetModel(conditioning_channels=6, **BCFG)

        out = str(tmp_path / "out")
        ckpt.save_state(out, 5, state, brushnet, unet)
        assert ckpt.latest_checkpoint(out).endswith("checkpoint-5")
        assert not os.path.exists(os.path.join(out, "checkpoint-5.tmp"))

        # simulate a crash mid-write of step 10: files exist but no
        # train_state.msgpack and no rename happened
        os.makedirs(os.path.join(out, "checkpoint-10.tmp", "brushnet"))
        assert ckpt.latest_checkpoint(out).endswith("checkpoint-5")

        # even a renamed-but-truncated dir (legacy partial) is skipped
        os.makedirs(os.path.join(out, "checkpoint-20", "brushnet"))
        assert ckpt.latest_checkpoint(out).endswith("checkpoint-5")

        # re-saving the same step replaces the partial dir cleanly
        ckpt.save_state(out, 20, state, brushnet, unet)
        assert ckpt.latest_checkpoint(out).endswith("checkpoint-20")
        restored = ckpt.load_state(os.path.join(out, "checkpoint-20"), state)
        assert int(jax.device_get(restored.step)) == int(
            jax.device_get(state.step))


class TestLearning:
    """Learning, not just plumbing (VERDICT r2 item 6): a few hundred
    overfit steps must actually DRIVE THE LOSS DOWN, and the trained model
    must denoise the training images better than the zero-conv identity
    start on a noise draw it never saw (reference behavior: zero-conv init
    brushnet.py:928-931 makes step 0 equal the base model, so improvement
    is measurable)."""

    def test_loss_decreases_over_300_steps(self):
        step_fn, state = build()  # lr 1e-3 constant, no warmup
        batch = batch_of(4)
        n = 300

        @jax.jit
        def run(state, rng):
            def body(i, carry):
                state, rng, losses = carry
                rng, sub = jax.random.split(rng)
                state, m = step_fn(state, batch, sub)
                return state, rng, losses.at[i].set(m["loss"])

            losses = jnp.zeros((n,), jnp.float32)
            return jax.lax.fori_loop(0, n, body, (state, rng, losses))

        @jax.jit
        def eval_loss(state):
            # fixed, never-trained-on noise/timestep draw over the train
            # images: improvement = learned denoising, not memorized noise
            _, m = step_fn(state, batch, jax.random.PRNGKey(12345))
            return m["loss"]

        e0 = float(eval_loss(state))
        final, _, losses = run(state, jax.random.PRNGKey(1))
        losses = np.asarray(losses)
        assert np.isfinite(losses).all()
        first, last = losses[:30].mean(), losses[-30:].mean()
        assert last < 0.75 * first, (
            f"windowed loss did not decrease: first30={first:.4f} last30={last:.4f}")
        e1 = float(eval_loss(final))
        assert e1 < e0, f"held-out denoise loss did not improve: {e0:.4f} -> {e1:.4f}"


class TestBF16Transport:
    """--input_transport_dtype bf16: casting float inputs on the host before
    upload must be bit-identical to uploading fp32, because the bf16 train
    step consumes every float input through .astype(bf16) (pixels/moments at
    the VAE-encode cast; masks/depths via selection-only nearest resize then
    cast). Guards the loader fast path used by launchers/train_tpu_e2e.sh."""

    def test_bf16_transport_bit_identical(self):
        step_fn, state = build()
        # rebuild at bf16 compute (mixed_precision bf16 policy)
        unet = UNet2DConditionModel(sample_size=2, **CFG)
        brushnet = BrushNetModel(conditioning_channels=6, **BCFG)
        vae = AutoencoderKL(block_out_channels=(4, 4, 4, 4), norm_num_groups=2)
        text = CLIPTextModel(vocab_size=100, hidden_size=16,
                             num_hidden_layers=1, num_attention_heads=2,
                             intermediate_size=32)
        config = TrainConfig(learning_rate=1e-3, lr_warmup_steps=0,
                             max_train_steps=100)
        step_bf16, _ = make_train_step(unet, brushnet, vae, text, config,
                                       dtype=jnp.bfloat16)
        batch = batch_of(4)
        cast = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
                for k, v in batch.items()}
        _, m32 = jax.jit(step_bf16)(state, batch, jax.random.PRNGKey(3))
        _, mb = jax.jit(step_bf16)(state, cast, jax.random.PRNGKey(3))
        assert float(m32["loss"]) == float(mb["loss"])
        assert float(m32["grad_norm"]) == float(mb["grad_norm"])

    def test_prefetch_transport_casts_floats_only(self):
        from reflecting_reality_tpu.data.loader import prefetch_to_device

        batches = [{
            "pixel_values": np.ones((2, 4, 4, 3), np.float32),
            "input_ids": np.ones((2, 7), np.int32),
        }]
        out = list(prefetch_to_device(iter(batches),
                                      transport_dtype=jnp.bfloat16))
        assert out[0]["pixel_values"].dtype == jnp.bfloat16
        assert out[0]["input_ids"].dtype == jnp.int32

    def test_prefetch_transport_exempt_keeps_normals_fp32(self):
        # ip_adapter mode: train_step consumes batch['normals'] at fp32
        # through freq_encode (ADVICE r4) — the exempted key must cross the
        # wire uncast while everything else still shrinks to bf16.
        from reflecting_reality_tpu.data.loader import prefetch_to_device

        batches = [{
            "pixel_values": np.ones((2, 4, 4, 3), np.float32),
            "normals": np.full((2, 1, 3), 1 / 3, np.float32),
            "input_ids": np.ones((2, 7), np.int32),
        }]
        out = list(prefetch_to_device(iter(batches),
                                      transport_dtype=jnp.bfloat16,
                                      transport_exempt=("normals",)))
        assert out[0]["pixel_values"].dtype == jnp.bfloat16
        assert out[0]["normals"].dtype == jnp.float32
        # the value bf16 would corrupt survives exactly
        np.testing.assert_array_equal(np.asarray(out[0]["normals"]),
                                      np.full((2, 1, 3), np.float32(1 / 3)))

    def test_materialize_cache_transport_exempt(self):
        from reflecting_reality_tpu.data.latent_cache import materialize_cache

        class FakeDS:
            def __len__(self):
                return 3

            def __getitem__(self, i):
                return {
                    "latent_moments": np.full((2, 2, 8), i, np.float32),
                    "normals": np.full((1, 3), 1 / 3, np.float32),
                    "input_ids": np.ones((7,), np.int32),
                }

        cache = materialize_cache(FakeDS(), transport_dtype=jnp.bfloat16,
                                  transport_exempt=("normals",))
        assert cache["latent_moments"].dtype == np.dtype(jnp.bfloat16)
        assert cache["normals"].dtype == np.float32
        np.testing.assert_array_equal(
            cache["normals"], np.full((3, 1, 3), np.float32(1 / 3)))


class TestDeviceCache:
    """Device-resident sample cache (train_step.resolve_device_cache +
    data.latent_cache.{DeviceCacheIndexDataset, materialize_cache}): gather-
    by-index batches must be BIT-IDENTICAL to shipping the same rows from
    host, and the materializer must honor dtype/limit contracts."""

    def test_gathered_step_equals_direct(self):
        step_fn, state = build()
        rng = jax.random.PRNGKey(7)
        # a "dataset" of 6 cached samples; batch = rows [4, 1]
        r = np.random.RandomState(3)
        n, hl, wl = 6, 2, 2
        cache = {
            "latent_moments": jnp.asarray(r.randn(n, hl, wl, 8), jnp.float32),
            "cond_latent_moments": jnp.asarray(r.randn(n, hl, wl, 8), jnp.float32),
            "masks": jnp.asarray((r.rand(n, hl, wl, 1) > 0.5), jnp.float32),
            "depths": jnp.asarray(r.randn(n, hl, wl, 1), jnp.float32),
        }
        ids = jnp.asarray(r.randint(0, 100, (2, 7)), jnp.int32)
        idx = jnp.asarray([4, 1], jnp.int32)

        direct = {k: v[idx] for k, v in cache.items()}
        direct["input_ids"] = ids
        _, m_direct = jax.jit(step_fn)(state, direct, rng)

        from reflecting_reality_tpu.training.train_step import resolve_device_cache

        gathered = resolve_device_cache({"index": idx, "input_ids": ids}, cache)
        _, m_gathered = jax.jit(step_fn)(state, gathered, rng)
        np.testing.assert_array_equal(
            np.asarray(m_direct["loss"]), np.asarray(m_gathered["loss"]))
        np.testing.assert_array_equal(
            np.asarray(m_direct["grad_norm"]), np.asarray(m_gathered["grad_norm"]))

    def test_materialize_and_index_dataset(self, tmp_path):
        from reflecting_reality_tpu.data.latent_cache import (
            DeviceCacheIndexDataset, LatentCachedDataset, materialize_cache)

        import pandas as pd

        n = 4
        df = pd.DataFrame({
            "uid": [f"u{i}" for i in range(n)],
            "path": [f"obj/u{i}.hdf5" for i in range(n)],
            "auto_caption": [f"a caption {i}" for i in range(n)],
        })
        r = np.random.RandomState(0)
        for i in range(n):
            np.savez(tmp_path / f"u{i}_u{i}.npz",
                     latent_moments=r.randn(2, 2, 8).astype(np.float32),
                     cond_latent_moments=r.randn(2, 2, 8).astype(np.float32),
                     masks=(r.rand(2, 2, 1) > 0.5).astype(np.float32),
                     depths=r.randn(2, 2, 1).astype(np.float32))

        tok = lambda texts: [np.arange(7, dtype=np.int32) for _ in texts]
        ds = LatentCachedDataset(str(tmp_path), df, tok, seed=0,
                                 proportion_empty_prompts=0.5)
        cache = materialize_cache(ds, transport_dtype=jnp.bfloat16)
        assert cache["latent_moments"].shape == (n, 2, 2, 8)
        assert cache["latent_moments"].dtype == jnp.bfloat16
        assert cache["masks"].dtype == jnp.bfloat16
        assert "input_ids" not in cache

        # the bf16 cast must equal casting the host sample directly
        np.testing.assert_array_equal(
            cache["depths"][2],
            np.asarray(ds[2]["depths"]).astype(jnp.bfloat16))

        # index dataset: same length, same input_ids RNG stream as inner
        view = DeviceCacheIndexDataset(ds)
        assert len(view) == n
        s = view[1]
        assert int(s["index"]) == 1
        np.testing.assert_array_equal(s["input_ids"], ds[1]["input_ids"])

        # footprint guard
        with pytest.raises(ValueError, match="device cache would need"):
            materialize_cache(ds, max_bytes=10)
