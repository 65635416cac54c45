"""Data-layer tests: transform parity vs reference-semantics goldens, plus an
end-to-end HDF5Dataset -> DataLoader -> collate round trip over a synthetic
SynMirror file (pattern: reference scripts/test_dataset.py data validation)."""

import os

import numpy as np
import pytest

from reflecting_reality_tpu.data.synmirror import (
    HDF5Dataset,
    apply_transforms_depth,
    apply_transforms_mask,
    apply_transforms_normals,
    apply_transforms_rgb,
    extract_data_from_hdf5,
    get_masked_image,
)
from reflecting_reality_tpu.data.loader import DataLoader, collate
from reflecting_reality_tpu.data.tokenizer import HashTokenizer

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "dataset_transforms.npz")


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden data not generated")
    return np.load(GOLDEN)


def _chw(nhwc):  # ours is HWC; goldens are CHW
    return np.moveaxis(nhwc, -1, 0)


class TestTransformParity:
    def test_rgb(self, golden):
        got = apply_transforms_rgb(golden["image"], 512)
        # bicubic overshoot past [-1,1] is expected (the reference doesn't clip)
        np.testing.assert_allclose(_chw(got), golden["rgb"], atol=2e-2)

    def test_mask(self, golden):
        got = apply_transforms_mask(golden["mask"], 512)
        np.testing.assert_allclose(_chw(got), golden["mask_t"], atol=2e-2)

    def test_depth_max_scene(self, golden):
        got = apply_transforms_depth(
            golden["depth"], mask=golden["mask"],
            normalization_method="max_scene_depth", resolution=512,
        )
        np.testing.assert_allclose(_chw(got), golden["depth_msd"], atol=2e-2)

    def test_depth_percentile(self, golden):
        got = apply_transforms_depth(
            golden["depth"], normalization_method="percentile", resolution=512
        )
        np.testing.assert_allclose(_chw(got), golden["depth_pct"], atol=2e-2)

    def test_normals_image_mode(self, golden):
        got = apply_transforms_normals(
            golden["normals"], 512, mask=golden["mask"],
            normals_conditioning_mode="concat",
        )
        np.testing.assert_allclose(_chw(got), golden["normals_img"], atol=2e-2)

    def test_normals_ip_adapter(self, golden):
        got = apply_transforms_normals(
            golden["normals"], 512, mask=golden["mask"],
            normals_conditioning_mode="ip_adapter",
        )
        np.testing.assert_allclose(got, golden["normals_ip"], rtol=1e-5)
        assert got.shape == (1, 3)

    def test_masked_image(self, golden):
        got = get_masked_image(golden["image"], golden["mask"])
        np.testing.assert_array_equal(got, golden["masked_image"])


# ---------------------------------------------------------------- end to end

@pytest.fixture(scope="module")
def synthetic_dataset(tmp_path_factory):
    h5py = pytest.importorskip("h5py")
    import json as _json

    root = tmp_path_factory.mktemp("synmirror")
    rng = np.random.RandomState(0)
    rows = []
    for i in range(4):
        seg = np.zeros((64, 64), np.uint8)
        seg[16:48, 16:48] = 1   # mirror
        seg[20:30, 20:30] = 2   # object
        cam = _json.dumps({"cam2world": np.eye(4).tolist(),
                           "cam_K": np.eye(3).tolist()}).encode()
        p = f"obj/{i}.hdf5"
        (root / "obj").mkdir(exist_ok=True)
        with h5py.File(root / p, "w") as f:
            f["colors"] = rng.randint(0, 256, (64, 64, 3), np.uint8)
            f["category_id_segmaps"] = seg
            f["depth"] = (rng.rand(64, 64) * 5).astype(np.float32)
            f["normals"] = rng.rand(64, 64, 3).astype(np.float32)
            f["cam_states"] = np.frombuffer(cam, dtype=np.uint8)
        rows.append({"path": p, "auto_caption": f"a scene {i}"})

    class MiniFrame:  # pandas-free index with .iloc/.shape
        def __init__(self, rows):
            self.rows = rows
            self.shape = (len(rows), 2)

        class _ILoc:
            def __init__(self, rows): self.rows = rows
            def __getitem__(self, i): return self.rows[i]

        @property
        def iloc(self): return MiniFrame._ILoc(self.rows)

    return str(root), MiniFrame(rows)


class TestHDF5Dataset:
    def test_getitem_and_loader(self, synthetic_dataset):
        root, df = synthetic_dataset
        ds = HDF5Dataset(
            root, df, HashTokenizer(), resolution=64,
            proportion_empty_prompts=0.0, depth=True, cam_states=True, seed=0,
        )
        ex = ds[0]
        assert ex["pixel_values"].shape == (64, 64, 3)
        assert ex["conditioning_pixel_values"].shape == (64, 64, 3)
        assert ex["masks"].shape == (64, 64, 1)
        assert ex["depths"].shape == (64, 64, 1)
        assert ex["input_ids"].shape == (77,)
        assert ex["cam2world"].shape == (4, 4)
        # mirror region zeroed in conditioning image, mask=1 there
        m = ex["masks"][:, :, 0] > 0.5
        assert np.abs(ex["conditioning_pixel_values"][m] + 1.0).max() < 1e-5
        # (17,17) is mirror (segmap 1); (20,20) is the object (segmap 2) — not mask
        assert ex["masks"][17, 17, 0] == 1.0
        assert ex["masks"][20, 20, 0] == 0.0
        assert ex["masks"][0, 0, 0] == 0.0

        dl = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2, seed=1)
        batches = list(dl)
        assert len(batches) == 2
        b = batches[0]
        assert b["pixel_values"].shape == (2, 64, 64, 3)
        assert b["pixel_values"].dtype == np.float32
        assert b["input_ids"].dtype == np.int32

    def test_empty_prompt_dropout(self, synthetic_dataset):
        root, df = synthetic_dataset
        tok = HashTokenizer()
        ds = HDF5Dataset(root, df, tok, resolution=64,
                         proportion_empty_prompts=1.0, seed=0)
        ex = ds[0]
        np.testing.assert_array_equal(ex["input_ids"], tok([""])[0])

    def test_item_rng_thread_invariant(self, synthetic_dataset):
        """Augmentation draws are keyed by (seed, epoch, index), never by
        loader thread scheduling: the same items through 1-worker and
        8-worker loaders (and direct indexing) are bit-identical, and bumping
        the epoch resamples (data/rng.py — regression for the per-thread
        generator that broke K=1 reproducibility)."""
        root, df = synthetic_dataset

        def make():
            return HDF5Dataset(root, df, HashTokenizer(), resolution=64,
                               proportion_empty_prompts=0.5, random_flip=True,
                               seed=7)

        def epoch_batches(ds, workers):
            dl = DataLoader(ds, batch_size=2, shuffle=True, num_workers=workers,
                            seed=3)
            return list(dl)

        b1 = epoch_batches(make(), 1)
        b8 = epoch_batches(make(), 8)
        for x, y in zip(b1, b8):
            for k in x:
                np.testing.assert_array_equal(x[k], y[k], err_msg=k)

        # direct indexing at epoch 0 matches too
        ds_a, ds_b = make(), make()
        for i in range(4):
            ex_a, ex_b = ds_a[i], ds_b[i]
            for k in ex_a:
                np.testing.assert_array_equal(ex_a[k], ex_b[k], err_msg=k)

        # a different epoch resamples at least one item's draws
        ds_b.rng.epoch = 1
        changed = any(
            not np.array_equal(ds_a[i]["input_ids"], ds_b[i]["input_ids"])
            or not np.array_equal(ds_a[i]["pixel_values"], ds_b[i]["pixel_values"])
            for i in range(4)
        )
        assert changed


class _ArrayDataset:
    """Trivial dataset: index -> {"x": [i, i, i, i]}."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((4,), float(i), np.float32)}


class TestMultiHostLoader:
    """Process-strided loading (reference one-DataLoader-per-DDP-rank
    semantics, train_brushnet_mirror.py:1242-1269): two fake processes'
    slices must reassemble into exactly the single-process global batch."""

    def test_two_processes_union_equals_global(self):
        ds = _ArrayDataset(32)
        kw = dict(batch_size=8, shuffle=True, num_workers=1, seed=5)
        global_batches = list(DataLoader(ds, **kw))
        p0 = list(DataLoader(ds, process_index=0, process_count=2, **kw))
        p1 = list(DataLoader(ds, process_index=1, process_count=2, **kw))
        assert len(global_batches) == len(p0) == len(p1) == 4
        for g, a, b in zip(global_batches, p0, p1):
            assert a["x"].shape == (4, 4) and b["x"].shape == (4, 4)
            np.testing.assert_array_equal(
                np.concatenate([a["x"], b["x"]], axis=0), g["x"]
            )

    def test_divisibility_enforced(self):
        with pytest.raises(AssertionError):
            DataLoader(_ArrayDataset(8), batch_size=9, process_count=2)

    def test_shard_batch_from_process_local(self):
        """jax.make_array_from_process_local_data assembly path (single
        process: local == global) must equal the device_put path, with the
        same sharding layout."""
        import jax

        from reflecting_reality_tpu.parallel.mesh import make_mesh, shard_batch

        mesh = make_mesh(8)
        batch = {"x": np.arange(8 * 4, dtype=np.float32).reshape(8, 4)}
        a = shard_batch(batch, mesh)
        b = shard_batch(batch, mesh, from_process_local=True)
        np.testing.assert_array_equal(np.asarray(a["x"]), np.asarray(b["x"]))
        assert b["x"].sharding.spec == a["x"].sharding.spec
        assert len(b["x"].addressable_shards) == 8


def test_normals_to_uint8_scales_floats():
    """Float [0,1] normals must be x255-scaled, not truncated to black
    (regression: bare uint8 cast in the test/train CLIs)."""
    from reflecting_reality_tpu.data.synmirror import normals_to_uint8

    f = np.array([[[0.0, 0.5, 1.0]]], np.float32)
    out = normals_to_uint8(f)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, [[[0, 128, 255]]])
    u = np.array([[[3, 7, 9]]], np.uint8)
    np.testing.assert_array_equal(normals_to_uint8(u), u)


def test_multihost_loader_drops_partial_tail():
    """With process_count > 1 a partial tail batch would give ranks unequal
    local slices; the loader must drop it (DistributedSampler semantics)."""
    from reflecting_reality_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.float32)}

    per_rank = []
    for rank in (0, 1):
        loader = DataLoader(DS(), batch_size=8, shuffle=False,
                            process_index=rank, process_count=2)
        batches = list(loader)
        assert len(batches) == len(loader) == 1  # tail of 2 samples dropped
        assert batches[0]["x"].shape == (4, 2)
        per_rank.append(batches[0]["x"][:, 0].astype(int).tolist())
    assert per_rank[0] + per_rank[1] == list(range(8))
