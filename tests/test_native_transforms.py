"""Bit-parity of the native C++ sample transforms (native/transforms.cpp)
against the numpy/PIL reference path in data/synmirror.py.

The native kernels re-implement PIL's convolution resampler (double
coefficients, horizontal-then-vertical, double accumulation) and the exact
division rounding of the numpy path, so parity is asserted EXACT, not
approximate.  Reference behavior: MirrorFusion dataset transforms
(examples/brushnet/dataset/dataset.py:71-166).
"""

import numpy as np
import pytest

from reflecting_reality_tpu.data import native, synmirror

pytestmark = pytest.mark.skipif(
    native.load() is None, reason="native transforms unavailable (no g++?)"
)

SIZES = [(512, 512), (640, 480), (480, 640), (600, 600), (1024, 768), (100, 100)]


@pytest.fixture
def numpy_mode(monkeypatch):
    """Force the numpy/PIL fallback inside synmirror's transform functions."""
    def apply():
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_tried", True)
    return apply


@pytest.mark.parametrize("size", SIZES)
def test_rgb_transform_parity(size, numpy_mode):
    rng = np.random.RandomState(hash(size) % 2**31)
    img = rng.randint(0, 256, (*size, 3), np.uint8)
    got = synmirror.apply_transforms_rgb(img, 512)
    numpy_mode()
    want = synmirror.apply_transforms_rgb(img, 512)
    assert got.shape == want.shape == (512, 512, 3)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("size", SIZES)
def test_mask_transform_parity(size, numpy_mode):
    rng = np.random.RandomState(1)
    mask = (rng.rand(*size) > 0.5).astype(np.uint8) * 255
    got = synmirror.apply_transforms_mask(mask, 512)
    numpy_mode()
    want = synmirror.apply_transforms_mask(mask, 512)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("size", SIZES)
@pytest.mark.parametrize("norm_range", [(-1, 1), (0, 1)])
def test_depth_transform_parity(size, norm_range, numpy_mode):
    rng = np.random.RandomState(2)
    depth = (rng.rand(*size) * 4).astype(np.float32)
    mask = (rng.rand(*size) > 0.5).astype(np.uint8) * 255
    got = synmirror.apply_transforms_depth(
        depth, mask=mask, resolution=512, norm_range=norm_range)
    got_nomask = synmirror.apply_transforms_depth(
        depth, mask=None, resolution=512, norm_range=norm_range)
    numpy_mode()
    want = synmirror.apply_transforms_depth(
        depth, mask=mask, resolution=512, norm_range=norm_range)
    want_nomask = synmirror.apply_transforms_depth(
        depth, mask=None, resolution=512, norm_range=norm_range)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got_nomask, want_nomask)


def test_normals_image_mode_parity(numpy_mode):
    rng = np.random.RandomState(3)
    normals = rng.rand(640, 480, 3).astype(np.float32)
    got = synmirror.apply_transforms_normals(
        normals, 512, normals_conditioning_mode="image")
    numpy_mode()
    want = synmirror.apply_transforms_normals(
        normals, 512, normals_conditioning_mode="image")
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("invert", [True, False])
def test_masked_image_parity(invert, numpy_mode):
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (64, 96, 3), np.uint8)
    mask = (rng.rand(64, 96) > 0.5).astype(np.uint8) * 255
    got = synmirror.get_masked_image(img, mask, invert=invert)
    numpy_mode()
    want = synmirror.get_masked_image(img, mask, invert=invert)
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


def test_extract_lazy_keys_match_full(tmp_path):
    """keys= subsets must agree with the full read (reference reads all)."""
    h5py = pytest.importorskip("h5py")
    rng = np.random.RandomState(5)
    p = tmp_path / "s.hdf5"
    seg = np.zeros((64, 64), np.uint8)
    seg[8:24, 8:24] = 1
    seg[40:, 40:] = 2
    with h5py.File(p, "w") as f:
        f["colors"] = rng.randint(0, 256, (64, 64, 3), np.uint8)
        f["category_id_segmaps"] = seg
        f["depth"] = rng.rand(64, 64).astype(np.float32)
        f["normals"] = rng.rand(64, 64, 3).astype(np.float32)
        f["cam_states"] = np.frombuffer(b'{"cam2world": [], "cam_K": []}',
                                        dtype=np.uint8)
    with h5py.File(p, "r") as f:
        full = synmirror.extract_data_from_hdf5(f)
        subset = synmirror.extract_data_from_hdf5(
            f, keys={"image", "mask", "masked_image", "depth"})
    assert set(subset) == {"image", "mask", "masked_image", "depth"}
    for k, v in subset.items():
        np.testing.assert_array_equal(v, full[k])


def test_half_integer_resize_target_parity(numpy_mode):
    """1024x1025 -> target width 512.5: Python round() is half-to-even (512);
    the native kernel must agree (regression: std::lround gave 513)."""
    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, (1024, 1025, 3), np.uint8)
    got = synmirror.apply_transforms_rgb(img, 512)
    numpy_mode()
    want = synmirror.apply_transforms_rgb(img, 512)
    np.testing.assert_array_equal(got, want)


def test_depth_empty_mask_raises_like_numpy():
    """An all-zero mirror mask must fail loudly (reference depth[mask].max()
    semantics), not silently produce a constant depth plane."""
    depth = np.random.RandomState(7).rand(64, 64).astype(np.float32)
    empty = np.zeros((64, 64), np.uint8)
    with pytest.raises(ValueError):
        synmirror.apply_transforms_depth(depth, mask=empty, resolution=64)


def test_depth_nan_propagates(numpy_mode):
    """NaN inside the masked region must poison the output exactly as the
    numpy max/clip path does (all-NaN), not be silently ignored."""
    rng = np.random.RandomState(8)
    depth = rng.rand(64, 64).astype(np.float32)
    mask = np.zeros((64, 64), np.uint8)
    mask[16:48, 16:48] = 255
    depth[20, 20] = np.nan
    got = synmirror.apply_transforms_depth(depth, mask=mask, resolution=64)
    numpy_mode()
    want = synmirror.apply_transforms_depth(depth, mask=mask, resolution=64)
    assert np.isnan(got).all() and np.isnan(want).all()
