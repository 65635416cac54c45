"""SAM reflection-segmentation tests with a stub predictor (no
segment_anything dependency): pins the camera-pose prompt-point lookup, bbox
construction, floor-mask OR / mirror-mask AND combination, sam_cache
round-trip, and the empty-object-mask NaN path.

Reference behavior: metrics/object_metrics.py:18-52 (cam-pose key),
:86-156 (segment_image), metrics/segment_reflection.py:88-113 (bboxes).
"""

import json
import os

import numpy as np
import pytest

from reflecting_reality_tpu.metrics.segmentation import (
    EmptyObjectMaskError,
    create_bbox_from_point,
    create_sign_vector,
    get_bbox_from_mask,
    get_point_from_cam_states,
    load_cam_pose_map,
    segment_image,
)

H = W = 64


class FakeSegmenter:
    """Stands in for SegmentPoints: predicts a deterministic rectangle that
    covers the prompt bbox, clipped to the image."""

    def __init__(self):
        self.images = []
        self.bboxes = []

    def set_image(self, image):
        self.images.append(np.asarray(image))

    def give_mask(self, bbox):
        self.bboxes.append(tuple(int(v) for v in bbox))
        x1, y1, x2, y2 = self.bboxes[-1]
        h, w = self.images[-1].shape[:2]
        big = np.zeros((h, w), bool)
        big[max(0, y1):min(h, y2), max(0, x1):min(w, x2)] = True
        small = np.zeros((h, w), bool)
        small[max(0, y1):min(h, y1 + 2), max(0, x1):min(w, x1 + 2)] = True
        # multimask_output=True shape: 3 masks + scores + logits
        masks = np.stack([small, big, small])
        return masks, np.array([0.5, 0.9, 0.4]), np.zeros((3, 1, 1))


def make_cam_states(translation):
    cam2world = np.eye(4)
    cam2world[:3, 3] = translation
    payload = json.dumps({"cam2world": cam2world.tolist(), "cam_K": np.eye(3).tolist()})
    return np.frombuffer(payload.encode("utf-8"), dtype=np.uint8).copy()


def make_gt_data(translation=(1.0, 2.0, 2.0), with_object=True):
    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, (H, W, 3), np.uint8)
    mirror = np.zeros((H, W), np.uint8)
    mirror[8:56, 8:40] = 255
    obj = np.zeros((H, W), np.uint8)
    if with_object:
        obj[20:30, 12:24] = 255
    return {
        "image": image,
        "mask": mirror,
        "object_mask": obj,
        "cam_states": make_cam_states(translation),
        "file_path": "hdf5/xyz/0.hdf5",
    }


def cam_pose_map_for(translation, point=(16, 28), ratio_w=1.5, ratio_h=2.0,
                     floor_path="3.png"):
    t = np.asarray(translation, float)
    s = create_sign_vector(t)
    key = round(float(np.linalg.norm(t)) * s[0] * s[1] * s[2], 3)
    return {str(key): {"point": list(point), "ratio_w": ratio_w,
                       "ratio_h": ratio_h, "floor_path": floor_path}}, key


class TestPromptPointLookup:
    def test_signed_norm_key_exact_match(self):
        t = (1.0, 2.0, 2.0)  # norm 3.0, all positive signs
        cmap, key = cam_pose_map_for(t)
        assert key == 3.0
        point, rw, rh, floor = get_point_from_cam_states(make_gt_data(t), cmap)
        assert point == [16, 28] and rw == 1.5 and rh == 2.0 and floor == "3.png"

    def test_negative_translation_flips_key_sign(self):
        t = (-1.0, 2.0, 2.0)
        cmap, key = cam_pose_map_for(t)
        assert key == -3.0
        point, *_ = get_point_from_cam_states(make_gt_data(t), cmap)
        assert point == [16, 28]

    def test_nearest_key_fallback(self):
        cmap, _ = cam_pose_map_for((1.0, 2.0, 2.0))  # key 3.0
        # query with a slightly different camera: falls back to nearest key
        point, *_ = get_point_from_cam_states(make_gt_data((1.01, 2.0, 2.0)), cmap)
        assert point == [16, 28]

    def test_list_entry_unwrapped(self):
        t = (1.0, 2.0, 2.0)
        cmap, key = cam_pose_map_for(t)
        cmap[str(key)] = [cmap[str(key)]]
        point, *_ = get_point_from_cam_states(make_gt_data(t), cmap)
        assert point == [16, 28]

    def test_unparseable_map_returns_default(self):
        point, rw, rh, floor = get_point_from_cam_states(
            make_gt_data(), {"not-a-number": {}})
        assert point == [80, 250] and rw == 0.9 and rh == 0.9 and floor == "0.png"


class TestBboxes:
    def test_bbox_from_mask(self):
        m = np.zeros((H, W), np.uint8)
        m[10:20, 30:44] = 1
        assert get_bbox_from_mask(m) == (30, 10, 44, 20)

    def test_bbox_from_empty_mask_is_none(self):
        assert get_bbox_from_mask(np.zeros((H, W), np.uint8)) is None

    def test_bbox_from_point_min_size_and_clip(self):
        # width/height floor at 50 and the origin clips at 0
        assert create_bbox_from_point((10, 10), 8, 8) == (0, 0, 35, 35)
        assert create_bbox_from_point((100, 100), 60, 80) == (70, 60, 130, 140)


class TestSegmentImage:
    def test_masks_and_cache_roundtrip(self, tmp_path):
        t = (1.0, 2.0, 2.0)
        cmap, _ = cam_pose_map_for(t)
        gt = make_gt_data(t)
        seg = FakeSegmenter()
        cache = str(tmp_path / "sam_cache" / "0.png")

        sam_gt, img_gt, sam_gen, img_gen = segment_image(
            gt, gt["image"], seg, cmap, gt_sam_cache=cache, save_cache=True)

        # SAM ran on the mirror-masked images: pixels outside the mirror are 0
        outside = gt["mask"] == 0
        assert (seg.images[0][outside] == 0).all()
        # largest of the 3 multimask outputs is selected
        assert sam_gt.sum() > 0 and set(np.unique(sam_gt)) <= {0, 255}
        # the returned crops are ANDed with the mirror mask
        assert (img_gt[outside] == 0).all() and (img_gen[outside] == 0).all()
        # cache was written; a second call must not re-run SAM on the GT
        assert os.path.exists(cache)
        seg2 = FakeSegmenter()
        sam_gt2, *_ = segment_image(gt, gt["image"], seg2, cmap,
                                    gt_sam_cache=cache, save_cache=True)
        np.testing.assert_array_equal(sam_gt2, sam_gt)
        assert len(seg2.images) == 1  # only the generated image hit SAM

    def test_use_gt_mask_skips_gen_sam(self):
        cmap, _ = cam_pose_map_for((1.0, 2.0, 2.0))
        gt = make_gt_data()
        seg = FakeSegmenter()
        sam_gt, _, sam_gen, _ = segment_image(
            gt, gt["image"], seg, cmap, use_gt_mask=True)
        np.testing.assert_array_equal(sam_gt, sam_gen)
        assert len(seg.images) == 1

    def test_floor_mask_or(self, tmp_path):
        from PIL import Image

        t = (1.0, 2.0, 2.0)
        cmap, key = cam_pose_map_for(t, floor_path="7.png")
        # floor mask marks a strip INSIDE the mirror that SAM won't find
        floor = np.zeros((H, W), np.uint8)
        floor[50:54, 10:30] = 255
        fdir = tmp_path / "metrics" / "floor_masks"
        fdir.mkdir(parents=True)
        Image.fromarray(floor).save(fdir / "7.png")

        gt = make_gt_data(t)
        seg = FakeSegmenter()
        _, img_gt, _, _ = segment_image(
            gt, gt["image"], seg, cmap, use_floor_mask=True,
            data_dir=str(tmp_path))
        # floor strip is inside the mirror -> kept even though outside SAM bbox
        strip = img_gt[50:54, 10:30]
        assert (strip == gt["image"][50:54, 10:30]).all()
        # outside mirror stays zero even where a floor mask would extend
        assert (img_gt[gt["mask"] == 0] == 0).all()

    def test_empty_object_mask_raises_typed_error(self):
        cmap, _ = cam_pose_map_for((1.0, 2.0, 2.0))
        gt = make_gt_data(with_object=False)
        with pytest.raises(EmptyObjectMaskError):
            segment_image(gt, gt["image"], FakeSegmenter(), cmap)


class TestCalculatorIntegration:
    def _calc(self):
        from reflecting_reality_tpu.metrics.calculator import MetricsCalculator

        calc = MetricsCalculator(["PSNR"])  # avoid SAM ctor path
        calc._segmenter = FakeSegmenter()
        calc._cam_pose_map, _ = cam_pose_map_for((1.0, 2.0, 2.0))
        return calc

    def test_obj_psnr_and_iou(self, tmp_path):
        calc = self._calc()
        calc.data_dir = str(tmp_path)
        gt = make_gt_data()
        iou = calc.compute_metric("IoU", gt["image"], gt, "cap")
        assert iou == pytest.approx(1.0)  # identical image -> identical masks
        psnr = calc.compute_metric("obj_PSNR", gt["image"], gt, "cap")
        assert psnr > 50  # identical crops

    def test_empty_object_mask_yields_nan_cell(self, tmp_path):
        calc = self._calc()
        calc.data_dir = str(tmp_path)
        gt = make_gt_data(with_object=False)
        assert np.isnan(calc.compute_metric("IoU", gt["image"], gt, "cap"))
        assert np.isnan(calc.compute_metric("obj_SSIM", gt["image"], gt, "cap"))


def test_load_cam_pose_map_search_order(tmp_path):
    d = tmp_path / "metrics"
    d.mkdir()
    (d / "cam_pose_map.json").write_text(json.dumps({"1.0": {"point": [1, 2]}}))
    assert load_cam_pose_map(str(tmp_path)) == {"1.0": {"point": [1, 2]}}
    with pytest.raises(FileNotFoundError):
        load_cam_pose_map(str(tmp_path / "nope"))
