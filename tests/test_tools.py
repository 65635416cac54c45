"""Tooling tests: corruption scanner, hdf5 extractor, visualizer gallery,
caption summarizer fallback."""

import json
import os

import numpy as np
import pytest

from tests.tiny_checkpoint import make_synmirror_data


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    pytest.importorskip("h5py")
    d = tmp_path_factory.mktemp("scan_data")
    make_synmirror_data(str(d), n=3, size=32)
    return str(d)


class TestScanner:
    def test_clean_dataset(self, data_dir):
        from reflecting_reality_tpu.tools.test_dataset import scan

        assert scan(data_dir) == []

    def test_detects_corruption(self, data_dir, tmp_path):
        import h5py

        from reflecting_reality_tpu.tools.test_dataset import scan

        bad = tmp_path / "bad"
        os.makedirs(bad / "obj")
        # black image
        with h5py.File(bad / "obj/black.hdf5", "w") as f:
            f["colors"] = np.zeros((16, 16, 3), np.uint8)
            f["category_id_segmaps"] = np.ones((16, 16), np.uint8)
            f["depth"] = np.random.rand(16, 16).astype(np.float32)
            f["normals"] = np.random.rand(16, 16, 3).astype(np.float32)
        # no mirror in mask + constant depth
        with h5py.File(bad / "obj/nomirror.hdf5", "w") as f:
            f["colors"] = np.full((16, 16, 3), 128, np.uint8)
            f["category_id_segmaps"] = np.zeros((16, 16), np.uint8)
            f["depth"] = np.ones((16, 16), np.float32)
            f["normals"] = np.random.rand(16, 16, 3).astype(np.float32)
        results = dict(scan(str(bad)))
        assert results["obj/black.hdf5"] == "Black image"
        assert "mirror" in results["obj/nomirror.hdf5"]

    def test_cli_report(self, data_dir, tmp_path):
        from reflecting_reality_tpu.tools.test_dataset import main

        report = str(tmp_path / "r.txt")
        main(["--data_dir", data_dir, "--report", report])
        assert os.path.exists(report) and open(report).read() == ""


class TestExtractor:
    def test_extract(self, data_dir, tmp_path):
        from reflecting_reality_tpu.tools.hdf5extract import main

        out = str(tmp_path / "ex")
        main(["--input", os.path.join(data_dir, "obj", "0.hdf5"),
              "--output_dir", out, "--save_npy"])
        names = sorted(os.listdir(out))
        for suffix in ("cam.json", "colors.png", "depth.npy", "depth.png",
                       "mirror_mask.png", "normals.png", "object_mask.png",
                       "segmap.png"):
            assert f"0_{suffix}" in names
        cam = json.load(open(os.path.join(out, "0_cam.json")))
        assert np.asarray(cam["cam2world"]).shape == (4, 4)


class TestVisualizer:
    def test_html_gallery(self, tmp_path):
        import pandas as pd
        from PIL import Image

        from reflecting_reality_tpu.tools.visualise import collect, write_html

        infer = tmp_path / "infer"
        infer.mkdir()
        for uid in ("a_0", "b_0"):
            Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(infer / f"{uid}.png")
        pd.DataFrame({"uid": ["a_0", "b_0"], "PSNR": [20.0, 25.0],
                      "mask_SSIM": [0.9, 0.8]}).to_csv(infer / "eval_0.csv", index=False)
        cards = collect(str(infer))
        assert len(cards) == 2
        assert cards[0]["metrics"]["seed0/PSNR"] == 20.0
        out = write_html(str(infer), cards)
        page = open(out).read()
        assert "a_0.png" in page and "seed0/mask_SSIM" in page


class TestSummarizer:
    @pytest.mark.medium
    def test_fallback_truncation(self, tmp_path):
        import pandas as pd

        from reflecting_reality_tpu.tools.summarize_captions import main, summarize_fn

        f = summarize_fn(model_name="nonexistent-model", max_length=5)
        assert f("one two three four five six seven") == "one two three four five"

        csv = tmp_path / "c.csv"
        pd.DataFrame({"auto_caption": ["short one", "long " * 60]}).to_csv(csv, index=False)
        out = tmp_path / "o.csv"
        main(["--csv", str(csv), "--out_csv", str(out),
              "--model", "nonexistent-model", "--max_length", "8"])
        df = pd.read_csv(out)
        assert df["auto_caption"][0] == "short one"
        assert len(df["auto_caption"][1].split()) == 8


class TestCreateSplits:
    def test_group_split(self, data_dir):
        import pandas as pd

        from reflecting_reality_tpu.tools.create_splits import main

        main(["--data_dir", data_dir, "--test_fraction", "0.34", "--seed", "0"])
        train = pd.read_csv(os.path.join(data_dir, "train.csv"))
        test = pd.read_csv(os.path.join(data_dir, "test.csv"))
        assert len(train) + len(test) == 3
        assert set(train["uid"]).isdisjoint(set(test["uid"]))
        assert "auto_caption" in train.columns


class TestCamPoseMap:
    def test_build_map(self, data_dir, tmp_path):
        import shutil

        from reflecting_reality_tpu.tools.create_novel_cam_poses import build_map

        views = tmp_path / "views"
        views.mkdir()
        for i in range(2):
            shutil.copy(os.path.join(data_dir, "obj", f"{i}.hdf5"), views / f"{i}.hdf5")
        m = build_map(str(views), points=[(10, 20), (30, 40)])
        assert len(m) >= 1  # identity cam2world for both -> same key collapses
        entry = next(iter(m.values()))
        assert set(entry) == {"point", "ratio_w", "ratio_h", "floor_path"}


class TestVerifySynmirror:
    """Ingest verification (tools/verify_synmirror.py): schema manifest,
    index coverage, corruption detection, and manifest comparison — the
    de-risk tool for first contact with the real SynMirror corpus."""

    @pytest.fixture()
    def data_dir(self, tmp_path):
        # own fresh corpus: the module fixture's CSVs are rewritten by
        # TestCreateSplits, and index coverage needs the original index
        pytest.importorskip("h5py")
        d = tmp_path / "corpus"
        make_synmirror_data(str(d), n=3, size=32)
        return str(d)

    def test_clean_corpus_manifest(self, data_dir, tmp_path):
        from reflecting_reality_tpu.tools.verify_synmirror import main

        manifest_path = str(tmp_path / "manifest.json")
        rc = main(["--data_dir", data_dir, "--csv", "train.csv",
                   "--manifest", manifest_path, "--checksums"])
        assert rc == 0
        m = json.load(open(manifest_path))
        assert m["n_files"] == 3 and m["corrupt"] == []
        assert m["index"]["missing_rows"] == []
        assert m["index"]["orphan_files"] == []
        rec = m["files"]["obj/0.hdf5"]
        assert rec["keys"]["colors"]["dtype"] == "uint8"
        assert rec["keys"]["colors"]["shape"] == [32, 32, 3]
        assert len(rec["sha256"]) == 64

    def test_schema_violations_detected(self, tmp_path):
        import h5py

        from reflecting_reality_tpu.tools.verify_synmirror import inspect_file

        bad = tmp_path / "bad.hdf5"
        with h5py.File(bad, "w") as f:
            f["colors"] = np.random.rand(16, 16, 3).astype(np.float32)  # wrong kind
            f["category_id_segmaps"] = np.ones((16, 16), np.uint8)
            f["depth"] = np.random.rand(8, 8).astype(np.float32)  # dim mismatch
            # normals missing entirely
        rec = inspect_file(str(bad), content_scan=False)
        joined = "; ".join(rec["errors"])
        assert "missing key normals" in joined
        assert "colors" in joined and "kind" in joined
        assert "inconsistent spatial dims" in joined

    def test_index_coverage_and_rc(self, data_dir, tmp_path):
        import shutil

        from reflecting_reality_tpu.tools.verify_synmirror import main

        broken = tmp_path / "broken"
        shutil.copytree(data_dir, broken)
        os.remove(broken / "obj/2.hdf5")  # row now missing on disk
        rc = main(["--data_dir", str(broken), "--csv", "train.csv"])
        assert rc == 1

    def test_manifest_comparison_detects_drift(self, data_dir, tmp_path):
        import shutil

        import h5py

        from reflecting_reality_tpu.tools.verify_synmirror import main

        ref = str(tmp_path / "ref.json")
        assert main(["--data_dir", data_dir, "--csv", "train.csv",
                     "--manifest", ref, "--checksums"]) == 0

        copy = tmp_path / "copy"
        shutil.copytree(data_dir, copy)
        # identical copy verifies clean
        assert main(["--data_dir", str(copy), "--csv", "train.csv",
                     "--checksums", "--expect", ref]) == 0
        # corrupt one byte-level plane -> sha mismatch reported
        with h5py.File(copy / "obj/1.hdf5", "r+") as f:
            d = np.array(f["depth"])
            del f["depth"]
            f["depth"] = d + 1e-3
        assert main(["--data_dir", str(copy), "--csv", "train.csv",
                     "--checksums", "--expect", ref]) == 1
