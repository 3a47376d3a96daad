"""Category-masking pipeline tests (fake detector; no model download)."""

import json
import os

import numpy as np
import pytest

from human_body_reconstruction_tpu.pipeline import masking


def test_category_ids_known():
    assert masking.category_ids(["person"]) == [1]
    assert masking.category_ids(["Person", " car "]) == [1, 3]


def test_category_ids_unknown_raises():
    with pytest.raises(ValueError, match="unknown COCO category"):
        masking.category_ids(["unicorn"])
    with pytest.raises(ValueError):
        masking.category_ids(["n/a"])


def test_mask_name_for():
    assert masking.mask_name_for("a/b/0001.jpg") == "a/b/dynamic_mask_0001.png"
    assert masking.mask_name_for("x.png") == "dynamic_mask_x.png"


def _write_img(path, h=12, w=10):
    import cv2

    img = np.random.default_rng(0).integers(0, 255, (h, w, 3), np.uint8)
    cv2.imwrite(path, img)


def test_apply_mask_categories_writes_masks_and_paths(tmp_path):
    d = str(tmp_path)
    os.makedirs(os.path.join(d, "images"), exist_ok=True)
    for i in range(2):
        _write_img(os.path.join(d, "images", f"{i:04d}.jpg"))
    transforms = {"frames": [{"file_path": f"images/{i:04d}.jpg"}
                             for i in range(2)]}

    def fake_detector(img):
        h, w = img.shape[:2]
        person = np.zeros((h, w), bool)
        person[:h // 2] = True           # top half = person
        car = np.zeros((h, w), bool)
        car[:, :w // 2] = True           # left half = car (should be ignored)
        return [(1, 0.9, person), (3, 0.9, car)]

    out = masking.apply_mask_categories(transforms, ["person"], d,
                                        detector=fake_detector)
    for i, frame in enumerate(out["frames"]):
        assert frame["mask_path"] == f"images/dynamic_mask_{i:04d}.png"
        mpath = os.path.join(d, frame["mask_path"])
        assert os.path.exists(mpath)
        import cv2

        m = cv2.imread(mpath, cv2.IMREAD_GRAYSCALE)
        assert (m[:6] == 255).all()      # person region masked
        assert (m[6:] == 0).all()        # car-only region NOT masked


def test_apply_union_of_multiple_categories(tmp_path):
    d = str(tmp_path)
    _write_img(os.path.join(d, "f.jpg"), h=8, w=8)
    transforms = {"frames": [{"file_path": "f.jpg"}]}

    def fake_detector(img):
        a = np.zeros((8, 8), bool); a[0] = True
        b = np.zeros((8, 8), bool); b[7] = True
        return [(1, 0.9, a), (3, 0.9, b)]

    out = masking.apply_mask_categories(transforms, ["person", "car"], d,
                                        detector=fake_detector)
    import cv2

    m = cv2.imread(os.path.join(d, out["frames"][0]["mask_path"]),
                   cv2.IMREAD_GRAYSCALE)
    assert (m[0] == 255).all() and (m[7] == 255).all()
    assert (m[1:7] == 0).all()


def test_colmap2nerf_cli_mask_categories(tmp_path, monkeypatch):
    """The CLI path annotates transforms.json with mask_path entries."""
    from human_body_reconstruction_tpu.cli import colmap2nerf
    from human_body_reconstruction_tpu.pipeline import capture, masking as mk

    d = str(tmp_path)
    img_dir = os.path.join(d, "images")
    os.makedirs(img_dir)
    _write_img(os.path.join(img_dir, "0000.jpg"))

    def fake_build(*a, **kw):
        return {"frames": [{"file_path": "images/0000.jpg",
                            "transform_matrix": np.eye(4).tolist()}]}

    def fake_tv(score_thresh=0.5):
        def detect(img):
            m = np.ones(img.shape[:2], bool)
            return [(1, 0.99, m)]
        return detect

    monkeypatch.setattr(capture, "build_transforms", fake_build)
    monkeypatch.setattr(mk, "torchvision_detector", fake_tv)
    out_json = os.path.join(d, "transforms.json")
    colmap2nerf.main(["--images", img_dir, "--text", d, "--out", out_json,
                      "--mask_categories", "person"])
    data = json.load(open(out_json))
    assert data["frames"][0]["mask_path"] == "images/dynamic_mask_0000.png"
    assert os.path.exists(os.path.join(d, "images/dynamic_mask_0000.png"))
