"""Segmentation pipeline tests (offline backends only)."""

import os

import numpy as np
import pytest

from human_body_reconstruction_tpu.pipeline import segment


def _subject_image(h=64, w=64):
    """Bright subject on dark background."""
    img = np.full((h, w, 3), 20, np.uint8)
    img[12:52, 18:46] = [200, 150, 120]
    return img


def test_center_prior_box():
    b = segment.center_prior_box(100, 200)
    assert 0 <= b[0] < b[2] <= 200 and 0 <= b[1] < b[3] <= 100


def test_grabcut_masks_subject():
    img = _subject_image()
    m = segment.mask_grabcut(img)
    assert m.shape == (64, 64)
    # subject mostly kept, corners mostly removed
    assert m[30, 30] == 1.0
    assert m[:4, :4].mean() < 0.5


def test_threshold_backend():
    img = _subject_image()
    m = segment.mask_threshold(img)
    assert m.shape == (64, 64)
    assert m[30, 30] == 1.0


def test_segment_images_writes_outputs(tmp_path):
    from PIL import Image

    src = tmp_path / "imgs"
    src.mkdir()
    for k in range(3):
        Image.fromarray(_subject_image()).save(src / f"{k}.png")
    out = str(tmp_path / "seg")
    written = segment.segment_images(str(src / "*.png"), out,
                                     backend="grabcut")
    assert len(written) == 3
    for p in written:
        assert os.path.exists(p) and "GRABCUT" in p
    assert os.path.exists(os.path.join(out, "contact_grabcut.png"))
    # masked image: background zeroed
    arr = np.asarray(Image.open(written[0]))
    assert arr[0, 0].sum() <= arr[30, 30].sum()


def test_segment_images_empty_glob_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        segment.segment_images(str(tmp_path / "*.png"), str(tmp_path))


def test_load_config(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text("segmentation:\n  input: ./data/body/images\n"
                 "  output: ./data/body/SegmentedImages\n  h: 1280\n  w: 720\n")
    cfg = segment.load_config(str(p))
    assert cfg["input"] == "./data/body/images"
    assert cfg["h"] == 1280


def test_cli(tmp_path):
    from PIL import Image

    from human_body_reconstruction_tpu.cli import segment as seg_cli

    src = tmp_path / "imgs"
    src.mkdir()
    Image.fromarray(_subject_image()).save(src / "a.png")
    out = str(tmp_path / "o")
    seg_cli.main(["--input", str(src), "--output", out,
                  "--backend", "threshold"])
    assert os.path.exists(os.path.join(out, "THRESHOLD", "a.png"))
