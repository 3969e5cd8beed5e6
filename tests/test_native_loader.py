"""Native C++ frame loader (native/frame_loader.cpp): build, decode parity
vs the PIL path, dataset integration, and graceful fallback."""

import os

import numpy as np
import pytest
from PIL import Image

from svd_xtend_tpu import native
from svd_xtend_tpu.data.dataset import FrameFolderDataset


@pytest.fixture(scope="module")
def frame_folder(tmp_path_factory):
    root = tmp_path_factory.mktemp("clips")
    rng = np.random.default_rng(0)
    for v in range(2):
        d = root / f"video_{v}"
        d.mkdir()
        for i in range(6):
            img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
            Image.fromarray(img).save(d / f"{i:05d}.jpg", quality=95)
    return str(root)


def test_native_builds_and_loads(frame_folder):
    assert native.available(), "g++ + libjpeg are in the image; build must work"
    folder = os.path.join(frame_folder, "video_0")
    paths = [os.path.join(folder, f) for f in sorted(os.listdir(folder))[:4]]
    clip = native.load_clip(paths, 32, 24)
    assert clip.shape == (4, 24, 32, 3) and clip.dtype == np.float32
    assert -1.0 <= clip.min() and clip.max() <= 1.0


def test_native_matches_pil_bilinear(frame_folder):
    folder = os.path.join(frame_folder, "video_0")
    path = os.path.join(folder, sorted(os.listdir(folder))[0])
    clip = native.load_clip([path], 32, 24)
    with Image.open(path) as img:
        ref = np.asarray(img.convert("RGB").resize((32, 24), Image.BILINEAR),
                         np.float32) / 127.5 - 1.0
    # same libjpeg decode; resize differs only in rounding of the filter
    assert np.abs(clip[0] - ref).max() < 0.05


def test_dataset_native_vs_pil_path(frame_folder):
    ds_n = FrameFolderDataset(frame_folder, width=32, height=24,
                              sample_frames=4, use_native=True)
    ds_p = FrameFolderDataset(frame_folder, width=32, height=24,
                              sample_frames=4, use_native=False)
    a = ds_n.get(seed=1, step=2, position=3)
    b = ds_p.get(seed=1, step=2, position=3)
    assert a.shape == b.shape == (4, 24, 32, 3)
    # bilinear (native) vs bicubic (PIL reference path): close, not equal
    assert np.abs(a - b).mean() < 0.08


def test_missing_file_falls_back_to_none(tmp_path):
    out = native.load_clip([str(tmp_path / "nope.jpg")], 8, 8)
    assert out is None
