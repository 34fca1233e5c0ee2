"""Native C++ decode/resize core: parity vs the PIL transform + fallbacks."""

import io
import os

import numpy as np
import pytest

from hgr_tpu.data.native import decode_resize, load_native
from hgr_tpu.data.pipeline import FileImageSource
from hgr_tpu.data.transforms import preprocess_pil


def _jpeg_bytes(w=512, h=384, quality=95):
    from PIL import Image

    x = np.linspace(0, 1, h)[:, None] * np.linspace(0, 1, w)[None, :]
    arr = (np.stack([x, x ** 2, 1 - x], -1) * 255).astype(np.uint8)
    b = io.BytesIO()
    Image.fromarray(arr).save(b, format="JPEG", quality=quality)
    return b.getvalue()


def test_native_matches_pil_transform():
    if load_native() is None:
        pytest.skip("native toolchain unavailable")
    from PIL import Image

    jb = _jpeg_bytes()
    out_n = decode_resize(jb, 224)
    out_p = preprocess_pil(Image.open(io.BytesIO(jb)), 224)
    assert out_n.shape == (224, 224, 3)
    # normalized units; ~1/255 pixel-level agreement
    assert float(np.abs(out_n - out_p).max()) < 0.06
    assert float(np.abs(out_n - out_p).mean()) < 0.01


def test_native_rejects_garbage():
    if load_native() is None:
        pytest.skip("native toolchain unavailable")
    assert decode_resize(b"definitely not a jpeg", 224) is None


def test_file_source_native_and_fallback(tmp_path):
    from PIL import Image

    jb = _jpeg_bytes(64, 48)
    good = tmp_path / "good.jpg"
    good.write_bytes(jb)
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"junk")
    png = tmp_path / "img.png"
    Image.fromarray(np.full((32, 32, 3), 100, np.uint8)).save(png)

    src = FileImageSource(resolution=32)
    out = src.load("c", [str(good)], 0)
    assert out.shape == (32, 32, 3)
    # corrupt jpeg -> class's first image (reference dataset/imagenet.py:149-152)
    out_bad = src.load("c", [str(good), str(bad)], 1)
    np.testing.assert_allclose(out_bad, out)
    # non-JPEG goes through the PIL path
    out_png = src.load("c", [str(png)], 0)
    assert out_png.shape == (32, 32, 3)
