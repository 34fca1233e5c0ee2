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


def test_native_u8_matches_pil_and_f32():
    """decode_resize_u8: same pipeline as decode_resize, raw uint8 out."""
    if load_native() is None:
        pytest.skip("native toolchain unavailable")
    from PIL import Image

    from hgr_tpu.data.native import decode_resize_u8
    from hgr_tpu.data.transforms import CLIP_MEAN, CLIP_STD, preprocess_pil_uint8

    jb = _jpeg_bytes()
    u8 = decode_resize_u8(jb, 224)
    assert u8.dtype == np.uint8 and u8.shape == (224, 224, 3)
    pil_u8 = preprocess_pil_uint8(Image.open(io.BytesIO(jb)), 224)
    assert float(np.abs(u8.astype(int) - pil_u8.astype(int)).mean()) < 2.0
    # normalizing the u8 output reproduces the fused f32 output to <1 level
    f32 = decode_resize(jb, 224)
    renorm = (u8.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
    assert float(np.abs(renorm - f32).max()) < 1.5 / 255.0 / CLIP_STD.min()


def test_encode_image_uint8_matches_f32():
    """The on-device normalization of raw uint8 batches (the 4x-cheaper H2D
    edge) must produce the same features as host-normalized float32 input."""
    import jax
    import jax.numpy as jnp

    from hgr_tpu.data.transforms import CLIP_MEAN, CLIP_STD
    from hgr_tpu.models.clip import clip_init, encode_image, get_config

    cfg = get_config("TEST-RN")
    params = clip_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, size=(2, cfg.image_resolution,
                                    cfg.image_resolution, 3), dtype=np.uint8)
    f32 = (u8.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
    out_u8 = encode_image(params, cfg, jnp.asarray(u8), dtype=jnp.float32)
    out_f32 = encode_image(params, cfg, jnp.asarray(f32), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(out_u8), np.asarray(out_f32), atol=1e-5, rtol=1e-5
    )


def test_raw_uint8_file_source(tmp_path):
    from PIL import Image

    jb = _jpeg_bytes(64, 48)
    p = tmp_path / "a.jpg"
    p.write_bytes(jb)
    raw = FileImageSource(resolution=32)  # raw_uint8 defaults on
    out = raw.load("c", [str(p)], 0)
    assert out.dtype == np.uint8 and out.shape == (32, 32, 3)
    legacy = FileImageSource(resolution=32, raw_uint8=False)
    out_f = legacy.load("c", [str(p)], 0)
    assert out_f.dtype == np.float32


def test_geometry_matches_torchvision_semantics():
    """Resize/crop geometry must be torchvision's EXACTLY (the reference's
    transform, ``clip/clip.py:71-78`` via torchvision 0.8): the resized long
    side is int(n_px * long / short) — TRUNCATED, not rounded — and the
    center-crop origin is int(round(diff / 2.0)) under Python-3
    half-to-even rounding, not floor."""
    from hgr_tpu.data.transforms import crop_origin, resized_dims

    # truncation: 53*16/37 = 22.92 -> 22 (rounding would give 23)
    assert resized_dims(37, 53, 16) == (16, 22)
    assert resized_dims(53, 37, 16) == (22, 16)
    # short side already n_px: torchvision returns the image unresized
    assert resized_dims(16, 100, 16) == (16, 100)
    assert resized_dims(100, 16, 16) == (100, 16)
    # crop origins: diff 32 -> 16; odd diffs round half-to-even
    assert crop_origin(256, 224) == 16
    assert crop_origin(227, 224) == 2  # round(1.5) = 2 (floor gives 1)
    assert crop_origin(229, 224) == 2  # round(2.5) = 2
    assert crop_origin(231, 224) == 4  # round(3.5) = 4 (floor gives 3)


def test_native_geometry_agrees_with_pil_on_edge_cases():
    """Native and PIL paths must pick identical resize dims and crop
    origins where the torchvision semantics diverge from naive
    round/floor: a truncating long side (210*32/100 = 67.2 -> 67) whose
    crop diff is 35 (odd, % 4 == 3 -> origin 18, not 17)."""
    if load_native() is None:
        pytest.skip("native toolchain unavailable")
    from PIL import Image

    from hgr_tpu.data.native import decode_resize_u8
    from hgr_tpu.data.transforms import preprocess_pil_uint8

    jb = _jpeg_bytes(w=100, h=210)
    out_n = decode_resize_u8(jb, 32).astype(np.int32)
    out_p = preprocess_pil_uint8(
        Image.open(io.BytesIO(jb)), 32
    ).astype(np.int32)
    assert out_n.shape == out_p.shape == (32, 32, 3)
    # same pixels selected => only resample-kernel noise remains; a 1-px
    # origin or dims mismatch on this gradient image shows up as a large
    # mean shift
    assert float(np.abs(out_n - out_p).mean()) < 2.0


def test_native_prescale_branch_stays_close_to_pil():
    """Large JPEGs (short side >= 2*out_px) take libjpeg's DCT-domain
    prescale fast path before the bicubic — a deliberate speed/quality
    tradeoff the full-resolution PIL path doesn't make. Pin that it stays
    sub-1% of full scale (measured: mean |diff| ~0.37/255, max ~5/255 on a
    textured 1200x1000 image) so a prescale regression is caught."""
    if load_native() is None:
        pytest.skip("native toolchain unavailable")
    from PIL import Image

    from hgr_tpu.data.native import decode_resize_u8
    from hgr_tpu.data.transforms import preprocess_pil_uint8

    rng = np.random.default_rng(0)
    base = rng.standard_normal((10, 12, 3))
    arr = np.kron(base, np.ones((100, 100, 1)))
    arr += 0.3 * rng.standard_normal(arr.shape)
    arr = ((arr - arr.min()) / np.ptp(arr) * 255).astype(np.uint8)
    b = io.BytesIO()
    Image.fromarray(arr).save(b, format="JPEG", quality=92)
    jb = b.getvalue()

    out_n = decode_resize_u8(jb, 224).astype(np.int32)
    out_p = preprocess_pil_uint8(
        Image.open(io.BytesIO(jb)), 224
    ).astype(np.int32)
    d = np.abs(out_n - out_p)
    assert float(d.mean()) < 1.0
    assert int(d.max()) <= 12
