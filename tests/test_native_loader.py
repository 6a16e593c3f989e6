"""Native C++ image loader tests: decode/crop/resize parity vs the python
(cv2) pipeline, and the prefetch pool."""

import numpy as np
import pytest

from cap4d_tpu.data.utils import apply_bg, crop_image, rescale_image
from cap4d_tpu.runtime import loader


@pytest.fixture(scope="module")
def built():
    if not loader.native_available():
        pytest.skip("native loader could not be built")
    return True


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    import cv2

    tmp = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    # smooth image so resampling-kernel differences stay small
    base = rng.uniform(0, 255, size=(16, 16, 3))
    img = cv2.resize(base, (96, 96), interpolation=cv2.INTER_CUBIC)
    img = np.clip(img, 0, 255).astype(np.uint8)
    png = tmp / "img.png"
    jpg = tmp / "img.jpg"
    cv2.imwrite(str(png), img[..., ::-1])
    cv2.imwrite(str(jpg), img[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, 98])
    return img, png, jpg


def _python_pipeline(img, crop_box, res):
    out = crop_image(img.astype(np.float64), np.asarray(crop_box), bg_value=255)
    out = rescale_image(out, res)
    return (out / 127.5 - 1.0).astype(np.float32)


@pytest.mark.parametrize("fmt", ["png", "jpg"])
def test_decode_matches(built, images, fmt):
    img, png, jpg = images
    path = png if fmt == "png" else jpg
    out = loader.load_frame_native(path, None, 96)
    assert out is not None and out.shape == (96, 96, 3)
    ref = (img / 127.5 - 1.0).astype(np.float32)
    tol = 0.02 if fmt == "png" else 0.08  # jpeg is lossy
    assert np.abs(out - ref).mean() < tol


def test_crop_and_downscale_matches_python(built, images):
    img, png, _ = images
    crop_box = [-10, 5, 70, 85]  # out-of-bounds crop exercises padding
    out = loader.load_frame_native(png, crop_box, 40)
    ref = _python_pipeline(img, crop_box, 40)
    assert out.shape == ref.shape
    # area-downsample implementations differ slightly at cell boundaries
    assert np.abs(out - ref).mean() < 0.03
    # padded corner must be exactly background white
    np.testing.assert_allclose(out[0, 0], 1.0, atol=1e-6)


def test_upscale(built, images):
    img, png, _ = images
    out = loader.load_frame_native(png, [0, 0, 48, 48], 96)
    ref = _python_pipeline(img, [0, 0, 48, 48], 96)
    assert np.abs(out - ref).mean() < 0.03


def test_prefetch_pool(built, images):
    img, png, jpg = images
    pre = loader.NativePrefetcher(n_threads=4)
    tickets = [pre.submit(png if i % 2 == 0 else jpg, [0, 0, 96, 96], 32)
               for i in range(12)]
    seq = [pre.wait(t, 32) for t in tickets]
    direct = loader.load_frame_native(png, [0, 0, 96, 96], 32)
    np.testing.assert_allclose(seq[0], direct, atol=1e-6)
    np.testing.assert_allclose(seq[2], seq[0], atol=1e-6)  # same source frame
    pre.close()


def test_missing_file(built):
    assert loader.load_frame_native("/nonexistent.png", None, 16) is None
