"""Native C++ preprocessing: build, parity with the PIL path, performance
sanity."""

import time

import numpy as np
import pytest

from mast3r_slam_tpu import native
from mast3r_slam_tpu.models.preprocess import resize_img, resize_img_native

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain"
)


class TestNativeOps:
    def test_resize_identity(self, rng):
        img = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
        out = native.resize_u8(img, 32, 48)
        np.testing.assert_array_equal(out, img)

    def test_area_downscale_matches_box_mean(self, rng):
        img = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
        out = native.resize_u8(img, 16, 24)  # exact 2x2 boxes
        expect = (
            img.reshape(16, 2, 24, 2, 3).astype(np.float64).mean(axis=(1, 3))
        )
        np.testing.assert_allclose(out, np.round(expect), atol=1.0)

    def test_bilinear_upscale_smooth(self, rng):
        img = np.zeros((8, 8, 3), np.uint8)
        img[:, 4:] = 255
        out = native.resize_u8(img, 16, 16)
        assert out.shape == (16, 16, 3)
        assert (np.diff(out[0, :, 0].astype(int)) >= 0).all()  # monotone edge

    def test_crop_normalize(self, rng):
        img = rng.integers(0, 255, (20, 30, 3), dtype=np.uint8)
        out = native.crop_normalize(img, 2, 3, 10, 12)
        expect = img[2:12, 3:15].astype(np.float32) / 127.5 - 1.0
        np.testing.assert_allclose(out, expect, atol=1e-5)


class TestResizeImgNative:
    def test_geometry_matches_pil_path(self, rng):
        img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
        a = resize_img(img, 512)
        b = resize_img_native(img, 512)
        np.testing.assert_array_equal(a["true_shape"], b["true_shape"])
        assert a["img"].shape == b["img"].shape

    def test_pixels_close_to_pil(self, rng):
        # smooth image -> filters agree closely
        yy, xx = np.mgrid[0:480, 0:640]
        img = np.stack(
            [
                127 + 100 * np.sin(xx / 50),
                127 + 100 * np.cos(yy / 60),
                127 + 50 * np.sin((xx + yy) / 80),
            ],
            axis=-1,
        ).astype(np.uint8)
        a = resize_img(img, 512)["img"]
        b = resize_img_native(img, 512)["img"]
        assert np.abs(a - b).mean() < 0.02  # [-1,1] units

    def test_224_square(self, rng):
        img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
        b = resize_img_native(img, 224)
        h, w = b["true_shape"][0]
        assert h == w == 224

    def test_patch14_crop_alignment(self, rng):
        """patch=14 (DUNE family) crops land on the /14 token grid — the
        reference's hardcoded /16 crop (image.py:75) would break its own
        patch-14 DuneMast3r through any loader enforcing token alignment.
        Both preprocess paths agree on the geometry."""
        for shape in [(480, 640), (640, 480), (500, 500), (252, 336)]:
            img = rng.integers(0, 255, (*shape, 3), dtype=np.uint8)
            for size in (336, 512):
                a = resize_img(img, size, patch=14)
                b = resize_img_native(img, size, patch=14)
                h, w = a["true_shape"][0]
                assert h % 14 == 0 and w % 14 == 0, (shape, size, h, w)
                np.testing.assert_array_equal(a["true_shape"], b["true_shape"])

    def test_patch16_square_source_stays_aligned(self, rng):
        """The 4:3-from-square special case also lands on the patch grid."""
        img = rng.integers(0, 255, (500, 500, 3), dtype=np.uint8)
        r = resize_img(img, 512)
        h, w = r["true_shape"][0]
        assert h % 16 == 0 and w % 16 == 0

    def test_faster_than_pil(self, rng):
        img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
        resize_img_native(img, 512)  # warm the .so
        t0 = time.perf_counter()
        for _ in range(5):
            resize_img(img, 512)
        t_pil = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(5):
            resize_img_native(img, 512)
        t_nat = time.perf_counter() - t0
        # generous slack: this only guards against pathological regressions
        # (the host may be contended by device work during CI)
        assert t_nat < t_pil * 3.0
