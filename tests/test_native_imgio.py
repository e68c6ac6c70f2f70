"""Native C++ image writer (gan_segmentation_tpu/native/imgio.cc).

The native encoder must be drop-in equivalent to the reference's cv2 writer
loop (`main.py:100-103`): JPEG bytes decode to the same pixels as cv2's
encode at the same quality (both ride libjpeg-turbo defaults), and mask PNGs
round-trip exactly — including from the device's bit-packed form.
"""

import os

import numpy as np
import pytest

from gan_segmentation_tpu import native

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def _smooth(h, w):
    g = np.indices((h, w)).sum(0)[..., None] * np.array([1.0, 0.7, 0.4])
    return (g % 256).astype(np.uint8)


class TestEncoders:
    def test_jpeg_matches_cv2_encoder(self, tmp_path, rng):
        import cv2
        for img in (rng.integers(0, 256, (40, 56, 3), np.uint8),
                    _smooth(40, 56)):
            native.write_jpeg(tmp_path / "n.jpg", img)
            cv2.imwrite(str(tmp_path / "c.jpg"), img[:, :, ::-1])
            nb = cv2.imread(str(tmp_path / "n.jpg"))
            cb = cv2.imread(str(tmp_path / "c.jpg"))
            assert np.array_equal(nb, cb)

    def test_png_roundtrip_exact(self, tmp_path, rng):
        import cv2
        mask = rng.integers(0, 4, (33, 48), np.uint8)  # class ids incl. >1
        native.write_png_gray(tmp_path / "m.png", mask)
        back = cv2.imread(str(tmp_path / "m.png"), cv2.IMREAD_GRAYSCALE)
        assert np.array_equal(back, mask)

    def test_png_packed_unpacks_msb_first(self, tmp_path, rng):
        """Packed input must follow np.unpackbits order (the device packs
        with weights [128,..,1], train/generator.py)."""
        import cv2
        mask = rng.integers(0, 2, (16, 64), np.uint8)
        packed = np.packbits(mask, axis=-1)
        native.write_png_gray(tmp_path / "p.png", packed, packed=True,
                              width=64)
        back = cv2.imread(str(tmp_path / "p.png"), cv2.IMREAD_GRAYSCALE)
        assert np.array_equal(back, mask)

    def test_input_validation(self, tmp_path, rng):
        with pytest.raises(ValueError):
            native.write_jpeg(tmp_path / "x.jpg",
                              rng.integers(0, 2, (4, 4), np.uint8))
        with pytest.raises(ValueError):  # packed width mismatch
            native.write_png_gray(tmp_path / "x.png",
                                  np.zeros((4, 4), np.uint8), packed=True,
                                  width=64)


class TestPairWriter:
    def test_pool_writes_all_pairs(self, tmp_path, rng):
        import cv2
        img = _smooth(32, 32)
        mask = rng.integers(0, 2, (32, 32), np.uint8)
        packed = np.packbits(mask, axis=-1)
        n = 25
        with native.PairWriter(threads=2, queue_cap=4) as writer:
            for i in range(n):
                writer.submit(tmp_path / f"img_{i:06d}.jpg",
                              tmp_path / f"mask_{i:06d}.png",
                              img=img, mask=packed, mask_packed=True,
                              mask_width=32)
        assert writer.submitted == n
        for i in range(n):
            assert np.array_equal(
                cv2.imread(str(tmp_path / f"mask_{i:06d}.png"),
                           cv2.IMREAD_GRAYSCALE), mask)
            assert os.path.getsize(tmp_path / f"img_{i:06d}.jpg") > 0

    def test_mask_only_and_img_only(self, tmp_path, rng):
        import cv2
        mask = rng.integers(0, 2, (8, 8), np.uint8)
        with native.PairWriter(threads=1) as writer:
            writer.submit(mask_path=tmp_path / "only_mask.png", mask=mask)
            writer.submit(img_path=tmp_path / "only_img.jpg",
                          img=_smooth(8, 8))
        assert np.array_equal(
            cv2.imread(str(tmp_path / "only_mask.png"),
                       cv2.IMREAD_GRAYSCALE), mask)
        assert os.path.getsize(tmp_path / "only_img.jpg") > 0

    def test_failed_write_surfaces_on_finish(self, tmp_path, rng):
        writer = native.PairWriter(threads=1)
        writer.submit(mask_path=tmp_path / "no" / "such" / "dir" / "m.png",
                      mask=np.zeros((4, 4), np.uint8))
        with pytest.raises(RuntimeError, match="failed"):
            writer.finish()

    def test_submit_after_finish_raises(self, tmp_path):
        writer = native.PairWriter(threads=1)
        writer.finish()
        with pytest.raises(RuntimeError):
            writer.submit(mask_path=tmp_path / "m.png",
                          mask=np.zeros((4, 4), np.uint8))
        writer.finish()  # idempotent
