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


class TestReader:
    """Decode side (`gsio_read_pair`): the input data plane."""

    def _pair(self, tmp_path, rng, h=40, w=56, name="000000"):
        import cv2
        img = _smooth(h, w)
        mask = rng.integers(0, 3, (h, w), np.uint8)
        ip = str(tmp_path / f"img_{name}.jpg")
        mp = str(tmp_path / f"mask_{name}.png")
        cv2.imwrite(ip, img[:, :, ::-1])
        cv2.imwrite(mp, mask)
        return ip, mp, mask

    def test_denom1_bit_identical_to_cv2(self, tmp_path, rng):
        import cv2
        ip, mp, mask = self._pair(tmp_path, rng)
        img_n, mask_n = native.read_pair(ip, mp, 1)
        img_c = cv2.cvtColor(cv2.imread(ip), cv2.COLOR_BGR2RGB)
        assert np.array_equal(img_n, img_c)  # both ride libjpeg
        assert np.array_equal(mask_n, mask)

    @pytest.mark.parametrize("denom", [2, 4])
    def test_scaled_decode(self, tmp_path, rng, denom):
        """Fused DCT-domain downscale: exact dims (ceil(x/d)), mask on
        cv2.INTER_NEAREST's src = dst*d grid, image close to the
        decode-then-resize pipeline on smooth content."""
        import cv2
        ip, mp, mask = self._pair(tmp_path, rng, h=41, w=57)
        img_n, mask_n = native.read_pair(ip, mp, denom)
        h, w = -(-41 // denom), -(-57 // denom)
        assert img_n.shape == (h, w, 3) and mask_n.shape == (h, w)
        assert np.array_equal(mask_n, mask[::denom, ::denom])
        full = cv2.cvtColor(cv2.imread(ip), cv2.COLOR_BGR2RGB)
        ref = cv2.resize(full, (w, h))
        assert np.abs(img_n.astype(int) - ref.astype(int)).mean() < 8.0

    def test_single_component_and_errors(self, tmp_path, rng):
        ip, mp, _ = self._pair(tmp_path, rng)
        img, none = native.read_pair(ip, None, 1)
        assert img is not None and none is None
        none2, mask = native.read_pair(None, mp, 1)
        assert none2 is None and mask is not None
        with pytest.raises(RuntimeError):
            native.read_pair(str(tmp_path / "missing.jpg"), None, 1)
        with pytest.raises(RuntimeError):
            native.read_pair(ip, None, 3)  # unsupported denom

    def test_rejects_non_gray_mask_png(self, tmp_path, rng):
        import cv2
        rgb = rng.integers(0, 255, (8, 8, 3), np.uint8)
        mp = str(tmp_path / "mask_rgb.png")
        cv2.imwrite(mp, rgb)
        with pytest.raises(RuntimeError):
            native.read_pair(None, mp, 1)

    def test_rejects_16bit_gray_mask_png(self, tmp_path, rng):
        """16-bit gray must fail (-> cv2 fallback), not strip to the high
        byte: class ids 1/2/3 stored as 16-bit values would all read 0."""
        import cv2
        m16 = rng.integers(0, 4, (8, 8)).astype(np.uint16)
        mp = str(tmp_path / "mask_16.png")
        assert cv2.imwrite(mp, m16)
        with pytest.raises(RuntimeError):
            native.read_pair(None, mp, 1)


class TestDatasetNativeReader:
    """SegmentationDataset(native_reader=True) plugs the native decode in."""

    def _make_set(self, tmp_path, rng, n=3, h=32, w=32):
        import cv2
        d = tmp_path / "val"
        d.mkdir(exist_ok=True)
        for i in range(n):
            img = _smooth(h, w)
            mask = rng.integers(0, 2, (h, w), np.uint8)
            cv2.imwrite(str(d / f"img_{i:06d}.jpg"), img[:, :, ::-1])
            cv2.imwrite(str(d / f"mask_{i:06d}.png"), mask)
        return tmp_path

    @pytest.mark.parametrize("scale", [1.0, 0.5])
    def test_matches_cv2_path(self, tmp_path, rng, scale):
        from gan_segmentation_tpu.data.segmentation import (
            FFHQHairSegmentation)
        root = self._make_set(tmp_path, rng)
        kw = dict(split="val", transform=None, scale_factor=scale)
        ds_n = FFHQHairSegmentation(root, native_reader=True, **kw)
        ds_c = FFHQHairSegmentation(root, native_reader=False, **kw)
        assert ds_n._native_denom == int(round(1 / scale))
        for i in range(len(ds_c.images)):
            img_n, mask_n = ds_n[i]
            img_c, mask_c = ds_c[i]
            assert img_n.shape == img_c.shape and img_n.dtype == np.uint8
            assert np.array_equal(mask_n.shape, mask_c.shape)
            if scale == 1.0:  # identical decode; masks always lossless
                assert np.array_equal(img_n, img_c)
                assert np.array_equal(mask_n, mask_c)
            else:  # DCT-scaled decode deviates from INTER_LINEAR by design
                assert np.abs(img_n.astype(int) - img_c.astype(int)
                              ).mean() < 12.0

    def test_unsupported_scale_falls_back(self, tmp_path, rng):
        from gan_segmentation_tpu.data.segmentation import (
            FFHQHairSegmentation)
        root = self._make_set(tmp_path, rng)
        ds = FFHQHairSegmentation(root, split="val", transform=None,
                                  scale_factor=0.3, native_reader=True)
        assert ds._native_denom == 0  # 1/0.3 not in {1,2,4,8} -> cv2 path
        img, mask = ds[0]
        assert img.shape[:2] == mask.shape


def test_batch_iter_decode_workers_deterministic_set(tmp_path, rng):
    """Parallel decode returns batches identical to sequential decode when
    item i is a pure function of i (val split: no sampling/augment RNG)."""
    import cv2
    from gan_segmentation_tpu.data.segmentation import FFHQHairSegmentation
    from gan_segmentation_tpu.train.deeplab_trainer import batch_iter
    d = tmp_path / "val"
    d.mkdir()
    for i in range(8):
        cv2.imwrite(str(d / f"img_{i:06d}.jpg"), _smooth(16, 16))
        cv2.imwrite(str(d / f"mask_{i:06d}.png"),
                    rng.integers(0, 2, (16, 16), np.uint8))
    ds = FFHQHairSegmentation(tmp_path, split="val", transform=None,
                              native_reader=True)
    seq = list(batch_iter(ds, 4, shuffle=False, decode_workers=1))
    par = list(batch_iter(ds, 4, shuffle=False, decode_workers=4))
    assert len(seq) == len(par) == 2
    for (i1, m1, _), (i2, m2, _) in zip(seq, par):
        assert np.array_equal(i1, i2) and np.array_equal(m1, m2)
