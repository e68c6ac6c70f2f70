"""Extra dataset/augmentation coverage: ImagesDirectory (+depth),
LSUN not_ignore filter, PSP-style OriginalRGBSegmentationAug."""

import cv2
import numpy as np

from gan_segmentation_tpu.data.augment import OriginalRGBSegmentationAug
from gan_segmentation_tpu.data.segmentation import (
    ImagesDirectory, LSUNBedroomsSegmentation, imagenet_transform,
)


class TestImagesDirectory:
    def test_plain(self, tmp_path):
        for i in range(3):
            cv2.imwrite(str(tmp_path / f"im{i}.png"),
                        np.full((8, 8, 3), i * 10, np.uint8))
        ds = ImagesDirectory(str(tmp_path), num_class=2)
        assert len(ds) == 3
        img, target, path = ds[0]
        assert img.shape == (8, 8, 3)
        assert (target == -1).all()          # fake all-ignore target
        assert path.endswith("im0.png")
        assert ds.pred_offset == 1

    def test_with_depth(self, tmp_path):
        cv2.imwrite(str(tmp_path / "im0.png"), np.zeros((8, 8, 3), np.uint8))
        depth = np.full((8, 8), 100, np.uint16)
        depth[0, 0] = 0  # missing-depth hole
        cv2.imwrite(str(tmp_path / "d0.tiff"), depth)
        ds = ImagesDirectory(str(tmp_path), num_class=2, images_mask="im*.png",
                             depth_mask="d*.tiff", depth_k=50.0,
                             depth_mean=0.5, depth_std=0.25)
        (img, d), target, _ = ds[0]
        assert d.shape == (8, 8, 1)
        # inverse-depth transform: min(k/(depth+1), 1) normalized
        expect = min(50.0 / 101.0, 1.0)
        np.testing.assert_allclose(d[4, 4, 0], (expect - 0.5) / 0.25,
                                   rtol=1e-5)


class TestLSUN:
    def test_not_ignore_filter(self, tmp_path):
        d = tmp_path / "val"
        d.mkdir()
        img = np.zeros((8, 8, 3), np.uint8)
        mask = np.arange(64, dtype=np.uint8).reshape(8, 8) % 5  # labels 0..4
        cv2.imwrite(str(d / "img_000000.jpg"), img)
        cv2.imwrite(str(d / "mask_000000.png"), mask)
        ds = LSUNBedroomsSegmentation(str(tmp_path), split="val",
                                      num_classes=150,
                                      not_ignore_classes=[1, 2])
        _, m = ds[0]
        assert set(np.unique(m)) <= {-1, 1, 2}


class TestUint8FeedPath:
    """transform=None must deliver uint8 all the way to the device feed, and
    on-device normalization must equal the host imagenet_transform path
    (the ADVICE r2 high finding: an astype(f32) in __getitem__ silently
    bypassed _device_normalize, training on raw 0-255 images)."""

    def _make_dataset(self, tmp_path, transform):
        from gan_segmentation_tpu.data.augment import (
            CenterCrop, PadIfNeeded, RGBSegmentationAug)
        from gan_segmentation_tpu.data.segmentation import FFHQHairSegmentation
        d = tmp_path / "val"
        d.mkdir(exist_ok=True)
        rs = np.random.RandomState(0)
        for i in range(2):
            cv2.imwrite(str(d / f"img_{i:06d}.jpg"),
                        rs.randint(0, 255, (16, 16, 3)).astype(np.uint8))
            cv2.imwrite(str(d / f"mask_{i:06d}.png"),
                        rs.randint(0, 2, (16, 16)).astype(np.uint8))
        aug = RGBSegmentationAug([PadIfNeeded(16, 16), CenterCrop(16, 16)],
                                 ignore_class=-1)
        return FFHQHairSegmentation(str(tmp_path), split="val",
                                    transform=transform, augmentator=aug)

    def test_dataset_delivers_uint8_and_batch_iter_preserves_it(self, tmp_path):
        from gan_segmentation_tpu.train.deeplab_trainer import (
            SegmentationTrainer, batch_iter)
        ds = self._make_dataset(tmp_path, transform=None)
        img, mask = ds[0]
        assert img.dtype == np.uint8, "transform=None must keep uint8"
        imgs, masks, _ = next(iter(batch_iter(ds, 2, shuffle=False)))
        assert imgs.dtype == np.uint8
        feed = SegmentationTrainer._feed(imgs, 256)
        assert feed.dtype == np.uint8  # uint8 rides the host link untouched

    def test_device_normalize_equals_imagenet_transform(self, tmp_path):
        import jax.numpy as jnp
        from gan_segmentation_tpu.train.deeplab_trainer import _device_normalize
        ds_raw = self._make_dataset(tmp_path, transform=None)
        ds_f32 = self._make_dataset(tmp_path, transform=imagenet_transform)
        raw, _ = ds_raw[0]
        ref, _ = ds_f32[0]
        on_device = np.asarray(_device_normalize(jnp.asarray(raw)))
        np.testing.assert_allclose(on_device, ref, atol=1e-5)
        # f32 feeds pass through unchanged (trace specializes on dtype)
        np.testing.assert_allclose(
            np.asarray(_device_normalize(jnp.asarray(ref))), ref, atol=0)


class TestOriginalAug:
    def test_val_mode(self):
        aug = OriginalRGBSegmentationAug(base_size=64, crop_size=32,
                                         mode="val", seed=0)
        img = np.random.RandomState(0).randint(0, 255, (48, 64, 3)).astype(np.uint8)
        mask = np.random.RandomState(1).randint(0, 2, (48, 64)).astype(np.int32)
        ai, am = aug(img, mask)
        assert ai.shape == (32, 32, 3) and am.shape == (32, 32)
        assert set(np.unique(am)) <= {0, 1}

    def test_train_mode(self):
        aug = OriginalRGBSegmentationAug(base_size=40, crop_size=32,
                                         mode="train", seed=0)
        img = np.random.RandomState(0).randint(0, 255, (48, 64, 3)).astype(np.uint8)
        mask = np.random.RandomState(1).randint(0, 2, (48, 64)).astype(np.int32)
        for _ in range(5):
            ai, am = aug(img, mask)
            assert ai.shape == (32, 32, 3) and am.shape == (32, 32)


class TestBatchIterErrors:
    def test_dataset_error_propagates_instead_of_hanging(self):
        """A decode failure in the prefetch worker must raise in the
        consumer, not strand it on q.get() forever (the worker used to die
        without enqueueing its sentinel)."""
        from gan_segmentation_tpu.train.deeplab_trainer import batch_iter

        class Broken:
            def __len__(self):
                return 8

            def __getitem__(self, i):
                if i >= 4:
                    raise OSError(f"corrupt record {i}")
                a = np.zeros((4, 4, 3), np.uint8)
                return a, np.zeros((4, 4), np.int32)

        it = batch_iter(Broken(), 2, shuffle=False, prefetch=1)
        next(it)  # first batches are fine
        with np.testing.assert_raises(OSError):
            for _ in it:
                pass

    def test_dataset_error_propagates_with_decode_pool(self):
        from gan_segmentation_tpu.train.deeplab_trainer import batch_iter

        class Broken:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                raise ValueError("always broken")

        with np.testing.assert_raises(ValueError):
            next(batch_iter(Broken(), 2, shuffle=False, decode_workers=2))
