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
