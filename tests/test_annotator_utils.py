"""Headless tests: annotator stroke model/rasterization, batchify, crops."""

import numpy as np
import jax.numpy as jnp

from gan_segmentation_tpu.apps.annotator import StrokeBuffer, save_annotation
from gan_segmentation_tpu.data.batchify import MultiPad, Stack, Tuple, pad_to_multiple
from gan_segmentation_tpu.data.collection import CollectionDataset
from gan_segmentation_tpu.ops.losses import (
    area_normalized_focal_loss_softmax, normalized_focal_loss_sigmoid,
)
from gan_segmentation_tpu.utils.image import crop_image, prepare_crop


class TestStrokeBuffer:
    def test_rasterize_trimap_encoding(self):
        sb = StrokeBuffer()
        sb.mouse_down((10, 10), width=8, negative=False)  # positive blob
        sb.add_point((20, 10), width=8, negative=False)
        sb.mouse_up()
        sb.mouse_down((40, 40), width=8, negative=True)   # negative blob
        sb.mouse_up()
        gray = sb.rasterize(64, 64)
        assert gray.shape == (64, 64)
        assert gray[10, 15] == 255      # positive stroke -> 255
        assert gray[40, 40] == 128      # negative stroke -> gray
        assert gray[0, 0] == 0          # untouched -> ignore
        # trimap mapping consistency with CollectionDataset
        from gan_segmentation_tpu.data.collection import trimap_from_gray
        tri = trimap_from_gray(gray)
        assert tri[10, 15] == 1 and tri[40, 40] == 0 and tri[0, 0] == -1

    def test_undo_removes_last_drag(self):
        sb = StrokeBuffer()
        sb.mouse_down((5, 5), 4, False)
        sb.add_point((6, 6), 4, False)
        sb.mouse_up()
        sb.mouse_down((30, 30), 4, False)
        sb.add_point((31, 31), 4, False)
        sb.mouse_up()
        assert len(sb.history) == 4
        removed = sb.undo_last_action()
        assert removed == 2 and len(sb.history) == 2
        gray = sb.rasterize(64, 64)
        assert gray[30, 30] == 0 and gray[5, 5] == 255

    def test_save_roundtrip(self, tmp_path):
        sb = StrokeBuffer()
        sb.mouse_down((8, 8), 6, False)
        sb.mouse_up()
        img = np.random.RandomState(0).randint(0, 255, (32, 32, 3)).astype(np.uint8)
        feats = [np.zeros((4, 4, 512), np.float32),
                 np.zeros((8, 8, 512), np.float32),
                 np.zeros((16, 16, 512), np.float32),
                 np.zeros((32, 32, 512), np.float32)]
        save_annotation(str(tmp_path), 3, img, img, sb.rasterize(32, 32), feats)
        ds = CollectionDataset(str(tmp_path), load_to_memory=True)
        assert len(ds) == 1
        _, mask, loaded = ds[0]
        assert mask[8, 8] == 1
        assert loaded[0].shape == (4, 4, 512)  # NCHW pickle -> NHWC


class TestBatchify:
    def test_multipad(self):
        a = np.ones((3, 4), np.float32)
        b = np.ones((5, 2), np.float32)
        out, lengths = MultiPad(axis=(0, 1), ret_length=True)([a, b])
        assert out.shape == (2, 5, 4)
        np.testing.assert_array_equal(lengths, [[3, 4], [5, 2]])
        assert out[0, 3:, :].sum() == 0 and out[1, :, 2:].sum() == 0

    def test_tuple_stack(self):
        data = [(np.ones(3), np.zeros(2)), (np.ones(3), np.zeros(2))]
        imgs, masks = Tuple(Stack(), Stack())(data)
        assert imgs.shape == (2, 3) and masks.shape == (2, 2)

    def test_pad_to_multiple(self):
        x = np.ones((5, 7, 3))
        y = pad_to_multiple(x, 4, axes=(0, 1))
        assert y.shape == (8, 8, 3)


class TestCrops:
    def test_crop_image_in_bounds(self):
        img = np.arange(36).reshape(6, 6)
        out = crop_image(img, [1, 2, 3, 2])
        np.testing.assert_array_equal(out, img[2:4, 1:4])

    def test_crop_image_out_of_bounds_pads(self):
        img = np.ones((4, 4), np.uint8)
        out = crop_image(img, [-2, -2, 4, 4])
        assert out.shape == (4, 4)
        assert out[0, 0] == 0 and out[3, 3] == 1

    def test_prepare_crop(self):
        img = np.ones((10, 20, 3), np.uint8)
        out = prepare_crop(img, (8, 8))
        assert out.shape == (8, 8, 3)


class TestExtraLosses:
    def test_area_normalized_focal(self):
        rs = np.random.RandomState(0)
        logits = jnp.asarray(rs.randn(2, 8, 8, 2).astype(np.float32))
        labels = jnp.asarray(rs.randint(0, 2, (2, 8, 8)).astype(np.int32))
        area = jnp.ones((2, 8, 8))
        loss, mult = area_normalized_focal_loss_softmax(logits, labels, area)
        assert loss.shape == (2,) and np.isfinite(np.asarray(loss)).all()

    def test_sigmoid_focal_normalized(self):
        rs = np.random.RandomState(1)
        logits = jnp.asarray(rs.randn(2, 8, 8).astype(np.float32))
        labels = jnp.asarray(rs.randint(-1, 2, (2, 8, 8)).astype(np.int32))
        loss, mult = normalized_focal_loss_sigmoid(logits, labels)
        assert loss.shape == (2,) and np.isfinite(np.asarray(loss)).all()


class TestVizHelpers:
    """`deeplabv3plus/lib/utils/viz.py:6-28`, `utils.py:69-109`."""

    def test_vocpallete_golden(self):
        from gan_segmentation_tpu.utils.viz import getvocpallete
        pal = getvocpallete(4)
        # gluoncv bit-interleave: 0->black, 1->dark red, 2->dark green,
        # 3->dark yellow
        assert pal[:3] == [0, 0, 0]
        assert pal[3:6] == [128, 0, 0]
        assert pal[6:9] == [0, 128, 0]
        assert pal[9:12] == [128, 128, 0]

    def test_visualize_mask_maps_ignore_to_background(self):
        from gan_segmentation_tpu.utils.viz import visualize_mask
        mask = np.array([[-1, 0], [1, 2]], np.int32)
        rgb = visualize_mask(mask, num_classes=3)
        assert rgb.shape == (2, 2, 3) and rgb.dtype == np.uint8
        # reference semantics (viz.py:24-28): -1 renders as background,
        # every other label keeps its own palette color
        assert (rgb[0, 0] == [0, 0, 0]).all()   # ignore -> palette[0]
        assert (rgb[0, 1] == [0, 0, 0]).all()   # class 0 -> black
        assert (rgb[1, 0] == [128, 0, 0]).all()  # class 1 -> dark red
        assert (rgb[1, 1] == [0, 128, 0]).all()  # class 2 -> dark green
        # the input mask is NOT mutated (unlike the reference's in-place
        # assignment)
        assert mask[0, 0] == -1
        rgb2 = visualize_mask(np.array([[1]], np.int32), num_classes=3)
        assert (rgb2[0, 0] == [128, 0, 0]).all()

    def test_get_draw_mask_overlay(self):
        from gan_segmentation_tpu.utils.viz import (get_draw_mask,
                                                    get_seg_color_map)
        img = np.full((2, 2, 3), 100, np.uint8)
        mask = np.array([[0, 1], [2, 0]], np.int32)
        out = get_draw_mask(img, mask, alpha=0.5)
        cmap = dict((k, v) for k, v in get_seg_color_map())
        # background untouched (skip_background=True, `utils.py:88-89`)
        assert (out[0, 0] == 100).all() and (out[1, 1] == 100).all()
        np.testing.assert_array_equal(
            out[0, 1], (0.5 * cmap[1] + 0.5 * 100).astype(np.uint8))
        np.testing.assert_array_equal(
            out[1, 0], (0.5 * cmap[2] + 0.5 * 100).astype(np.uint8))

    def test_morph_mask_removes_specks_keeps_blobs(self):
        from gan_segmentation_tpu.utils.viz import morph_mask
        mask = np.zeros((32, 32), np.uint8)
        mask[8:24, 8:24] = 1          # solid blob survives
        mask[12, 12] = 0              # pinhole gets closed
        mask[1, 1] = 1                # lone speck gets opened away
        out = morph_mask(mask)
        assert out[12, 12] == 1
        assert out[1, 1] == 0
        assert out[10:22, 10:22].all()
