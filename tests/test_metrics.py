"""Metric tests against hand-computed values (reference math)."""

import numpy as np

from gan_segmentation_tpu.metrics import (
    SegMetric, SegmentationMetric, SegmentationMetricDetailed,
    batch_intersection_union, batch_pix_accuracy, get_classes_names,
)


def logits_for(labels, nclass=2, margin=5.0):
    """Logits whose argmax equals ``labels`` (ignore pixels get class 0)."""
    safe = np.clip(labels, 0, nclass - 1)
    out = np.zeros(labels.shape + (nclass,), np.float32)
    np.put_along_axis(out, safe[..., None], margin, axis=-1)
    return out


class TestSegmentationMetric:
    def test_perfect_prediction(self):
        labels = np.random.RandomState(0).randint(0, 2, (2, 8, 8))
        m = SegmentationMetric(2, skip_bg=True)
        m.update([labels], [logits_for(labels)])
        names, values = m.get()
        assert dict(zip(names, values)) == {"accuracy": 1.0, "mean-iou": 1.0}

    def test_ignore_pixels_not_counted(self):
        labels = np.zeros((1, 4, 4), np.int64)
        labels[0, 0] = -1
        pred = logits_for(np.zeros((1, 4, 4), np.int64))
        # make predictions on the ignored row wrong: shouldn't matter
        pred[0, 0, :, :] = [[0, 5]] * 4
        labels[0, 1, 0] = 1  # one real positive, predicted 0 -> fn
        m = SegmentationMetric(2, skip_bg=False)
        m.update([labels], [pred])
        names, values = m.get()
        d = dict(zip(names, values))
        # 12 valid pixels, 11 correct
        np.testing.assert_allclose(d["accuracy"], 11 / 12, rtol=1e-6)

    def test_known_iou(self):
        # 2x2: gt = [[1,1],[0,0]], pred = [[1,0],[0,0]]
        labels = np.array([[[1, 1], [0, 0]]], np.int64)
        pred = logits_for(np.array([[[1, 0], [0, 0]]], np.int64))
        m = SegmentationMetric(2, skip_bg=True)
        m.update([labels], [pred])
        _, values = m.get()
        acc, miou = values
        np.testing.assert_allclose(acc, 3 / 4)
        np.testing.assert_allclose(miou, 1 / 2)  # fg: inter 1, union 2

    def test_threshold_mode(self):
        """binary mode: pred = P(cls1) > threshold (`segmentation.py:392-394`)."""
        labels = np.array([[[1, 1], [0, 0]]], np.int64)
        probs = np.zeros((1, 2, 2, 2), np.float32)
        probs[..., 1] = [[0.4, 0.6], [0.3, 0.2]]
        probs[..., 0] = 1 - probs[..., 1]
        m_low = SegmentationMetric(2, threshold=1e-15)  # everything -> fg
        m_low.update([labels], [probs])
        _, v = m_low.get()
        np.testing.assert_allclose(v[0], 0.5)  # half the pixels are fg
        m_mid = SegmentationMetric(2, threshold=0.5)
        m_mid.update([labels], [probs])
        _, v2 = m_mid.get()
        np.testing.assert_allclose(v2[0], 3 / 4)  # one fg missed


class TestSegMetric:
    def test_precision_recall_iou(self):
        labels = np.array([[[1, 1], [0, 0]]], np.int64)
        pred = logits_for(np.array([[[1, 0], [1, 0]]], np.int64))
        m = SegMetric(2, skip_bg=True, full_output=True,
                      class_names=get_classes_names("hair")[0])
        m.update([labels], [pred])
        d = dict(m.get_name_value())
        np.testing.assert_allclose(d["hair-recall"], 0.5)     # tp1 fn1
        np.testing.assert_allclose(d["hair-precision"], 0.5)  # tp1 fp1
        np.testing.assert_allclose(d["hair-iou"], 1 / 3)      # tp1 fp1 fn1
        np.testing.assert_allclose(d["accuracy"], 0.5)

    def test_detailed_with_dice_and_auc(self):
        rs = np.random.RandomState(1)
        labels = rs.randint(0, 2, (2, 8, 8))
        probs = rs.rand(2, 8, 8, 2).astype(np.float32)
        probs /= probs.sum(-1, keepdims=True)
        m = SegmentationMetricDetailed(2, compute_auc=True, full_output=True)
        m.update([labels], [probs])
        d = dict(m.get_name_value())
        for k in ("mean-dice", "mean-macro-dice", "mean-auc", "mean-ap"):
            assert k in d and np.isfinite(d[k])


class TestHistogramHelpers:
    def test_batch_pix_accuracy(self):
        labels = np.array([[[1, -1], [0, 0]]], np.int64)
        pred = logits_for(np.array([[[1, 1], [1, 0]]], np.int64))
        corr, lab = batch_pix_accuracy(pred, labels)
        assert (corr, lab) == (2, 3)

    def test_batch_intersection_union(self):
        labels = np.array([[[1, 1], [0, 0]]], np.int64)
        pred = logits_for(np.array([[[1, 0], [0, 0]]], np.int64))
        inter, union = batch_intersection_union(pred, labels, 2)
        np.testing.assert_array_equal(inter, [2, 1])
        np.testing.assert_array_equal(union, [3, 2])

    def test_class_maps(self):
        names, n = get_classes_names("face")
        assert n == 9 and names[1] == "hair" and names[8] == "beard"
