"""MultiEvalModel paths: multi-scale, flip, prob-avg, pad vs sliding."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_segmentation_tpu.models.decoder import mx_xavier_in
from gan_segmentation_tpu.train.deeplab_trainer import MultiEvalModel, _pad_image
from flax import linen as nn


class TinySeg(nn.Module):
    """A trivially cheap 'segmentation model' for eval-protocol tests."""

    nclass: int = 2

    @nn.compact
    def __call__(self, x, train=False):
        y = nn.Conv(self.nclass, (3, 3), padding=1,
                    kernel_init=mx_xavier_in())(x)
        return (y,)


def build(nclass=2, crop=32, base=48, scales=(1.0,), flip=True, prob_avg=False):
    m = TinySeg(nclass)
    v = jax.jit(lambda x: m.init(jax.random.PRNGKey(0), x, False))(
        jnp.zeros((1, crop, crop, 3)))
    return MultiEvalModel(m, v["params"], v.get("batch_stats", {}), nclass,
                          base_size=base, crop_size=crop, flip=flip,
                          scales=scales, prob_avg=prob_avg)


def test_output_shape_and_finiteness():
    ev = build(scales=(0.5, 1.0, 1.5))
    img = np.random.RandomState(0).randn(48, 40, 3).astype(np.float32)
    scores = ev(img)
    assert scores.shape == (48, 40, 2)
    assert np.isfinite(scores).all()


def test_single_scale_small_image_pads():
    """image smaller than crop -> pad + single forward path."""
    ev = build(crop=32, base=16, scales=(1.0,), flip=False)
    img = np.random.RandomState(0).randn(16, 16, 3).astype(np.float32)
    scores = ev(img)
    assert scores.shape == (16, 16, 2)


def test_flip_symmetry():
    """flip-averaged scores of a mirrored image are mirrored scores."""
    ev = build(crop=32, base=32, scales=(1.0,), flip=True)
    img = np.random.RandomState(1).randn(32, 32, 3).astype(np.float32)
    s1 = ev(img)
    s2 = ev(img[:, ::-1].copy())
    np.testing.assert_allclose(s1, s2[:, ::-1], rtol=1e-4, atol=1e-5)


def test_prob_avg_changes_combination():
    ev_logit = build(crop=32, base=48, scales=(1.0,), flip=True)
    ev_prob = build(crop=32, base=48, scales=(1.0,), flip=True, prob_avg=True)
    img = np.random.RandomState(2).randn(48, 48, 3).astype(np.float32)
    a, b = ev_logit(img), ev_prob(img)
    assert not np.allclose(a, b)
    # prob-avg outputs are probabilities in [0, 1]
    assert b.min() >= 0 and b.max() <= 1 + 1e-5


def test_pad_image():
    # gluoncv segbase._pad_image semantics: padding is -mean/std per channel
    # (black pre-normalization), NOT zero (zero = ImageNet-mean pixel)
    from gan_segmentation_tpu.data.segmentation import (
        IMAGENET_MEAN, IMAGENET_STD)

    img = np.ones((10, 20, 3), np.float32)
    out = _pad_image(img, 16)
    assert out.shape == (16, 20, 3)
    np.testing.assert_allclose(out[10:],
                               np.broadcast_to(-IMAGENET_MEAN / IMAGENET_STD,
                                               (6, 20, 3)), rtol=1e-6)
    np.testing.assert_array_equal(out[:10], img)


def test_device_label_path_matches_prob_update():
    """`SegmentationTester.test` feeds metrics a device-computed (H, W)
    label map instead of full probs; both must produce identical numbers."""
    from gan_segmentation_tpu.metrics.seg_metrics import SegMetric

    rs = np.random.RandomState(3)
    scores = rs.randn(2, 24, 24, 2).astype(np.float32)
    mask = rs.randint(-1, 2, (2, 24, 24)).astype(np.int64)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(scores), axis=-1))
    labels = (probs[..., 1] > 0.5).astype(np.int64)

    m_prob = SegMetric(2, threshold=0.5, compute_dice=True)
    m_prob.update([mask], [probs])
    m_lab = SegMetric(2, threshold=0.5, compute_dice=True)
    m_lab.update([mask], [labels])

    n1, v1 = m_prob.get()
    n2, v2 = m_lab.get()
    assert n1 == n2
    np.testing.assert_allclose(v1, v2, rtol=1e-12)


def test_device_scores_equals_call():
    ev = build(crop=32, base=48, scales=(1.0,), flip=True)
    img = np.random.RandomState(5).randn(48, 48, 3).astype(np.float32)
    a = ev(img)
    b = np.asarray(ev.device_scores(img))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_batched_scores_equal_per_image():
    """device_scores_batch (one vmapped program for B images) must equal
    the per-image path exactly — the b>1 batching is a pure reorganization
    of the same protocol (VERDICT r2 #8)."""
    ev = build(crop=32, base=48, scales=(0.75, 1.0), flip=True)
    rs = np.random.RandomState(7)
    imgs = [rs.randn(40, 36, 3).astype(np.float32) for _ in range(3)]
    batched = np.asarray(ev.device_scores_batch(imgs))
    assert batched.shape == (3, 40, 36, 2)
    for i, img in enumerate(imgs):
        np.testing.assert_allclose(batched[i], np.asarray(ev.device_scores(img)),
                                   rtol=2e-5, atol=1e-6)


def test_batched_program_cache_lru():
    """One cached program per (b, h, w, c); the LRU cap evicts."""
    ev = build(crop=16, base=16, scales=(1.0,), flip=False)
    ev._programs_cap = 2
    rs = np.random.RandomState(8)
    ev.device_scores(rs.randn(16, 16, 3).astype(np.float32))      # (1,16,16,3)
    ev.device_scores_batch([rs.randn(16, 16, 3).astype(np.float32)] * 2)
    assert len(ev._programs) == 2
    ev.device_scores(rs.randn(20, 16, 3).astype(np.float32))      # evicts oldest
    assert len(ev._programs) == 2
    assert (1, 16, 16, 3) not in ev._programs


def test_tester_pads_ragged_bucket_to_one_program():
    """SegmentationTester.test: 3 same-shape images at bs=2 must compile ONE
    program (the b=2 one, ragged tail padded with repeats) and score
    exactly the same metrics as the per-image path."""
    import types

    from gan_segmentation_tpu.metrics.seg_metrics import (
        SegMetric, SegmentationMetric)
    from gan_segmentation_tpu.train.deeplab_trainer import SegmentationTester

    rs = np.random.RandomState(0)
    items = [(rs.randn(32, 32, 3).astype(np.float32),
              rs.randint(0, 2, (32, 32)).astype(np.int32)) for _ in range(3)]

    def make_tester(bs):
        t = object.__new__(SegmentationTester)
        t.args = types.SimpleNamespace(test_batch_size=bs, dtype="float32")
        t.metric = SegMetric(2, class_names=["bg", "fg"], skip_bg=True,
                             threshold=0.5, compute_dice=True)
        t.metric_orig = SegmentationMetric(2, skip_bg=True, threshold=0.5)
        t.evaluator = build(crop=32, base=32, scales=(1.0,), flip=False)
        return t

    t2 = make_tester(2)
    t2.test(items, batch_size=2)
    # one compiled program for the shape, at the full batch size
    assert list(t2.evaluator._programs) == [(2, 32, 32, 3)]

    t1 = make_tester(1)
    t1.test(items, batch_size=1)
    n2, v2 = t2.metric.get()
    n1, v1 = t1.metric.get()
    assert n1 == n2
    np.testing.assert_allclose(v2, v1, rtol=1e-6, atol=1e-8)
