"""Unit tests for the TPU-native primitive ops against naive numpy
implementations of the reference (mxnet) semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from gan_segmentation_tpu.ops import (
    conv2d, conv_transpose2d, depthwise_conv2d,
    upsample_nearest_2x, bilinear_resize,
    pixel_norm, instance_norm, blur_3x3,
    wscale_std, softmax_ce_with_ignore, weighted_softmax_ce,
)
from gan_segmentation_tpu.ops.blur import blur_kernel
from gan_segmentation_tpu.ops.losses import (
    softmax_ce_valid_norm, normalized_focal_loss_softmax, seg_loss_with_aux,
)


def naive_conv2d(x, w, stride=1, pad=0, dilation=1):
    """x: NHWC, w: HWIO. Plain cross-correlation like mxnet Convolution."""
    n, h, ww_, c = x.shape
    kh, kw, cin, cout = w.shape
    x = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    eff_kh = (kh - 1) * dilation + 1
    eff_kw = (kw - 1) * dilation + 1
    oh = (x.shape[1] - eff_kh) // stride + 1
    ow = (x.shape[2] - eff_kw) // stride + 1
    out = np.zeros((n, oh, ow, cout), np.float32)
    for i in range(oh):
        for j in range(ow):
            patch = x[:, i * stride:i * stride + eff_kh:dilation,
                      j * stride:j * stride + eff_kw:dilation, :]
            out[:, i, j, :] = np.tensordot(patch, w, axes=([1, 2, 3], [0, 1, 2]))
    return out


def naive_deconv2d(x, w_mx, stride=2, pad=1):
    """mxnet Deconvolution semantics. x: NHWC; w_mx: (Cin, Cout, kh, kw)."""
    n, h, ww_, cin = x.shape
    _, cout, kh, kw = w_mx.shape
    oh = (h - 1) * stride - 2 * pad + kh
    ow = (ww_ - 1) * stride - 2 * pad + kw
    full = np.zeros((n, oh + 2 * pad, ow + 2 * pad, cout), np.float32)
    for i in range(h):
        for j in range(ww_):
            contrib = np.einsum('nc,cokl->nklo', x[:, i, j, :], w_mx)
            full[:, i * stride:i * stride + kh, j * stride:j * stride + kw, :] += contrib
    if pad:
        return full[:, pad:-pad, pad:-pad, :]
    return full


class TestConv:
    def test_conv2d_matches_naive(self, rng):
        x = rng.randn(2, 8, 8, 3).astype(np.float32)
        w = rng.randn(3, 3, 3, 5).astype(np.float32)
        got = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), padding=1))
        want = naive_conv2d(x, w, pad=1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_conv2d_dilated(self, rng):
        x = rng.randn(1, 12, 12, 2).astype(np.float32)
        w = rng.randn(3, 3, 2, 4).astype(np.float32)
        got = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), padding=2, dilation=2))
        want = naive_conv2d(x, w, pad=2, dilation=2)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_conv2d_stride(self, rng):
        x = rng.randn(1, 9, 9, 2).astype(np.float32)
        w = rng.randn(3, 3, 2, 4).astype(np.float32)
        got = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), padding=1, stride=2))
        want = naive_conv2d(x, w, pad=1, stride=2)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_depthwise(self, rng):
        x = rng.randn(1, 6, 6, 4).astype(np.float32)
        w = rng.randn(3, 3, 1, 4).astype(np.float32)
        got = np.asarray(depthwise_conv2d(jnp.asarray(x), jnp.asarray(w), padding=1))
        # depthwise == per-channel conv
        for ch in range(4):
            want = naive_conv2d(x[..., ch:ch + 1], w[:, :, :, ch:ch + 1], pad=1)
            np.testing.assert_allclose(got[..., ch:ch + 1], want, rtol=1e-4, atol=1e-4)

    def test_conv_transpose_matches_mxnet_deconv(self, rng):
        """k=4 s=2 p=1 'fused upscale' deconv (`networks_stylegan.py:16-17`)."""
        x = rng.randn(2, 5, 5, 3).astype(np.float32)
        w_mx = rng.randn(3, 4, 4, 4).astype(np.float32)  # (Cin, Cout, kh, kw)
        # convert to our conv-equivalent HWIO orientation (flip + transpose)
        w = np.ascontiguousarray(w_mx[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))
        got = np.asarray(conv_transpose2d(jnp.asarray(x), jnp.asarray(w),
                                          stride=2, padding=1))
        want = naive_deconv2d(x, w_mx, stride=2, pad=1)
        assert got.shape == (2, 10, 10, 4)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestResize:
    def test_upsample_nearest(self, rng):
        x = rng.randn(1, 3, 3, 2).astype(np.float32)
        got = np.asarray(upsample_nearest_2x(jnp.asarray(x)))
        want = x.repeat(2, axis=1).repeat(2, axis=2)
        np.testing.assert_array_equal(got, want)

    def test_bilinear_align_corners(self):
        # align-corners: endpoints map exactly, midpoints are true averages
        x = np.arange(4, dtype=np.float32).reshape(1, 1, 4, 1)
        x = np.broadcast_to(x, (1, 4, 4, 1)).copy()
        got = np.asarray(bilinear_resize(jnp.asarray(x), 4, 7))[0, 0, :, 0]
        want = np.linspace(0, 3, 7)  # (in-1)/(out-1) spacing
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_bilinear_identity(self, rng):
        x = rng.randn(1, 5, 5, 3).astype(np.float32)
        got = np.asarray(bilinear_resize(jnp.asarray(x), 5, 5))
        np.testing.assert_array_equal(got, x)

    def test_bilinear_downsample_corners(self, rng):
        x = rng.randn(1, 9, 9, 2).astype(np.float32)
        got = np.asarray(bilinear_resize(jnp.asarray(x), 3, 3))
        # corners must match exactly under align-corners
        np.testing.assert_allclose(got[0, 0, 0], x[0, 0, 0], rtol=1e-5)
        np.testing.assert_allclose(got[0, 2, 2], x[0, 8, 8], rtol=1e-5)
        np.testing.assert_allclose(got[0, 1, 1], x[0, 4, 4], rtol=1e-5)


class TestNorm:
    def test_pixel_norm(self, rng):
        x = rng.randn(2, 4, 4, 8).astype(np.float32)
        got = np.asarray(pixel_norm(jnp.asarray(x)))
        want = x / np.sqrt(np.mean(x ** 2, axis=-1, keepdims=True) + 1e-8)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_instance_norm(self, rng):
        x = rng.randn(2, 6, 6, 3).astype(np.float32)
        got = np.asarray(instance_norm(jnp.asarray(x)))
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        want = (x - mean) / np.sqrt(var + 1e-5)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        # normalized output has ~zero mean / unit var per (n, c)
        np.testing.assert_allclose(got.mean(axis=(1, 2)), 0.0, atol=1e-5)


class TestBlur:
    def test_blur_kernel_normalized(self):
        k = np.asarray(blur_kernel(4))
        assert k.shape == (3, 3, 1, 4)
        np.testing.assert_allclose(k[:, :, 0, 0].sum(), 1.0, rtol=1e-6)
        np.testing.assert_allclose(k[:, :, 0, 0],
                                   np.outer([1, 2, 1], [1, 2, 1]) / 16.0)

    def test_blur_preserves_constant(self):
        x = jnp.ones((1, 8, 8, 2), jnp.float32)
        got = np.asarray(blur_3x3(x))
        # interior stays 1 (kernel sums to 1); borders attenuate (zero pad)
        np.testing.assert_allclose(got[0, 1:-1, 1:-1], 1.0, rtol=1e-5)
        assert got[0, 0, 0, 0] < 1.0


class TestWscale:
    def test_std(self):
        assert wscale_std((3, 3, 16, 32), gain=np.sqrt(2)) == pytest.approx(
            np.sqrt(2) / np.sqrt(3 * 3 * 16))
        assert wscale_std((512, 512), gain=1.0) == pytest.approx(1.0 / np.sqrt(512))


class TestLosses:
    def test_ce_ignores_ignore_label(self, rng):
        logits = rng.randn(2, 4, 4, 2).astype(np.float32)
        labels = rng.randint(0, 2, (2, 4, 4)).astype(np.int32)
        labels[0, 0, :] = -1
        got = np.asarray(softmax_ce_with_ignore(jnp.asarray(logits), jnp.asarray(labels)))
        # naive: per-pixel CE, zero at ignored, mean over H*W (total count)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        p = e / e.sum(-1, keepdims=True)
        safe = np.clip(labels, 0, 1)
        ce = -np.log(np.take_along_axis(p, safe[..., None], -1))[..., 0]
        ce = ce * (labels != -1)
        want = ce.reshape(2, -1).mean(axis=1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_valid_norm_differs_from_total_norm(self, rng):
        logits = rng.randn(1, 4, 4, 2).astype(np.float32)
        labels = np.zeros((1, 4, 4), np.int32)
        labels[0, :2] = -1  # half ignored
        total = np.asarray(softmax_ce_with_ignore(jnp.asarray(logits), jnp.asarray(labels)))[0]
        valid = float(softmax_ce_valid_norm(jnp.asarray(logits), jnp.asarray(labels)))
        np.testing.assert_allclose(valid, total * 2.0, rtol=1e-4)

    def test_focal_renormalization(self, rng):
        logits = rng.randn(2, 8, 8, 2).astype(np.float32)
        labels = rng.randint(0, 2, (2, 8, 8)).astype(np.int32)
        loss, mult = normalized_focal_loss_softmax(jnp.asarray(logits), jnp.asarray(labels))
        assert loss.shape == (2,)
        assert np.isfinite(np.asarray(loss)).all() and float(mult) > 0

    def test_aux_loss_combination(self, rng):
        p1 = rng.randn(1, 4, 4, 2).astype(np.float32)
        p2 = rng.randn(1, 4, 4, 2).astype(np.float32)
        y = rng.randint(0, 2, (1, 4, 4)).astype(np.int32)
        combo = np.asarray(seg_loss_with_aux(jnp.asarray(p1), jnp.asarray(p2),
                                             jnp.asarray(y), aux_weight=0.5))
        l1 = np.asarray(softmax_ce_with_ignore(jnp.asarray(p1), jnp.asarray(y)))
        l2 = np.asarray(softmax_ce_with_ignore(jnp.asarray(p2), jnp.asarray(y)))
        np.testing.assert_allclose(combo, l1 + 0.5 * l2, rtol=1e-5)

    def test_weighted_ce_weight_scaling(self, rng):
        logits = rng.randn(1, 2, 2, 2).astype(np.float32)
        labels = np.ones((1, 2, 2), np.int32)
        w2 = np.full((1, 2, 2), 2.0, np.float32)
        l1 = np.asarray(weighted_softmax_ce(jnp.asarray(logits), jnp.asarray(labels),
                                            jnp.ones((1, 2, 2))))
        l2 = np.asarray(weighted_softmax_ce(jnp.asarray(logits), jnp.asarray(labels),
                                            jnp.asarray(w2)))
        np.testing.assert_allclose(l2, 2 * l1, rtol=1e-5)


class TestSubpixelDeconv:
    def test_matches_dilated_form(self, rng):
        from gan_segmentation_tpu.ops.conv import (
            conv_transpose2d, conv_transpose2d_subpixel,
        )
        x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
        w = jnp.asarray(rng.randn(4, 4, 4, 3).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(3).astype(np.float32))
        ref = conv_transpose2d(x, w, b, stride=2, padding=1)
        got = conv_transpose2d_subpixel(x, w, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestComposedUpConv:
    """`ops.conv.upsample2x_conv2d` must equal upsample_nearest_2x + conv2d
    exactly (the composition is an algebraic identity, not an approximation)."""

    def test_matches_two_op_form(self, rng):
        from gan_segmentation_tpu.ops.conv import upsample2x_conv2d
        x = jnp.asarray(rng.randn(2, 7, 9, 5).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 5, 4).astype(np.float32) * 0.2)
        b = jnp.asarray(rng.randn(4).astype(np.float32))
        ref = conv2d(upsample_nearest_2x(x), w, b, padding=1)
        got = upsample2x_conv2d(x, w, b, padding=1)
        assert got.shape == (2, 14, 18, 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_compose_kernel_identity_filter(self, rng):
        from gan_segmentation_tpu.ops.conv import compose_kernel_2d
        w = jnp.asarray(rng.randn(3, 3, 2, 6).astype(np.float32))
        ident = np.zeros((1, 1), np.float32)
        ident[0, 0] = 1.0
        got = compose_kernel_2d(w, ident)
        np.testing.assert_allclose(np.asarray(got), np.asarray(w), rtol=1e-6)


class TestConvTransposeBlurFold:
    """`conv_transpose2d_blur` == blur_3x3(conv_transpose2d(...)) exactly —
    incl. the 1-pixel border ring the naive kernel composition gets wrong
    (the blur zero-pads the CROPPED deconv output; the fold repairs the
    ring with strip corrections from the input borders)."""

    @pytest.mark.parametrize("shape", [(2, 5, 7, 3, 4), (1, 4, 4, 16, 8),
                                       (3, 2, 3, 2, 2), (1, 1, 2, 3, 3)])
    def test_matches_sequential_pair(self, rng, shape):
        from gan_segmentation_tpu.ops.blur import blur_3x3
        from gan_segmentation_tpu.ops.conv import conv_transpose2d_blur
        b, h, w_, ci, co = shape
        x = jnp.asarray(rng.randn(b, h, w_, ci).astype(np.float32))
        w = jnp.asarray(rng.randn(4, 4, ci, co).astype(np.float32) * 0.3)
        ref = blur_3x3(conv_transpose2d(x, w, stride=2, padding=1))
        got = conv_transpose2d_blur(x, w)
        assert got.shape == ref.shape == (b, 2 * h, 2 * w_, co)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_rejects_asymmetric_kernel(self, rng):
        """The ring repair hardcodes the symmetric-kernel identities
        (near/far strips both scaled by k1d[0], one corner tap for all
        four); an asymmetric filter_kernel must refuse loudly rather than
        return a silently wrong border ring."""
        from gan_segmentation_tpu.ops.conv import conv_transpose2d_blur
        x = jnp.asarray(rng.randn(1, 3, 3, 2).astype(np.float32))
        w = jnp.asarray(rng.randn(4, 4, 2, 2).astype(np.float32))
        with pytest.raises(AssertionError, match="symmetric"):
            conv_transpose2d_blur(x, w, filter_kernel=(1, 3, 2))

    def test_generator_fold_matches_sequential(self, rng):
        """Full generator at 128px (first fused-upscale block): fold_blur
        True/False share one param tree and produce identical outputs."""
        from gan_segmentation_tpu.core.config import GanConfig
        from gan_segmentation_tpu.models.stylegan import init_generator
        import dataclasses
        import jax

        cfg = GanConfig(max_res_log2=7, dtype="f32", fold_blur=False)
        model_seq, params = init_generator(cfg, seed=0)
        model_fold = type(model_seq)(
            dataclasses.replace(cfg, fold_blur=True), jnp.float32)
        z = jax.random.normal(jax.random.PRNGKey(1), (2, 512))
        noise = jax.random.PRNGKey(2)
        rgb_a, feats_a = jax.jit(lambda p, z, r: model_seq.apply(
            {"params": p}, z, rngs={"noise": r}))(params, z, noise)
        rgb_b, feats_b = jax.jit(lambda p, z, r: model_fold.apply(
            {"params": p}, z, rngs={"noise": r}))(params, z, noise)
        np.testing.assert_allclose(np.asarray(rgb_a), np.asarray(rgb_b),
                                   rtol=1e-4, atol=1e-4)
        for fa, fb in zip(feats_a, feats_b):
            np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                                       rtol=1e-4, atol=1e-4)
