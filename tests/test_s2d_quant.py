"""Int8 quantized s2d decoder inference (`ops/quant.py`).

Random-init decoders are the WORST case for mask agreement (logits hover
near zero, so tiny noise flips argmax); trained weights separate classes
and agree harder. Thresholds below hold with margin on that worst case.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_segmentation_tpu.core.config import SolverConfig
from gan_segmentation_tpu.models.decoder import decoder_from_config
from gan_segmentation_tpu.ops.quant import (
    apply_s2d_int8, collect_calibration, conv2d_s8, prepare_s2d_int8,
    quantize_act, quantize_weight,
)
from gan_segmentation_tpu.ops.s2d_decoder import (
    apply_s2d_prepared, class_mask_s2d, prepare_s2d,
)


def _pyramids(cfg, seed, batch=2):
    return [jnp.asarray(
        np.random.RandomState(seed + i).randn(
            batch, 2 ** (i + 2), 2 ** (i + 2), c), jnp.float32)
        for i, c in enumerate(cfg.in_channels)]


def test_quantize_weight_per_channel():
    rs = np.random.RandomState(0)
    k = jnp.asarray(rs.randn(3, 3, 8, 16) * rs.rand(16) * 5, jnp.float32)
    q, scale = quantize_weight(k)
    assert q.dtype == jnp.int8 and scale.shape == (16,)
    # every channel uses its full int8 range
    assert int(jnp.max(jnp.abs(q.astype(jnp.int32)).reshape(-1, 16).max(0)
                       .min())) == 127
    np.testing.assert_allclose(np.asarray(q, np.float32) * np.asarray(scale),
                               np.asarray(k), atol=np.asarray(scale).max())


def test_conv2d_s8_exact_integer():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randint(-127, 128, (2, 10, 10, 8)), jnp.int8)
    w = jnp.asarray(rs.randint(-127, 128, (3, 3, 8, 4)), jnp.int8)
    got = conv2d_s8(x, w, stride=2, padding=1)
    ref = jax.lax.conv_general_dilated(
        x.astype(jnp.int32), w.astype(jnp.int32), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert got.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("case", [
    dict(stride=1, padding=1),                      # the 3x3 conv form
    dict(stride=2, padding=1),                      # strided
    dict(stride=1, padding=1, lhs_dilation=2),      # composed nearest-2x
    dict(stride=1, padding=((1, 2), (1, 2)), lhs_dilation=2),  # k4s2p1 deconv pads
])
def test_conv2d_s8_im2col_matches_conv(case):
    """The two conv2d_s8 formulations (ops/quant.py) are bit-identical:
    integer accumulation is exact, so im2col patch-GEMM == XLA conv for
    every form the generator/decoder int8 paths use. A/B runs through the
    explicit ``form`` kwarg — the env var is frozen at import (ADVICE r4:
    a jitted callable never re-reads it)."""
    rs = np.random.RandomState(7)
    k = 4 if case.get("lhs_dilation") and case["padding"] != 1 else 3
    x = jnp.asarray(rs.randint(-127, 128, (2, 6, 6, 5)), jnp.int8)
    w = jnp.asarray(rs.randint(-127, 128, (k, k, 5, 3)), jnp.int8)
    outs = {form: np.asarray(conv2d_s8(x, w, form=form, **case))
            for form in ("conv", "im2col")}
    assert outs["conv"].dtype == np.int32
    np.testing.assert_array_equal(outs["conv"], outs["im2col"])


def test_int8_form_validation():
    """An unknown formulation must raise, never silently route to the
    measured-21-50x-slower conv emitter (ADVICE r4): both the kwarg and
    the import-time env read are validated."""
    from gan_segmentation_tpu.ops import quant

    x = jnp.zeros((1, 4, 4, 2), jnp.int8)
    w = jnp.zeros((3, 3, 2, 2), jnp.int8)
    with pytest.raises(ValueError, match="form"):
        conv2d_s8(x, w, padding=1, form="imcol")
    with pytest.raises(ValueError, match="GAN_SEG_INT8_CONV"):
        quant._read_once("GAN_SEG_INT8_CONV", "typo'd-default", str,
                         valid=quant._VALID_FORMS)
    with pytest.raises(ValueError, match="GAN_SEG_INT8_CHUNK_MB"):
        quant._read_once("GAN_SEG_INT8_CHUNK_MB", "not-a-number", float)
    # and the env path validates the same way at import time
    import os
    env = dict(os.environ, GAN_SEG_INT8_CONV="IM2COL")  # wrong case
    import subprocess
    import sys
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "import gan_segmentation_tpu.ops.quant"],
        env=env, capture_output=True, text=True, timeout=120)
    assert r.returncode != 0 and "GAN_SEG_INT8_CONV" in r.stderr


@pytest.mark.parametrize("cap,case", [
    (0.0001, dict(stride=1, padding=1)),
    (0.004, dict(stride=1, padding=1)),
    (0.0001, dict(stride=1, padding=((1, 2), (1, 2)), lhs_dilation=2)),
])
def test_conv2d_s8_fused_overcap_fallback_exact(cap, case):
    """conv2d_s8_fused (ops/quant.py): a site whose im2col working set
    exceeds the cap falls back to the conv-emitter form (the lax.map
    chunking it replaced OOMed the TPU compiler at b128 @1024^2 — three
    full-batch 4x-lane-padded copies at the map's fusion boundary). The
    two forms are bit-identical through the FULL float epilogue: same
    integer conv values, same epilogue op order."""
    from gan_segmentation_tpu.ops.quant import conv2d_s8_fused

    rs = np.random.RandomState(3)
    k = 4 if case.get("lhs_dilation") else 3
    x = jnp.asarray(rs.randn(6, 6, 6, 5), jnp.float32)
    w = jnp.asarray(rs.randint(-127, 128, (k, k, 5, 3)), jnp.int8)
    deq = jnp.asarray(rs.rand(3) * 1e-2, jnp.float32)
    bias = jnp.asarray(rs.randn(3), jnp.float32)
    inv = jnp.float32(127.0 / float(jnp.max(jnp.abs(x))))

    ref = np.asarray(conv2d_s8_fused(x, inv, w, deq, bias, **case))
    got = np.asarray(conv2d_s8_fused(x, inv, w, deq, bias, chunk_mb=cap,
                                     **case))
    np.testing.assert_array_equal(ref, got)


def test_conv2d_s8_fused_overcap_integer_exact():
    """The claimed bit-exact part, asserted EXACTLY (ADVICE r4): with
    deq=1 and bias=None the fused body's output IS the s32 integer conv
    (exactly representable in f32 at these magnitudes), so the over-cap
    conv-emitter fallback must agree with im2col to the bit."""
    from gan_segmentation_tpu.ops.quant import conv2d_s8_fused

    rs = np.random.RandomState(9)
    x = jnp.asarray(rs.randn(6, 6, 6, 5), jnp.float32)
    w = jnp.asarray(rs.randint(-127, 128, (3, 3, 5, 3)), jnp.int8)
    one = jnp.ones((3,), jnp.float32)
    inv = jnp.float32(127.0 / float(jnp.max(jnp.abs(x))))
    ref = np.asarray(conv2d_s8_fused(x, inv, w, one, None, padding=1))
    for cap in (0.0001, 0.004):
        got = np.asarray(conv2d_s8_fused(x, inv, w, one, None, padding=1,
                                         chunk_mb=cap))
        assert (got == np.round(got)).all()  # integer-valued f32
        np.testing.assert_array_equal(ref, got)


def test_conv2d_s8_fused_form_policy():
    """The static form policy, pinned at the jaxpr level: under-cap sites
    run the im2col GEMM (a dot_general, no conv primitive), over-cap
    sites fall back to the conv emitter (conv primitive, no scan — the
    removed lax.map chunking must never come back silently: it broke
    fusion and OOMed the b128 compile, and its scan axis could not stay
    sharded under data parallelism). ``batch_shards`` divides the
    estimate, so a batch sharded widely enough re-enables im2col."""
    from gan_segmentation_tpu.ops.quant import conv2d_s8_fused

    rs = np.random.RandomState(11)
    x = jnp.asarray(rs.randn(4, 6, 6, 5), jnp.float32)
    w = jnp.asarray(rs.randint(-127, 128, (3, 3, 5, 3)), jnp.int8)
    deq = jnp.ones((3,), jnp.float32)
    inv = jnp.float32(1.0)

    def jaxpr(**kw):
        return str(jax.make_jaxpr(lambda a: conv2d_s8_fused(
            a, inv, w, deq, None, padding=1, **kw))(x))

    under = jaxpr(chunk_mb=10.0)
    assert "dot_general" in under and "conv_general_dilated" not in under
    over = jaxpr(chunk_mb=0.0001)
    assert "conv_general_dilated" in over and "scan" not in over
    # per-device estimate: 4-way sharding brings this site back under cap
    sharded = jaxpr(chunk_mb=0.004, batch_shards=4)
    assert "dot_general" in sharded and "scan" not in sharded
    # a batch that does NOT divide the dp extent is REPLICATED by
    # core/mesh.shard_batch (every device runs the full batch), so the
    # policy must size the full working set — dividing anyway would
    # re-admit the compile-OOM sites the cap reroutes (review r5)
    nondividing = jaxpr(chunk_mb=0.004, batch_shards=3)
    assert "conv_general_dilated" in nondividing


def test_im2col_chunk_mib_counts_full_working_set():
    """The chunk estimator includes the s32 accumulator and the dilated
    input copy, not just the s8 patches (ADVICE r4: patches alone admit a
    several-x larger real peak)."""
    from gan_segmentation_tpu.ops.quant import _im2col_chunk_mib

    # 3x3 stride-1 pad-1: ho=wo=h; patches = n*h*w*9*ci; out = n*h*w*co*4
    got = _im2col_chunk_mib((2, 8, 8, 5), (3, 3, 5, 7), 1, 1, None)
    expect = (2 * 8 * 8 * 9 * 5 + 2 * 8 * 8 * 7 * 4) / 2**20
    assert abs(got - expect) < 1e-12
    # dilated: + the zero-inserted s8 input copy at (2h-1)x(2w-1)
    got_d = _im2col_chunk_mib((2, 8, 8, 5), (3, 3, 5, 7), 1, 1, 2)
    assert got_d > got
    # string padding routes to the conv emitter: no im2col working set
    assert _im2col_chunk_mib((2, 8, 8, 5), (3, 3, 5, 7), 1, "SAME", None) == 0.0


def test_apply_s2d_int8_overcap_matches_default(monkeypatch):
    """Forcing the over-cap conv-emitter fallback through the REAL decoder
    walk (every site: cvt/k0/k1/ksc/kf) reproduces the default im2col
    path with identical argmax masks. The cap is process-level config
    frozen at import, so the test overrides the module constant (the env
    would be stale — exactly the trace-time staleness the freeze exists
    to stop)."""
    from gan_segmentation_tpu.ops import quant

    cfg = SolverConfig(max_res_log2=5)
    dec = decoder_from_config(cfg)
    feats = _pyramids(cfg, 21, batch=4)
    v = jax.jit(lambda f: dec.init(jax.random.PRNGKey(0), f, False))(feats)
    q = prepare_s2d_int8(dec, v, [_pyramids(cfg, 51)], 2)

    ref = np.asarray(jax.jit(lambda p, f: apply_s2d_int8(
        dec, p, f, 2, fine_logits=True))(q, feats))
    monkeypatch.setattr(quant, "INT8_CHUNK_MB", 0.01)
    got = np.asarray(jax.jit(lambda p, f: apply_s2d_int8(
        dec, p, f, 2, fine_logits=True))(q, feats))
    np.testing.assert_allclose(ref, got, rtol=1e-5, atol=1e-3)
    np.testing.assert_array_equal(ref.argmax(-1), got.argmax(-1))


def test_quantize_act_saturates():
    x = jnp.asarray([-3.0, -1.0, 0.0, 0.5, 2.0], jnp.float32)
    q = quantize_act(x, jnp.float32(127.0))  # scale 1/127: absmax was 1.0
    np.testing.assert_array_equal(np.asarray(q), [-127, -127, 0, 64, 127])


def test_calibration_covers_every_site():
    cfg = SolverConfig(max_res_log2=5)
    dec = decoder_from_config(cfg)
    feats = _pyramids(cfg, 10, batch=1)
    v = jax.jit(lambda f: dec.init(jax.random.PRNGKey(0), f, False))(feats)
    prep = jax.jit(lambda v: prepare_s2d(dec, v, 2))(v)
    stats = jax.device_get(jax.jit(lambda p, f: collect_calibration(
        dec, p, f, 2))(prep, feats))
    # one absmax per conv site of every prepared stage
    sites = {f"{sid}.{k}" for sid, st in jax.device_get(prep)["stages"].items()
             for k in st if k in ("cvt_k", "k0", "k1", "ksc", "kf")}
    assert set(stats) == sites and all(v > 0 for v in stats.values())


@pytest.mark.parametrize("n_block", [2, 3])
def test_int8_close_to_float_path(n_block):
    cfg = SolverConfig(max_res_log2=5)
    dec = decoder_from_config(cfg)
    feats = _pyramids(cfg, 20)
    v = jax.jit(lambda f: dec.init(jax.random.PRNGKey(0), f, False))(feats)
    prep = jax.jit(lambda v: prepare_s2d(dec, v, n_block))(v)
    q = prepare_s2d_int8(dec, v, [_pyramids(cfg, 50), _pyramids(cfg, 60)],
                         n_block, prepared=prep)

    ref = np.asarray(jax.jit(lambda p, f: apply_s2d_prepared(
        dec, p, f, n_block, fine_logits=True))(prep, feats))
    got = np.asarray(jax.jit(lambda p, f: apply_s2d_int8(
        dec, p, f, n_block, fine_logits=True))(q, feats))

    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.06, rel  # measured ~0.023 on this worst case
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.97, agree  # measured ~0.991

    # the s2d-layout mask path composes with the quantized logits
    ls2d = jax.jit(lambda p, f: apply_s2d_int8(dec, p, f, n_block))(q, feats)
    m = np.asarray(class_mask_s2d(ls2d, cfg.num_classes))
    assert m.shape == ref.shape[:3] and m.dtype == np.uint8
    assert (m == ref.argmax(-1)).mean() > 0.97


def test_int8_bundle_roundtrip(tmp_path):
    """The quantized decoder composes with the serving BUNDLE export
    (core/export.py::save_bundle): int8 kernels/scales ride params.msgpack,
    the StableHLO module keeps them as arguments, and the roundtripped
    program reproduces the live masks exactly."""
    from gan_segmentation_tpu.core.export import load_bundle, save_bundle

    cfg = SolverConfig(max_res_log2=5)
    dec = decoder_from_config(cfg)
    feats = _pyramids(cfg, 40, batch=1)
    v = jax.jit(lambda f: dec.init(jax.random.PRNGKey(2), f, False))(feats)
    q = prepare_s2d_int8(dec, v, [_pyramids(cfg, 80, batch=1)], 2)

    def serve(qt, f):
        return class_mask_s2d(apply_s2d_int8(dec, qt, f, 2),
                              cfg.num_classes)

    specs = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in feats]
    save_bundle(str(tmp_path / "b"), serve, q, (specs,),
                meta={"quant": "int8"})
    run = load_bundle(str(tmp_path / "b"))
    live = np.asarray(jax.jit(serve)(q, feats))
    np.testing.assert_array_equal(np.asarray(run(feats)), live)

    # the bundle records which int8 conv form its program baked in
    # (process config frozen at import — ADVICE r4 attribution)
    from gan_segmentation_tpu.core.export import load_bundle_meta
    meta = load_bundle_meta(str(tmp_path / "b"))
    assert meta["int8_form"] in ("im2col", "conv")
    assert meta["quant"] == "int8" and meta["n_weights"] > 0
    assert load_bundle_meta(str(tmp_path / "nonexistent")) == {}


class TestGeneratorQuant:
    """Generator-side int8 (`ops/quant.py` generator section + the quant/
    qstats collections in `models/layers.py`)."""

    def _gen(self, res=5):
        from gan_segmentation_tpu.core.config import GanConfig
        from gan_segmentation_tpu.models.stylegan import init_generator
        cfg = GanConfig(max_res_log2=res, dtype="fp32")
        return init_generator(cfg, seed=0)

    def test_calibration_covers_every_wscale_conv(self):
        from gan_segmentation_tpu.ops.quant import calibrate_generator
        gen, params = self._gen()
        zs = [jax.random.normal(jax.random.PRNGKey(1), (2, 512))]
        stats = calibrate_generator(gen, params, zs,
                                    [jax.random.PRNGKey(2)])
        flat = jax.tree_util.tree_leaves(stats)
        # res 32: block_2 conv_2; blocks 3..5 conv_1+conv_2; to_rgb = 8
        assert len(flat) == 8 and all(v > 0 for v in flat)

    def test_int8_generator_close_to_float(self):
        """Worst case (random weights): per-block error stays LINEAR —
        AdaIN's instance norm renormalizes after every conv — and the
        final rgb stays within PTQ tolerance of the float path."""
        from gan_segmentation_tpu.ops.quant import quantize_generator
        gen, params = self._gen()
        zs = [jax.random.normal(jax.random.PRNGKey(10 + i), (2, 512))
              for i in range(2)]
        nks = [jax.random.PRNGKey(20 + i) for i in range(2)]
        q = quantize_generator(gen, params, zs, nks)
        z = jax.random.normal(jax.random.PRNGKey(99), (2, 512))
        nk = jax.random.PRNGKey(98)
        rgb, feats = jax.jit(lambda p, z, k: gen.apply(
            {"params": p}, z, rngs={"noise": k}))(params, z, nk)
        rgbq, featsq = jax.jit(lambda p, q, z, k: gen.apply(
            {"params": p, "quant": q}, z, rngs={"noise": k}))(params, q,
                                                              z, nk)
        rgb, rgbq = np.asarray(rgb), np.asarray(rgbq)
        rel = np.linalg.norm(rgbq - rgb) / np.linalg.norm(rgb)
        assert rel < 0.3, rel  # measured ~0.13 at res 64
        rels = [float(np.linalg.norm(np.asarray(a) - np.asarray(b))
                      / np.linalg.norm(np.asarray(b)))
                for a, b in zip(featsq, feats)]
        assert all(r < 0.3 for r in rels), rels
        # linear, not multiplicative, growth: last/first bounded
        assert rels[-1] < 10 * max(rels[0], 1e-3), rels

    def test_int8_deconv_branch_matches_float(self):
        """Conv2DTransposeW's int8 branch — the fused-upscale deconv that
        StyleBlock only instantiates at res_log2 >= 7
        (`networks_stylegan.py:154`), so no small-res pipeline test reaches
        it. The s8 input-dilated formulation (padding = k-1-p, lhs_dilation
        = stride) must reproduce conv_transpose2d within PTQ tolerance."""
        from gan_segmentation_tpu.models.layers import Conv2DTransposeW
        from gan_segmentation_tpu.ops.quant import generator_quant_scales
        layer = Conv2DTransposeW(features=8, use_bias=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16),
                              jnp.float32)
        params = jax.jit(layer.init)(jax.random.PRNGKey(1), x)["params"]
        ref = jax.jit(lambda p, xx: layer.apply({"params": p}, xx))(params, x)
        assert ref.shape == (2, 16, 16, 8)  # the 2x upscale happened
        # calibrate exactly like calibrate_generator: sow absmax -> scales
        _, muts = jax.jit(lambda p, xx: layer.apply(
            {"params": p}, xx, mutable=["qstats"]))(params, x)
        stats = jax.tree_util.tree_map(
            lambda v: np.float32(v[0]), jax.device_get(muts["qstats"]),
            is_leaf=lambda v: isinstance(v, tuple))
        quant = generator_quant_scales(stats)
        got = jax.jit(lambda p, q, xx: layer.apply(
            {"params": p, "quant": q}, xx))(params, quant, x)
        ref, got = np.asarray(ref), np.asarray(got)
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 0.05, rel

    @pytest.mark.slow
    def test_int8_generator_res7_covers_the_deconv(self):
        """End-to-end at res_log2=7: StyleBlock flips to the fused-upscale
        deconv, the calibration must cover it (a deconv_1 scale exists in
        the quant tree) and the quantized forward stays within the same
        worst-case tolerance as the small-res test."""
        from gan_segmentation_tpu.ops.quant import quantize_generator
        gen, params = self._gen(res=7)
        zs = [jax.random.normal(jax.random.PRNGKey(10 + i), (1, 512))
              for i in range(2)]
        nks = [jax.random.PRNGKey(20 + i) for i in range(2)]
        q = quantize_generator(gen, params, zs, nks)
        flat = jax.tree_util.tree_flatten_with_path(q)[0]
        paths = ["/".join(str(k) for k in p) for p, _ in flat]
        assert any("deconv_1" in p for p in paths), paths
        z = jax.random.normal(jax.random.PRNGKey(99), (1, 512))
        nk = jax.random.PRNGKey(98)
        rgb, _ = jax.jit(lambda p, zz, k: gen.apply(
            {"params": p}, zz, rngs={"noise": k}))(params, z, nk)
        rgbq, _ = jax.jit(lambda p, qq, zz, k: gen.apply(
            {"params": p, "quant": qq}, zz, rngs={"noise": k}))(params, q,
                                                                z, nk)
        rgb, rgbq = np.asarray(rgb), np.asarray(rgbq)
        rel = np.linalg.norm(rgbq - rgb) / np.linalg.norm(rgb)
        assert rel < 0.3, rel

    def test_quant_collection_absent_means_float_path(self):
        """Without the quant collection the model is bit-identical to
        before the quant seam existed (no sow side effects either)."""
        gen, params = self._gen()
        z = jax.random.normal(jax.random.PRNGKey(5), (1, 512))
        nk = jax.random.PRNGKey(6)
        out1, _ = jax.jit(lambda p, z, k: gen.apply(
            {"params": p}, z, rngs={"noise": k}))(params, z, nk)
        # calibration pass returns the SAME outputs as the plain pass
        # (same jit treatment on both sides: fusion must not differ)
        (out2, _), muts = jax.jit(lambda p, z, k: gen.apply(
            {"params": p}, z, rngs={"noise": k},
            mutable=["qstats"]))(params, z, nk)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
        assert "qstats" in muts


def test_qtree_is_a_plain_jit_argument():
    """The quantized tree crosses jit as an argument (serving form: weights
    stay inputs, never baked-in constants — same rule as the bundle export)."""
    cfg = SolverConfig(max_res_log2=5)
    dec = decoder_from_config(cfg)
    feats = _pyramids(cfg, 30, batch=1)
    v = jax.jit(lambda f: dec.init(jax.random.PRNGKey(1), f, False))(feats)
    q = prepare_s2d_int8(dec, v, [_pyramids(cfg, 70, batch=1)], 2)
    leaves = jax.tree_util.tree_leaves(q)
    assert any(l.dtype == np.int8 for l in leaves)
    out = jax.jit(lambda p, f: apply_s2d_int8(dec, p, f, 2))(q, feats)
    assert np.isfinite(np.asarray(out, np.float32)).all()
