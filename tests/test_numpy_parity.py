"""Independent full-forward parity harness (VERDICT r3 #2).

One set of RANDOM weights in the reference's own mxnet naming/layout is
fed two completely disjoint ways:

  reference-named dict --(package converters)--> flax pytree --> package
      jit forward (gan_segmentation_tpu)
  reference-named dict ------------------------> tests/ref_numpy.py, a
      pure-numpy transliteration of the reference math sharing NO code
      with the package

and every generator block output, the rgb head, and the decoder logits
must agree to rtol 1e-4. Unlike `tests/test_goldens.py` (self-generated
goldens that catch drift but not shared bugs), a blur-normalization or
truncation-lerp-ordering bug (`networks_stylegan.py:158-236`) would have
to be independently re-invented in BOTH implementations to pass here.
This also rehearses real-checkpoint first contact end to end: the res-32
run goes through an actual mxnet-format binary file on disk.

Noise contract: `*_noise_*_scale_factors` are zeroed so AddNoise
(`networks_stylegan.py:267-305`) contributes exactly 0 on both sides (its
scale semantics are unit-tested in tests/test_stylegan.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ref_numpy
from test_decoder_convert import synth_reference_decoder
from test_mx_params import make_reference_named_params, write_mx_file

from gan_segmentation_tpu.core.config import GanConfig, SolverConfig
from gan_segmentation_tpu.core.decoder_convert import convert_decoder_params
from gan_segmentation_tpu.core.mx_params import (convert_stylegan_params,
                                                 load_generator_params)
from gan_segmentation_tpu.models.decoder import decoder_from_config
from gan_segmentation_tpu.models.stylegan import StyleGanGenerator


def _zero_noise(named):
    return {k: (np.zeros_like(v) if k.endswith("_scale_factors") else v)
            for k, v in named.items()}


def _nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


def _gen_forward_package(cfg, params, z):
    gen = StyleGanGenerator(cfg)  # compute_dtype f32
    rgb, feats = jax.jit(
        lambda p, z: gen.apply({"params": p}, z,
                               rngs={"noise": jax.random.PRNGKey(11)}))(
        params, jnp.asarray(z))
    return np.asarray(rgb), [np.asarray(f) for f in feats]


def _assert_close(a_nchw, b_pkg_nhwc, name, rtol=1e-4, atol=1e-4):
    np.testing.assert_allclose(a_nchw, _nchw(b_pkg_nhwc), rtol=rtol,
                               atol=atol, err_msg=name)


def _run_generator_parity(max_res_log2, batch, seed, via_file=None):
    cfg = GanConfig(max_res_log2=max_res_log2, dtype="fp32")
    named = _zero_noise(make_reference_named_params(cfg, seed=seed))
    # unit-variance random weights explode nowhere: wscale rescales every
    # matmul/conv to He stddev at forward time and AdaIN re-standardizes
    # each block, so activations stay O(1) — by design of the reference
    if via_file is not None:
        path = str(via_file / "stylegan-rand.params")
        write_mx_file(path, list(named.values()),
                      ["arg:" + k for k in named])
        params = load_generator_params(path, cfg)
    else:
        params = convert_stylegan_params(named, cfg)

    z = np.random.RandomState(seed + 100).randn(batch, 512).astype(np.float32)
    rgb_p, feats_p = _gen_forward_package(cfg, params, z)
    rgb_n, feats_n, w_n = ref_numpy.generator_forward(named, z, max_res_log2)

    assert len(feats_p) == len(feats_n) == max_res_log2 - 1
    for res, (fn, fp) in enumerate(zip(feats_n, feats_p), start=2):
        assert fn.shape == _nchw(fp).shape
        _assert_close(fn, fp, f"block res 2^{res} ({2 ** res}px)")
    _assert_close(rgb_n, rgb_p, "to_rgb")
    return named, cfg, feats_n, feats_p


def test_generator_parity_res32(tmp_path):
    """Every block output + rgb at max_res_log2=5 (32px), 2 samples,
    through a REAL mxnet-binary file on disk."""
    named, cfg, feats_n, feats_p = _run_generator_parity(
        5, batch=2, seed=3, via_file=tmp_path)
    # sanity: the comparison is not vacuous (activations are O(1), and the
    # per-layer truncation actually mixed latent_avg in)
    assert np.std(feats_n[-1]) > 1e-2
    assert not np.allclose(named["truncation_psi"], 0.0)


def test_decoder_parity_res32():
    """Decoder logits on a random feature pyramid, converter-name-mapped
    flax forward vs the creation-order numpy transliteration."""
    scfg = SolverConfig(max_res_log2=5)
    dnamed = synth_reference_decoder(scfg, seed=4)
    params, batch_stats = convert_decoder_params(dnamed, scfg, strict=True)
    dec = decoder_from_config(scfg)

    rs = np.random.RandomState(5)
    feats_nhwc = [rs.randn(2, 2 ** (i + 2), 2 ** (i + 2), c)
                  .astype(np.float32)
                  for i, c in enumerate(scfg.in_channels)]
    logits_p = jax.jit(lambda v, f: dec.apply(v, f, False))(
        {"params": params, "batch_stats": batch_stats},
        [jnp.asarray(f) for f in feats_nhwc])

    logits_n, stages = ref_numpy.decoder_forward(
        [np.transpose(f, (0, 3, 1, 2)) for f in feats_nhwc],
        dnamed, scfg)
    assert logits_n.shape == (2, 2, 32, 32)
    assert len(stages) == len(scfg.in_channels)
    _assert_close(logits_n, logits_p, "decoder logits")


def test_full_chain_parity_res32(tmp_path):
    """z -> generator pyramid -> decoder logits, both stacks end to end:
    catches interface-order drift (feature list ordering, layout) that
    block-level checks can miss."""
    named, cfg, feats_n, _ = _run_generator_parity(
        5, batch=2, seed=7, via_file=None)
    scfg = SolverConfig(max_res_log2=5)
    dnamed = synth_reference_decoder(scfg, seed=8)
    params, batch_stats = convert_decoder_params(dnamed, scfg, strict=True)
    dec = decoder_from_config(scfg)

    gparams = convert_stylegan_params(named, cfg)
    z = np.random.RandomState(107).randn(2, 512).astype(np.float32)
    _, feats_p = _gen_forward_package(cfg, gparams, z)
    logits_p = jax.jit(lambda v, f: dec.apply(v, f, False))(
        {"params": params, "batch_stats": batch_stats},
        [jnp.asarray(f) for f in feats_p])

    _, gen_feats_n, _ = ref_numpy.generator_forward(named, z, 5)
    logits_n, _ = ref_numpy.decoder_forward(gen_feats_n, dnamed, scfg)
    # two convs deep past the generator tail: give the accumulated f32
    # reduction-order noise a little more atol than the block checks
    _assert_close(logits_n, logits_p, "full-chain logits", atol=5e-4)


@pytest.mark.slow
def test_generator_parity_res128_deconv_path():
    """max_res_log2=7 exercises the fused-upscale Deconvolution gate
    (`networks_stylegan.py:154`, k4 s2 p1) that res 32/64 never hits."""
    _run_generator_parity(7, batch=1, seed=9, via_file=None)


# -------------------------------------------------------------------------
# DeepLab head oracle (round 5): the flax DeepLabV3/V3+ forward vs
# tests/ref_numpy_deeplab.py, a pure-numpy transliteration of the
# reference head math (ASPP, asymmetric same-pad separable convs,
# align-corners bilinear, _FCNHead). The backbone features are computed
# ONCE by the package backbone and fed to both heads, so any disagreement
# isolates to the head semantics this oracle re-derives from
# `/root/reference/deeplabv3plus/lib/model/deeplabv3plus.py`.

import ref_numpy_deeplab


def _randomize_variables(variables, seed):
    """Non-trivial params AND BatchNorm running stats (the default init's
    mean=0/var=1 would make bn_eval a near-identity and hide eps/stat
    bugs)."""
    rng = np.random.default_rng(seed)

    def leaf(path, v):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "var":
            return jnp.asarray(rng.uniform(0.5, 1.5, v.shape), v.dtype)
        if name == "mean":
            return jnp.asarray(rng.normal(0, 0.2, v.shape), v.dtype)
        return jnp.asarray(rng.normal(0, 0.1, v.shape), v.dtype)

    return jax.tree_util.tree_map_with_path(leaf, variables)


@pytest.mark.slow
@pytest.mark.parametrize("model_kind", ["v3plus", "v3"])
def test_deeplab_head_matches_numpy_reference(model_kind):
    from gan_segmentation_tpu.models.deeplab import DeepLabV3, DeepLabV3Plus
    from gan_segmentation_tpu.models.resnet import ResNetV1s

    cls = DeepLabV3Plus if model_kind == "v3plus" else DeepLabV3
    model = cls(nclass=3, backbone="resnet50", aux=True)
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (1, 64, 64, 3)), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, False))(
        jax.random.PRNGKey(0), x)
    variables = _randomize_variables(variables, seed=1)

    out, aux = jax.jit(lambda v, x: model.apply(v, x, False))(variables, x)

    backbone = ResNetV1s(layers=(3, 4, 6, 3), dilated=True)
    c1, c3, c4 = jax.jit(lambda v, x: backbone.apply(v, x, False))(
        {"params": variables["params"]["backbone"],
         "batch_stats": variables["batch_stats"]["backbone"]}, x)

    p = jax.device_get(variables["params"])
    s = jax.device_get(variables["batch_stats"])
    c1, c3, c4 = (np.asarray(t, np.float32) for t in (c1, c3, c4))
    if model_kind == "v3plus":
        ref_out, ref_aux = ref_numpy_deeplab.deeplab_v3plus_head(
            c1, c3, c4, p, s, out_hw=(64, 64))
    else:
        ref_out, ref_aux = ref_numpy_deeplab.deeplab_v3_head(
            c3, c4, p, s, out_hw=(64, 64))

    np.testing.assert_allclose(np.asarray(out), ref_out,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(aux), ref_aux,
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_deeplab_v3plus_full_forward_matches_numpy_reference():
    """FULL-forward oracle: x -> numpy deep-stem dilated resnet50 ->
    numpy V3+ head vs the flax DeepLabV3Plus apply — the entire RGB
    segmentation model re-derived independently, so a semantics bug
    shared by our backbone and its self-generated goldens (stem widths,
    first-block dilation rules, maxpool padding, residual paths) cannot
    hide."""
    from gan_segmentation_tpu.models.deeplab import DeepLabV3Plus

    model = DeepLabV3Plus(nclass=2, backbone="resnet50", aux=True)
    x = jnp.asarray(np.random.default_rng(2).normal(
        0, 1, (1, 64, 64, 3)), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, False))(
        jax.random.PRNGKey(0), x)
    variables = _randomize_variables(variables, seed=3)

    out, aux = jax.jit(lambda v, x: model.apply(v, x, False))(variables, x)

    p = jax.device_get(variables["params"])
    s = jax.device_get(variables["batch_stats"])
    ref_out, ref_aux = ref_numpy_deeplab.deeplab_v3plus_forward(
        np.asarray(x, np.float32), p, s)

    np.testing.assert_allclose(np.asarray(out), ref_out,
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(aux), ref_aux,
                               rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_resnext_dilated_se_matches_numpy_reference():
    """The alternative ResNeXt backbone (SURVEY #15) against the oracle's
    transliteration of the reference's IN-REPO source
    (`resnext_dilated.py:60-114,196-214`): grouped bottlenecks, stage
    dilation rules, and the SE attention path (exercised with use_se=True;
    sigmoid gate + biased 1x1s)."""
    from gan_segmentation_tpu.models.resnext import ResNextDilated

    model = ResNextDilated(layers=(2, 2, 2, 2), cardinality=8,
                           bottleneck_width=4, use_se=True, dilated=True)
    x = jnp.asarray(np.random.default_rng(4).normal(
        0, 1, (1, 64, 64, 3)), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, False))(
        jax.random.PRNGKey(0), x)
    variables = _randomize_variables(variables, seed=5)

    c1, c3, c4 = jax.jit(lambda v, x: model.apply(v, x, False))(variables, x)

    p = jax.device_get(variables["params"])
    s = jax.device_get(variables["batch_stats"])
    r1, r3, r4 = ref_numpy_deeplab.resnext_dilated_forward(
        np.asarray(x, np.float32), p, s, layers=(2, 2, 2, 2),
        cardinality=8, use_se=True)

    np.testing.assert_allclose(np.asarray(c1), r1, rtol=1e-3, atol=1e-3,
                               err_msg="c1")
    np.testing.assert_allclose(np.asarray(c3), r3, rtol=1e-3, atol=1e-3,
                               err_msg="c3")
    np.testing.assert_allclose(np.asarray(c4), r4, rtol=1e-3, atol=1e-3,
                               err_msg="c4")


@pytest.mark.parametrize("depth_activation,dilation",
                         [(False, 1), (True, 2), (False, 3)])
def test_separable_conv_variants_match_numpy_reference(depth_activation,
                                                       dilation):
    """The SeparableConv configurations the heads DON'T use — the
    pre-relu placement (depth_activation=False) and dilated depthwise
    with asymmetric same-padding (`deeplabv3plus.py:338-378`) — against
    the oracle, so the whole reference surface of the module is pinned,
    not just the head's (True, 1) corner."""
    from gan_segmentation_tpu.models.deeplab import SeparableConv

    mod = SeparableConv(10, dilation=dilation,
                        depth_activation=depth_activation)
    x = jnp.asarray(np.random.default_rng(6).normal(
        0, 1, (2, 9, 9, 6)), jnp.float32)
    variables = jax.jit(lambda k, x: mod.init(k, x, False))(
        jax.random.PRNGKey(0), x)
    variables = _randomize_variables(variables, seed=7)
    got = jax.jit(lambda v, x: mod.apply(v, x, False))(variables, x)

    ref = ref_numpy_deeplab.separable_conv(
        np.asarray(x, np.float32),
        jax.device_get(variables["params"]),
        jax.device_get(variables["batch_stats"]),
        dilation=dilation, depth_activation=depth_activation)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)
