"""Backbone converter: structure-compatibility with our flax ResNetV1s.

Synthetic gluoncv-named files only (no real zoo file in this environment —
see the converter's VALIDATION CAVEAT)."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_segmentation_tpu.core.backbone_convert import convert_resnet_v1s_params
from gan_segmentation_tpu.models.resnet import ResNetV1s


def synth_gluoncv_resnet50(prefix="resnetv1s_", seed=0):
    """Fabricate a gluoncv-named param dict with correct shapes (OIHW)."""
    rs = np.random.RandomState(seed)
    p = {}

    def conv(name, cout, cin, k):
        p[name + "_weight"] = rs.randn(cout, cin, k, k).astype(np.float32) * 0.05

    def bn(name, c):
        p[name + "_gamma"] = np.ones(c, np.float32)
        p[name + "_beta"] = np.zeros(c, np.float32)
        p[name + "_running_mean"] = rs.randn(c).astype(np.float32) * 0.01
        p[name + "_running_var"] = np.ones(c, np.float32)

    conv(f"{prefix}conv0", 64, 3, 3)
    bn(f"{prefix}batchnorm0", 64)
    conv(f"{prefix}conv1", 64, 64, 3)
    bn(f"{prefix}batchnorm1", 64)
    conv(f"{prefix}conv2", 128, 64, 3)
    bn(f"{prefix}batchnorm2", 128)

    layers = (3, 4, 6, 3)
    inplanes = 128
    for i, depth in enumerate(layers, start=1):
        planes = 64 * 2 ** (i - 1)
        for b in range(depth):
            src = f"{prefix}layers{i}_bottleneckv1b{b}"
            cin = inplanes if b == 0 else planes * 4
            conv(f"{src}_conv0", planes, cin, 1)
            bn(f"{src}_batchnorm0", planes)
            conv(f"{src}_conv1", planes, planes, 3)
            bn(f"{src}_batchnorm1", planes)
            conv(f"{src}_conv2", planes * 4, planes, 1)
            bn(f"{src}_batchnorm2", planes * 4)
        conv(f"{prefix}down{i}_conv0", planes * 4, inplanes, 1)
        bn(f"{prefix}down{i}_batchnorm0", planes * 4)
        inplanes = planes * 4
    # classifier, must be ignored
    p[f"{prefix}dense0_weight"] = rs.randn(1000, 2048).astype(np.float32)
    p[f"{prefix}dense0_bias"] = np.zeros(1000, np.float32)
    return p


def test_converted_tree_matches_flax_and_runs():
    mx = synth_gluoncv_resnet50()
    params, batch_stats = convert_resnet_v1s_params(mx, strict=True)

    model = ResNetV1s(layers=(3, 4, 6, 3), dilated=True)
    x = jnp.zeros((1, 64, 64, 3))
    ref = jax.jit(lambda x: model.init(jax.random.PRNGKey(0), x, False))(x)

    shapes = lambda t: jax.tree_util.tree_map(lambda a: tuple(np.shape(a)), t)
    assert shapes(params) == shapes(jax.device_get(ref["params"]))
    assert shapes(batch_stats) == shapes(jax.device_get(ref["batch_stats"]))

    c1, c3, c4 = jax.jit(lambda v, x: model.apply(v, x, False))(
        {"params": params, "batch_stats": batch_stats}, x)
    assert c4.shape == (1, 8, 8, 2048)
    assert np.isfinite(np.asarray(c4)).all()


def test_strict_reports_missing():
    import pytest
    mx = synth_gluoncv_resnet50()
    del mx["resnetv1s_layers3_bottleneckv1b2_conv1_weight"]
    with pytest.raises(KeyError, match="layers3_bottleneckv1b2_conv1"):
        convert_resnet_v1s_params(mx, strict=True)


def synth_gluoncv_resnet50_dotted(seed=0):
    """Attribute-path (save_parameters) naming of the same network."""
    rs = np.random.RandomState(seed)
    p = {}

    def conv(base, cout, cin, k):
        p[f"{base}.weight"] = rs.randn(cout, cin, k, k).astype(np.float32) * 0.05

    def bn(base, c):
        p[f"{base}.gamma"] = np.ones(c, np.float32)
        p[f"{base}.beta"] = np.zeros(c, np.float32)
        p[f"{base}.running_mean"] = rs.randn(c).astype(np.float32) * 0.01
        p[f"{base}.running_var"] = np.ones(c, np.float32)

    conv("conv1.0", 64, 3, 3)
    bn("conv1.1", 64)
    conv("conv1.3", 64, 64, 3)
    bn("conv1.4", 64)
    conv("conv1.6", 128, 64, 3)
    bn("bn1", 128)
    layers = (3, 4, 6, 3)
    inplanes = 128
    for i, depth in enumerate(layers, start=1):
        planes = 64 * 2 ** (i - 1)
        for b in range(depth):
            cin = inplanes if b == 0 else planes * 4
            conv(f"layer{i}.{b}.conv1", planes, cin, 1)
            bn(f"layer{i}.{b}.bn1", planes)
            conv(f"layer{i}.{b}.conv2", planes, planes, 3)
            bn(f"layer{i}.{b}.bn2", planes)
            conv(f"layer{i}.{b}.conv3", planes * 4, planes, 1)
            bn(f"layer{i}.{b}.bn3", planes * 4)
        conv(f"layer{i}.0.downsample.0", planes * 4, inplanes, 1)
        bn(f"layer{i}.0.downsample.1", planes * 4)
        inplanes = planes * 4
    p["fc.weight"] = rs.randn(1000, 2048).astype(np.float32)
    p["fc.bias"] = np.zeros(1000, np.float32)
    return p


def test_dotted_format_matches_legacy():
    """Both gluoncv naming schemes convert to the identical flax tree."""
    legacy = convert_resnet_v1s_params(synth_gluoncv_resnet50(), strict=True)
    dotted = convert_resnet_v1s_params(synth_gluoncv_resnet50_dotted(),
                                       strict=True)
    for a, b in zip(legacy, dotted):
        sa = jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), a)
        sb = jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), b)
        assert sa == sb
    # same seed => same values, independent of naming scheme ordering?
    # (creation orders differ, so only structure is asserted)
