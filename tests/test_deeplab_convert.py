"""Reference DeepLabV3+ checkpoint converter (dotted save_parameters names).

Methodology mirrors test_decoder_convert: fabricate a synthetic reference
file whose names follow the documented attribute-path table (mxnet 1.5
``save_parameters`` = ``_collect_params_with_prefix`` output,
`lib/utils/utils.py:5-16`), then assert the converted pytree drops into our
flax model bit-exactly.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_segmentation_tpu.core.deeplab_convert import (
    convert_deeplabv3plus_params, is_deeplab_reference_file,
)
from gan_segmentation_tpu.models.deeplab import DeepLabV3Plus

from test_mx_params import write_mx_file


def _ref_conv_name(path):
    """flax params path (tuple of str, no leaf) -> reference dotted base."""
    p = ".".join(path)
    m = re.fullmatch(r"backbone\.stem_conv(\d)", p)
    if m:
        return f"conv1.{(0, 3, 6)[int(m.group(1))]}"
    m = re.fullmatch(r"backbone\.stem_bn(\d)", p)
    if m:
        return "bn1" if m.group(1) == "2" else f"conv1.{(1, 4)[int(m.group(1))]}"
    m = re.fullmatch(r"backbone\.layer(\d)_block(\d+)\.(conv|bn)(\d)", p)
    if m:
        i, b, kind, c = m.groups()
        return f"layer{i}.{b}.{kind}{c}"
    m = re.fullmatch(r"backbone\.layer(\d)_block0\.downsample_(conv|bn)", p)
    if m:
        return f"layer{m.group(1)}.0.downsample.{0 if m.group(2) == 'conv' else 1}"
    if p == "skip_project.conv":
        return "skip_project.skip_project.0"
    if p == "skip_project.bn":
        return "skip_project.skip_project.1"
    m = re.fullmatch(r"aspp\.b(\d)_(conv|bn)", p)
    if m:
        return f"aspp.concurent.{m.group(1)}.{0 if m.group(2) == 'conv' else 1}"
    if p == "aspp.pool_conv":
        return "aspp.concurent.4.gap.1"
    if p == "aspp.pool_bn":
        return "aspp.concurent.4.gap.2"
    if p == "aspp.project_conv":
        return "aspp.project.0"
    if p == "aspp.project_bn":
        return "aspp.project.1"
    m = re.fullmatch(r"head_sep(\d)\.(depthwise|pointwise)(_bn)?", p)
    if m:
        s, kind, isbn = m.groups()
        if isbn:
            return f"head.block.{s}.{'bn1' if kind == 'depthwise' else 'bn2'}"
        return f"head.block.{s}.{kind}_conv"
    if p == "head_classifier":
        return "head.block.2"
    if p == "auxlayer.conv0":
        return "auxlayer.block.0"
    if p == "auxlayer.bn0":
        return "auxlayer.block.1"
    if p == "auxlayer.conv1":
        return "auxlayer.block.4"
    raise KeyError(p)


_LEAF = {"kernel": "weight", "bias_conv": "bias", "scale": "gamma",
         "bias_bn": "beta", "mean": "running_mean", "var": "running_var"}


def synth_reference_deeplab(params, batch_stats, seed=0):
    """Inverse-map a flax init tree into reference dotted names, with
    random values (so the round-trip comparison is non-trivial)."""
    rs = np.random.RandomState(seed)
    out = {}

    def walk(tree, path):
        is_bn_node = any(k in tree for k in ("scale", "mean", "var"))
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + (k,))
                continue
            base = _ref_conv_name(path)
            if k == "kernel":
                leaf = "weight"
                shape = tuple(np.asarray(np.shape(v))[[3, 2, 0, 1]])
            elif k == "bias":
                leaf = "beta" if is_bn_node else "bias"
                shape = np.shape(v)
            elif k == "scale":
                leaf = "gamma"
                shape = np.shape(v)
            elif k == "mean":
                leaf = "running_mean"
                shape = np.shape(v)
            else:
                assert k == "var", k
                leaf = "running_var"
                shape = np.shape(v)
            out[f"{base}.{leaf}"] = rs.randn(*shape).astype(np.float32)

    walk(jax.device_get(params), ())
    walk(jax.device_get(batch_stats), ())
    return out


@pytest.fixture(scope="module")
def tiny_model_vars():
    model = DeepLabV3Plus(nclass=2, aux=True, crop_size=32)
    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v = jax.jit(lambda x: model.init(jax.random.PRNGKey(0), x, False))(dummy)
    return model, v


class TestDeepLabConvert:
    def test_roundtrip_bitexact(self, tiny_model_vars):
        model, v = tiny_model_vars
        mx = synth_reference_deeplab(v["params"], v["batch_stats"])
        assert is_deeplab_reference_file(mx)
        p, bs = convert_deeplabv3plus_params(mx, strict=True)

        flat_ours = dict(jax.tree_util.tree_leaves_with_path(p))
        flat_init = dict(jax.tree_util.tree_leaves_with_path(
            jax.device_get(v["params"])))
        assert set(map(str, flat_ours)) == set(map(str, flat_init))
        for kp, leaf in jax.tree_util.tree_leaves_with_path(p):
            ref = flat_init[kp]
            assert np.shape(leaf) == np.shape(ref), (kp, np.shape(leaf),
                                                     np.shape(ref))
        # kernels transposed exactly once: spot-check a 3x3 conv
        w = mx["layer1.0.conv2.weight"]
        np.testing.assert_array_equal(
            p["backbone"]["layer1_block0"]["conv2"]["kernel"],
            np.transpose(w, (2, 3, 1, 0)))
        # depthwise separable kernel layout (C,1,kh,kw) -> (kh,kw,1,C)
        dw = mx["head.block.0.depthwise_conv.weight"]
        np.testing.assert_array_equal(
            p["head_sep0"]["depthwise"]["kernel"],
            np.transpose(dw, (2, 3, 1, 0)))
        # batch stats land in batch_stats, f32
        np.testing.assert_array_equal(
            bs["aspp"]["pool_bn"]["mean"],
            mx["aspp.concurent.4.gap.2.running_mean"])

        # converted tree actually runs through the model
        out = jax.jit(lambda p, bs, x: model.apply(
            {"params": p, "batch_stats": bs}, x, False))(
                p, bs, jnp.zeros((1, 32, 32, 3)))
        assert out[0].shape == (1, 32, 32, 2)

    def test_strict_missing_raises(self, tiny_model_vars):
        _, v = tiny_model_vars
        mx = synth_reference_deeplab(v["params"], v["batch_stats"])
        del mx["aspp.project.0.weight"]
        with pytest.raises(KeyError, match="aspp.project.0.weight"):
            convert_deeplabv3plus_params(mx, strict=True)
        p, _ = convert_deeplabv3plus_params(mx, strict=False)
        assert "kernel" not in p["aspp"].get("project_conv", {})

    def test_load_checkpoint_autodetects_mx(self, tiny_model_vars, tmp_path):
        """The trainer/tester load path converts reference files on the fly,
        like SegSolver.load does for decoder checkpoints."""
        from gan_segmentation_tpu.train.deeplab_trainer import load_checkpoint

        model, v = tiny_model_vars
        mx = synth_reference_deeplab(v["params"], v["batch_stats"])
        path = tmp_path / "last_checkpoint.params"
        write_mx_file(path, list(mx.values()), list(mx.keys()))
        params, batch_stats = load_checkpoint(
            str(path), v["params"], v["batch_stats"])
        got = dict(jax.tree_util.tree_leaves_with_path(jax.device_get(params)))
        want = dict(jax.tree_util.tree_leaves_with_path(
            jax.device_get(v["params"])))
        assert set(map(str, got)) == set(map(str, want))
        np.testing.assert_array_equal(
            np.asarray(params["head_classifier"]["bias"]),
            mx["head.block.2.bias"])
