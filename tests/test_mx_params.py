"""mxnet .params parser + StyleGAN converter tests.

The writer below follows the documented mxnet NDArray-list binary layout
(see `core/mx_params.py` docstring); the reader's adaptive shape decoding is
exercised with both int64 and uint32 dims.
"""

import struct

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gan_segmentation_tpu.core.config import GanConfig
from gan_segmentation_tpu.core.mx_params import (
    convert_stylegan_params, is_mx_params_file, load_generator_params,
    load_mx_ndarray_file,
)
from gan_segmentation_tpu.models.stylegan import StyleGanGenerator, init_generator


def write_mx_file(path, arrays, names, dim_fmt="q"):
    """Emit the mxnet NDArray-list format (V2 arrays)."""
    out = bytearray()
    out += struct.pack("<QQ", 0x112, 0)
    out += struct.pack("<Q", len(arrays))
    for arr in arrays:
        out += struct.pack("<I", 0xF993FAC9)      # V2 magic
        out += struct.pack("<i", 0)               # dense storage
        out += struct.pack("<I", arr.ndim)
        out += struct.pack("<" + dim_fmt * arr.ndim, *arr.shape)
        out += struct.pack("<ii", 1, 0)           # cpu(0) context
        type_flag = {np.dtype(np.float32): 0, np.dtype(np.float16): 2,
                     np.dtype(np.int32): 4}[arr.dtype]
        out += struct.pack("<i", type_flag)
        out += arr.tobytes()
    out += struct.pack("<Q", len(names))
    for n in names:
        b = n.encode()
        out += struct.pack("<Q", len(b)) + b
    with open(path, "wb") as fp:
        fp.write(bytes(out))


@pytest.mark.parametrize("dim_fmt", ["q", "I"])
def test_reader_roundtrip(tmp_path, dim_fmt):
    rs = np.random.RandomState(0)
    arrays = [rs.randn(3, 4).astype(np.float32),
              rs.randn(2, 2, 3, 3).astype(np.float32),
              rs.randn(7).astype(np.float32)]
    names = ["arg:w1", "aux:w2", "plain"]
    path = tmp_path / "test.params"
    write_mx_file(path, arrays, names, dim_fmt)
    assert is_mx_params_file(str(path))
    loaded = load_mx_ndarray_file(str(path))
    assert set(loaded) == {"w1", "w2", "plain"}
    for got, want in zip((loaded["w1"], loaded["w2"], loaded["plain"]), arrays):
        np.testing.assert_array_equal(got, want)


def make_reference_named_params(cfg: GanConfig, seed=0):
    """Fabricate an mxnet-style named param dict for a tiny generator using
    the reference's naming scheme (`networks_stylegan.py` prefixes) and
    layouts (OIHW convs, (I,O,kh,kw) deconvs, (1,C,1,1) broadcasts)."""
    rs = np.random.RandomState(seed)
    p = {}
    c0 = cfg.num_features(2)
    p["constant_tensor"] = rs.randn(1, c0, 4, 4).astype(np.float32)
    p["latent_avg"] = rs.randn(512).astype(np.float32)
    p["truncation_psi"] = np.full((cfg.num_style_layers,), 0.7, np.float32)
    for i in range(8):
        p[f"mp_dense_{i}_weight"] = rs.randn(512, 512).astype(np.float32)
        p[f"mp_dense_{i}_bias"] = rs.randn(512).astype(np.float32)
    for res in range(2, cfg.max_res_log2 + 1):
        s = 2 ** res
        c = cfg.num_features(res)
        cin = cfg.num_features(res - 1)
        if res >= 3:
            if res >= 7:
                p[f"{s}_deconv_1_weight"] = rs.randn(cin, c, 4, 4).astype(np.float32)
            else:
                p[f"{s}_conv_1_weight"] = rs.randn(c, cin, 3, 3).astype(np.float32)
        p[f"{s}_conv_2_weight"] = rs.randn(c, c, 3, 3).astype(np.float32)
        for j in (1, 2):
            p[f"{s}_noise_{j}_scale_factors"] = rs.randn(1, c, 1, 1).astype(np.float32)
            p[f"{s}_bias_{j}_bias"] = rs.randn(1, c, 1, 1).astype(np.float32)
            p[f"{s}_adain_{j}_dense_affine_weight"] = rs.randn(2 * c, 512).astype(np.float32)
            p[f"{s}_adain_{j}_dense_affine_bias"] = rs.randn(2 * c).astype(np.float32)
    top = 2 ** cfg.max_res_log2
    p[f"{top}_conv_to_rgb_weight"] = rs.randn(3, cfg.num_features(cfg.max_res_log2), 1, 1).astype(np.float32)
    p[f"{top}_conv_to_rgb_bias"] = rs.randn(3).astype(np.float32)
    # wscale 'std' constants + instance-norm gamma/beta that the real files
    # contain and the loader must ignore (ignore_extra=True semantics)
    p["16_conv_2_std"] = np.asarray([0.3], np.float32)
    p["16_adain_1_norm_gamma"] = np.ones((cfg.num_features(4),), np.float32)
    return p


def test_stylegan_conversion_structure_matches_flax_init(tmp_path):
    cfg = GanConfig(max_res_log2=4)
    named = make_reference_named_params(cfg)
    converted = convert_stylegan_params(named, cfg)

    _, flax_params = init_generator(cfg, seed=0)
    flat_c = jax.tree_util.tree_map(lambda x: x.shape, converted)
    flat_f = jax.tree_util.tree_map(lambda x: x.shape, flax_params)
    assert jax.tree_util.tree_structure(flat_c) == jax.tree_util.tree_structure(flat_f)
    assert flat_c == flat_f


def test_full_file_to_forward(tmp_path):
    """Write a reference-format file for a tiny generator, load through the
    public path, and run a forward pass."""
    cfg = GanConfig(max_res_log2=4)
    named = make_reference_named_params(cfg)
    path = tmp_path / "stylegan-test.params"
    write_mx_file(path, list(named.values()), list(named.keys()))

    params = load_generator_params(str(path), cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    model = StyleGanGenerator(cfg)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 512))
    rgb, feats = jax.jit(
        lambda p, z, r: model.apply({"params": p}, z, rngs={"noise": r})
    )(params, z, jax.random.PRNGKey(1))
    assert rgb.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(rgb)).all()
    # truncation psi came through (0.7, not the 1.0 init)
    np.testing.assert_allclose(np.asarray(params["truncation_psi"]), 0.7)


class TestMalformedFiles:
    """First-contact robustness: corrupt/truncated/unsupported files must
    fail with a clear ValueError, never an assert (stripped under -O),
    KeyError, or garbage tensors."""

    def _base(self, tmp_path, name="ok.params"):
        p = tmp_path / name
        write_mx_file(p, [np.zeros((2, 3), np.float32)], ["w"])
        return p

    def test_bad_magic(self, tmp_path):
        p = tmp_path / "bad.params"
        p.write_bytes(struct.pack("<QQQ", 0xDEAD, 0, 0))
        with pytest.raises(ValueError, match="magic"):
            load_mx_ndarray_file(str(p))

    def test_truncated_mid_tensor(self, tmp_path):
        p = self._base(tmp_path)
        data = p.read_bytes()
        q = tmp_path / "trunc.params"
        q.write_bytes(data[: len(data) - 40])
        with pytest.raises(ValueError, match="truncated"):
            load_mx_ndarray_file(str(q))

    def test_unsupported_dtype_flag(self, tmp_path):
        p = self._base(tmp_path)
        data = bytearray(p.read_bytes())
        # fixed layout for one (2,3) int64-dim V2 tensor: list header 24 +
        # magic 4 + stype 4 + ndim 4 + dims 16 + ctx 8 = type_flag at 60
        assert struct.unpack_from("<i", data, 60)[0] == 0  # f32 before patch
        data[60:64] = struct.pack("<i", 11)
        q = tmp_path / "odd_dtype.params"
        q.write_bytes(bytes(data))
        with pytest.raises(ValueError, match="type_flag 11"):
            load_mx_ndarray_file(str(q))

    def test_sparse_storage_rejected(self, tmp_path):
        p = self._base(tmp_path)
        data = bytearray(p.read_bytes())
        idx = data.index(struct.pack("<I", 0xF993FAC9))
        data[idx + 4: idx + 8] = struct.pack("<i", 1)  # row_sparse
        q = tmp_path / "sparse.params"
        q.write_bytes(bytes(data))
        with pytest.raises(ValueError, match="dense"):
            load_mx_ndarray_file(str(q))

    def test_name_count_mismatch(self, tmp_path):
        p = tmp_path / "nameless.params"
        write_mx_file(p, [np.zeros((2,), np.float32)], [])
        with pytest.raises(ValueError, match="names"):
            load_mx_ndarray_file(str(p))
