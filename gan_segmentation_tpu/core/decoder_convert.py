"""Reference (mxnet) Decoder checkpoint -> our flax Decoder pytree.

The reference's `networks_seg.py` creates every layer *outside*
``name_scope()``, so gluon assigns process-global creation-order names:
``conv0_weight, batchnorm0_gamma, ..., conv9_weight, ...`` — deterministic
given the architecture. Creation order (`networks_seg.py:64-94`):

  1. cvt blocks, i = start_res..n-1:  Conv2D, [BatchNorm], LeakyReLU,
     [Dropout]                        -> conv{k}, batchnorm{k}
  2. main blocks, i = start_res..n-2: UpSample (no params) +
     DecoderResBlock(conv, [bn], lrelu, conv, [bn], lrelu, [1x1 shortcut])
     (`networks_seg.py:7-46`; shortcut exists iff in_c != conv_size, i.e.
     for every i > start_res since in_c doubles after the concat)
  3. final main block, i = n-1: Conv2D -> num_classes

VALIDATION CAVEAT: like `backbone_convert`, validated against synthetic
files named by the same algorithm (no reference checkpoint is mounted
here); ``strict=True`` pinpoints misses on first real contact.
"""

from typing import Dict, Tuple

import numpy as np

_BN_MAP = {"gamma": ("params", "scale"), "beta": ("params", "bias"),
           "running_mean": ("batch_stats", "mean"),
           "running_var": ("batch_stats", "var")}


def _conv_w(arr):  # OIHW -> HWIO
    return np.ascontiguousarray(np.transpose(arr, (2, 3, 1, 0)))


def convert_decoder_params(mx: Dict[str, np.ndarray], cfg,
                           strict: bool = True) -> Tuple[Dict, Dict]:
    """``cfg``: a `core.config.SolverConfig`. -> (params, batch_stats)."""
    params: Dict = {}
    batch_stats: Dict = {}
    missing = []
    conv_idx = 0
    bn_idx = 0

    def take(name):
        if name in mx:
            return mx[name]
        missing.append(name)
        return None

    def put_conv(path, with_bias=True):
        nonlocal conv_idx
        w = take(f"conv{conv_idx}_weight")
        node = _node(params, path)
        if w is not None:
            node["kernel"] = _conv_w(w)
        if with_bias:
            b = take(f"conv{conv_idx}_bias")
            if b is not None:
                node["bias"] = np.asarray(b, np.float32)
        conv_idx += 1

    def put_bn(path):
        nonlocal bn_idx
        for suffix, (kind, field) in _BN_MAP.items():
            arr = take(f"batchnorm{bn_idx}_{suffix}")
            if arr is None:
                continue
            tree = params if kind == "params" else batch_stats
            _node(tree, path)[field] = np.asarray(arr, np.float32)
        bn_idx += 1

    n = len(cfg.in_channels)
    for i in range(cfg.start_res, n):
        put_conv((f"cvt_{i}_conv",))
        if cfg.use_bn:
            put_bn((f"cvt_{i}_bn",))
    for i in range(cfg.start_res, n - 1):
        blk = f"main_{i}"
        put_conv((blk, "conv_0"))
        if cfg.use_bn:
            put_bn((blk, "bn_0"))
        put_conv((blk, "conv_1"))
        if cfg.use_bn:
            put_bn((blk, "bn_1"))
        in_c = cfg.features[i] if i == cfg.start_res else 2 * cfg.features[i]
        if cfg.features[i + 1] != in_c:
            put_conv((blk, "shortcut"))
    put_conv((f"main_{n - 1}_conv",))

    if strict and missing:
        raise KeyError(
            f"{len(missing)} expected decoder parameters not found, e.g. "
            f"{missing[:5]} — inspect with tools/inspect_checkpoint.py")
    return params, batch_stats


def _node(tree: Dict, path) -> Dict:
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    return node
