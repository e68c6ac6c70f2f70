"""Int8 quantized inference for the s2d decoder tail (TPU extension).

The v5e MXU executes s8 x s8 -> s32 at twice its bf16 rate (nominal 394
int8 TOPS vs 197 bf16 TFLOP/s) and int8 activations halve their HBM
traffic, so a quantized decoder is the natural step below bf16 for the
z -> (image, mask) serving path — the decoder tail carries ~64% of the
fused pipeline's FLOPs (XLA cost analysis, BASELINE.md). The reference has
no quantized path at all (f32 mxnet `.params` serving only,
`/root/reference/image_generator.py:20-22`); this module is a pure
extension, reachable from `bench.py --quant int8`.

Scheme — standard post-training symmetric quantization:

- **weights**: per-output-channel int8 (scale = absmax/127), folded from
  the SAME `prepare_s2d` tree the bf16 path runs (BN already collapsed
  into the kernels, `ops/s2d_decoder.prepare_s2d`), so no retraining and
  no second parameter source;
- **activations**: per-tensor static int8; scales calibrated by running
  the float path over a few representative feature pyramids and recording
  each conv input's absmax (the ``conv_hook`` seam in
  `apply_s2d_prepared` — one jit program per calibration batch);
- **conv**: s8 x s8 -> s32 (``preferred_element_type``), dequantized in
  f32 by ``s_in * s_w[c]``, biased, and cast back to the compute dtype for
  the elementwise tail (LeakyReLU / concat / depth_to_space), which stays
  exactly the bf16 path's.

argmax masks are robust to quantization noise (tests assert pixel
agreement and logit error, `tests/test_s2d_quant.py`); validate quality on
trained weights with `tools/parity_dryrun.py` when real checkpoints exist.
"""

import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .conv import DIMENSION_NUMBERS, _padding, _pair, conv2d
from .s2d_decoder import apply_s2d_prepared, prepare_s2d

# (kernel key, bias key) pairs a prepared stage may carry
_SITES: Tuple[Tuple[str, str], ...] = (
    ("cvt_k", "cvt_b"), ("k0", "b0"), ("k1", "b1"), ("ksc", "bsc"),
    ("kf", "bf"),
)
_EPS = 1e-12

_VALID_FORMS = ("im2col", "conv")


def _read_once(name, default, cast, valid=None):
    """Process-level config, read ONCE at import: a jitted callable traced
    with one value never re-reads the env (jit caches key on function
    identity + arg shapes, not env), so a mid-process env flip would
    silently rerun the stale program (ADVICE r4, medium). A/B two variants
    in one process by passing the explicit kwargs below (with fresh jit
    closures per variant); across processes the env works as before — and
    that is what `bench.py --quant` measurement attempts are.

    Every error is loud and NAMES the variable: ``valid`` is an optional
    allow-list, and a ``cast`` failure (e.g. a non-numeric cap) re-raises
    with the variable name instead of a bare ValueError."""
    raw = os.environ.get(name, default)
    try:
        v = cast(raw)
    except ValueError as e:
        raise ValueError(f"{name}={raw!r} is not a valid "
                         f"{cast.__name__}") from e
    if valid is not None and v not in valid:
        # a typo must fail loudly, never silently route to the conv
        # emitter measured 21-50x slower than im2col
        raise ValueError(f"{name} must be one of {valid}, got {v!r}")
    return v


#: int8 conv formulation ("im2col" default / "conv"), frozen at import from
#: GAN_SEG_INT8_CONV; per-call override via the ``form`` kwargs.
INT8_FORM: str = _read_once("GAN_SEG_INT8_CONV", "im2col", str,
                            valid=_VALID_FORMS)
#: full-batch im2col working-set cap in MiB (chunk via lax.map above it),
#: frozen at import from GAN_SEG_INT8_CHUNK_MB; override via ``chunk_mb``.
INT8_CHUNK_MB: float = _read_once("GAN_SEG_INT8_CHUNK_MB", "2048", float)


def _resolve_form(form: Optional[str]) -> str:
    if form is None:
        return INT8_FORM
    if form not in _VALID_FORMS:
        raise ValueError(f"form must be one of {_VALID_FORMS}, got {form!r}")
    return form


def calibration_batches(latent_size: int, batch: int = 4,
                        n: int = 2) -> Tuple[List, List]:
    """The fixed-key calibration protocol shared by every int8 entrypoint.

    Returns ``(zs, noise_keys)``: ``n`` z batches drawn with
    ``PRNGKey(100+i)`` plus noise keys ``PRNGKey(200+i)``. The keys are
    FIXED and disjoint from the emission z stream (``ImageGenerator``'s
    seeded rng), so calibrating never shifts emitted samples — generate's
    byte-identity and ``--resume`` invariants survive. Every caller
    (``FusedPipeline``, ``bench.build_fused``) must use this one recipe so
    benchmarks measure the same calibrated pipeline the CLI serves — and
    that includes the default ``batch`` of 4: the same key at a different
    shape is a completely different draw, not a prefix.
    """
    zs = [jax.random.normal(jax.random.PRNGKey(100 + i),
                            (batch, latent_size), jnp.float32)
          for i in range(n)]
    keys = [jax.random.PRNGKey(200 + i) for i in range(n)]
    return zs, keys


def quantize_weight(k) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HWIO kernel -> (int8 kernel, f32 per-out-channel scale)."""
    k = jnp.asarray(k, jnp.float32)
    absmax = jnp.max(jnp.abs(k), axis=tuple(range(k.ndim - 1)))
    scale = jnp.maximum(absmax, _EPS) / 127.0
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_act(x, inv_scale) -> jnp.ndarray:
    """Static per-tensor activation quantization (symmetric, saturating)."""
    q = jnp.round(x.astype(jnp.float32) * inv_scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def conv2d_s8(x, w, *, stride=1, padding=0, lhs_dilation=None, form=None):
    """s8 x s8 -> s32 convolution (NHWC/HWIO), exact integer accumulation.

    ``lhs_dilation`` covers the generator's input-dilated forms (the
    composed nearest-2x conv and the k4s2p1 deconv) — inserted zeros are
    exact in int8.

    Two formulations, both EXACT (integer accumulation is associative, so
    they agree bit-for-bit; asserted in tests/test_s2d_quant.py):

    - ``conv``: ``lax.conv_general_dilated`` with s32 accumulation — the
      natural form for backends with a native int8 conv emitter.
    - ``im2col``: explicit patch extraction + one s8 x s8 -> s32
      ``dot_general``. **Default on every backend**: neither XLA CPU nor
      XLA TPU has a fast int8 conv emitter — measured per 3x3 conv, CPU
      0.32 s -> 0.0065 s (~50x, 16x16x128ch) and the real v5e 0.578 s ->
      0.027 s (~21x, b4 32x32x256ch, bit-equal) for conv -> im2col. The
      round-3 "int8 loses to bf16" verdict was measured through the conv
      form; see BASELINE.md for the im2col re-measure.

    ``form``: explicit "conv"/"im2col" (unknown values raise); ``None``
    uses :data:`INT8_FORM` (the GAN_SEG_INT8_CONV env, read once at
    import — see ``_read_once``). NOTE: string paddings ("SAME"/"VALID")
    always take the conv-emitter branch even when form="im2col" — im2col
    needs explicit pad counts; no pipeline call site passes strings.
    """
    form = _resolve_form(form)
    if form == "im2col" and not isinstance(_padding(padding), str):
        return _conv2d_s8_im2col(x, w, stride=stride, padding=padding,
                                 lhs_dilation=lhs_dilation)
    return lax.conv_general_dilated(
        x, w, _pair(stride), _padding(padding),
        lhs_dilation=None if lhs_dilation is None else _pair(lhs_dilation),
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=jnp.int32)


def _conv2d_s8_im2col(x, w, *, stride=1, padding=0, lhs_dilation=None):
    """Exact int8 conv as patch-gather + integer GEMM (see conv2d_s8)."""
    sh, sw = _pair(stride)
    pads = _padding(padding)  # [(top, bottom), (left, right)]
    if lhs_dilation is not None:
        dh, dw = _pair(lhs_dilation)
        if (dh, dw) != (1, 1):
            n, h, wd, c = x.shape
            xd = jnp.zeros((n, h * dh - (dh - 1), wd * dw - (dw - 1), c),
                           x.dtype)
            x = xd.at[:, ::dh, ::dw, :].set(x)
    x = jnp.pad(x, ((0, 0), tuple(pads[0]), tuple(pads[1]), (0, 0)))
    n, h, wd, c = x.shape
    kh, kw, ci, co = w.shape
    assert c == ci, (c, ci)
    ho = (h - kh) // sh + 1
    wo = (wd - kw) // sw + 1
    # kh*kw shifted strided views; concat order (i, j, c) row-major matches
    # the HWIO kernel reshape below
    cols = [lax.slice(x, (0, i, j, 0),
                      (n, i + (ho - 1) * sh + 1, j + (wo - 1) * sw + 1, c),
                      (1, sh, sw, 1))
            for i in range(kh) for j in range(kw)]
    patches = jnp.concatenate(cols, axis=-1)  # (n, ho, wo, kh*kw*c)
    wmat = w.reshape(kh * kw * ci, co)
    return lax.dot_general(patches, wmat, (((3,), (0,)), ((), ())),
                           preferred_element_type=jnp.int32)


def _im2col_chunk_mib(xshape, wshape, stride, padding, lhs_dilation):
    """MiB of the im2col working set for the FULL batch (0.0 when the
    padding form routes to the conv emitter instead): the s8 patches
    tensor PLUS the s32 accumulator output (4 bytes/element — comparable
    to the patches for 3x3 kernels) plus, for dilated forms, the
    zero-inserted padded input copy. Counting only the patches (the
    pre-round-5 estimate) admitted a real peak several times the cap
    (ADVICE r4)."""
    pads = _padding(padding)
    if isinstance(pads, str):
        return 0.0
    n, h, wd, _ = xshape
    kh, kw, ci, co = wshape
    sh, sw = _pair(stride)
    dilated = 0
    if lhs_dilation is not None:
        dh, dw = _pair(lhs_dilation)
        h, wd = h * dh - (dh - 1), wd * dw - (dw - 1)
        if (dh, dw) != (1, 1):
            dilated = n * h * wd * ci  # the explicit zero-inserted s8 copy
    h += pads[0][0] + pads[0][1]
    wd += pads[1][0] + pads[1][1]
    ho = (h - kh) // sh + 1
    wo = (wd - kw) // sw + 1
    patches = n * ho * wo * kh * kw * ci       # s8, 1 byte/element
    out_s32 = n * ho * wo * co * 4             # the accumulator
    return (patches + out_s32 + dilated) / 2**20


def conv2d_s8_fused(x, inv_in, wq, deq, bias, *, stride=1, padding=0,
                    lhs_dilation=None, form=None, chunk_mb=None,
                    batch_shards=1):
    """quantize -> s8 x s8 -> s32 conv -> dequantize -> bias, cast back to
    ``x.dtype`` — the whole int8 conv body every int8 call site runs.

    Form policy (per site, decided at trace time from static shapes): the
    im2col integer GEMM (21-50x faster than the conv emitter at op level,
    bit-identical) — UNLESS its full-batch working set (patches + s32
    output + any dilated-input copy, `_im2col_chunk_mib`, divided by
    ``batch_shards`` for the per-device footprint) exceeds ``chunk_mb``
    (default :data:`INT8_CHUNK_MB`), in which case the site falls back to
    the native conv-emitter form. The two forms are bit-identical
    (integer accumulation; asserted in tests/test_s2d_quant.py), so the
    policy affects only speed/memory, never values.

    Why fall back rather than chunk: an earlier revision ran over-cap
    sites through a `lax.map` batch-chunked im2col. At the b128 @1024^2
    pipeline shape that OOMed the TPU compiler at 34G/15.75G HBM — the
    map boundary breaks XLA's producer/consumer fusion, materializing
    full-batch fine-grid activations in C-minor layouts that pad the
    32-channel lane dim 4x (three 8G copies of 2G tensors). The conv
    emitter form keeps every op fusible and compiles the same pipeline in
    ~14G (round-3 end-to-end proof at 366-368 samples/s), and the map's
    scan also could not partition under a data-parallel batch sharding
    (ADVICE r4). Patches im2col at the sites that fit + conv emitter at
    the giant narrow fine-grid sites is the best compilable composition;
    `tools/bench_quant_ab.py` measures the net.

    ``deq`` is the f32 per-out-channel dequant multiplier (s_w * s_in);
    ``bias`` f32 or None. ``batch_shards``: dp shard count of the batch
    axis (callers on a mesh pass their dp extent — `bench.build_fused`,
    FusedPipeline)."""
    cap = INT8_CHUNK_MB if chunk_mb is None else float(chunk_mb)
    form = _resolve_form(form)
    if form == "im2col":
        # per-device footprint: divide by the dp extent ONLY when the
        # batch actually divides it — core/mesh.shard_batch replicates
        # non-dividing batches (every device then runs the FULL batch),
        # and dividing the estimate anyway would under-size the working
        # set by batch_shards x and re-admit the compile-OOM sites this
        # cap exists to reroute
        shards = max(int(batch_shards), 1)
        if x.shape[0] % shards != 0:
            shards = 1
        mib = _im2col_chunk_mib(x.shape, wq.shape, stride, padding,
                                lhs_dilation) / shards
        if mib > cap:
            form = "conv"
    xq = quantize_act(x, inv_in)
    y = conv2d_s8(xq, wq, stride=stride, padding=padding,
                  lhs_dilation=lhs_dilation, form=form).astype(jnp.float32)
    y = y * deq
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


def collect_calibration(dec, prepared: Dict, inputs: List[jnp.ndarray],
                        n_block_stages: int = 3) -> Dict[str, jnp.ndarray]:
    """absmax of every conv input over ONE batch: ``{"<stage>.<kkey>": f32}``.

    Jit it per calibration batch; reduce across batches on host
    (:func:`prepare_s2d_int8` does both).
    """
    stats: Dict[str, jnp.ndarray] = {}

    def hook(stage, st, x, kkey, bkey, **kw):
        stats[f"{stage}.{kkey}"] = jnp.max(jnp.abs(
            x.astype(jnp.float32)))
        return conv2d(x, st[kkey], st[bkey], **kw)

    apply_s2d_prepared(dec, prepared, inputs, n_block_stages,
                       conv_hook=hook)
    return stats


def prepare_s2d_int8(dec, variables: Dict,
                     calib_inputs: Sequence[List[jnp.ndarray]],
                     n_block_stages: int = 3,
                     prepared: Optional[Dict] = None,
                     prepare_fn=None, collect_fn=None) -> Dict:
    """Quantize a decoder for :func:`apply_s2d_int8`.

    ``calib_inputs``: a few representative feature pyramids (each shaped
    like the `apply` inputs; batch size need not match serving). Returns a
    pytree mirroring `prepare_s2d`'s: each stage keeps its conv keys
    (``k0``/``ksc``/... now int8) and biases (f32), plus per-site
    ``<kkey>_deq`` (f32 per-channel dequant = s_in * s_w) and
    ``<kkey>_inv`` (f32 scalar = 1/s_in) tensors the int8 hook reads.

    ``prepare_fn``/``collect_fn``: optional prebuilt ``jax.jit`` objects
    for the fold and calibration programs. A caller that re-quantizes for
    each new parameter set (the annotator's Retrain swaps solver params
    per round) must pass the SAME objects every time — jit caching is
    keyed on function identity, so the fresh lambdas built here would
    otherwise retrace + recompile per refold (30-90 s each on a
    remote-compile backend).
    """
    assert len(calib_inputs) > 0, "need at least one calibration pyramid"
    if prepared is None:
        if prepare_fn is None:
            prepare_fn = jax.jit(
                lambda v: prepare_s2d(dec, v, n_block_stages))
        prepared = prepare_fn(variables)

    collect = collect_fn if collect_fn is not None else jax.jit(
        lambda p, f: collect_calibration(dec, p, f, n_block_stages))
    stats: Dict[str, float] = {}
    for feats in calib_inputs:
        got = jax.device_get(collect(prepared, feats))
        for site, v in got.items():
            stats[site] = max(stats.get(site, 0.0), float(v))

    prepared = jax.device_get(prepared)
    qstages: Dict[str, Dict] = {}
    for sid, st in prepared["stages"].items():
        qs: Dict[str, np.ndarray] = {}
        for kkey, bkey in _SITES:
            if kkey not in st:
                continue
            wq, wscale = jax.device_get(quantize_weight(st[kkey]))
            s_in = max(stats[f"{sid}.{kkey}"], _EPS) / 127.0
            qs[kkey] = wq
            qs[kkey + "_deq"] = np.asarray(wscale * s_in, np.float32)
            qs[kkey + "_inv"] = np.float32(1.0 / s_in)
            qs[bkey] = np.asarray(st[bkey], np.float32)
        qstages[sid] = qs
    return {"stages": qstages}


def apply_s2d_int8(dec, qprepared: Dict, inputs: List[jnp.ndarray],
                   n_block_stages: int = 3, fine_logits: bool = False,
                   batch_shards: int = 1) -> jnp.ndarray:
    """Int8 inference-equivalent of ``apply_s2d_prepared`` from a
    :func:`prepare_s2d_int8` tree — same stage walk, every conv s8xs8->s32,
    elementwise tail unchanged in the decoder's compute dtype.

    ``batch_shards``: dp shard count of the batch axis — forwarded to every
    :func:`conv2d_s8_fused` site so its chunking decision sizes the
    per-DEVICE working set and never reshapes a sharded batch axis."""
    def hook(stage, st, x, kkey, bkey, **kw):
        return conv2d_s8_fused(x, st[kkey + "_inv"], st[kkey],
                               st[kkey + "_deq"], st[bkey],
                               batch_shards=batch_shards, **kw)

    return apply_s2d_prepared(dec, qprepared, inputs, n_block_stages,
                              fine_logits, conv_hook=hook)


# --------------------------------------------------------------- generator
# The GENERATOR's synthesis convs (the other ~36% of the fused pipeline's
# FLOPs) quantize through the flax modules themselves (`models/layers.py`
# Conv2DW / Conv2DTransposeW): weights quantize at TRACE time from the same
# effective-kernel math the float path runs (one source of truth; the
# round/clip over the weights is negligible next to the convs), and only
# the calibrated per-conv activation scales are external state — a `quant`
# variable collection produced here. Instance norm after every conv
# (AdaIN, `networks_stylegan.py:239-264`) renormalizes the activations, so
# quantization error does not compound multiplicatively across blocks.


def calibrate_generator(gen, params, calib_zs, noise_keys) -> Dict:
    """Per-conv input absmax over calibration batches.

    ``gen.apply`` with the ``qstats`` collection mutable makes every
    wscale conv sow ``absmax`` (`models/layers.py`); batches reduce by max
    on host. Returns the nested {module: {"absmax": f32}} tree."""
    stats = None
    fwd = jax.jit(lambda p, z, k: gen.apply(
        {"params": p}, z, rngs={"noise": k}, mutable=["qstats"])[1])
    for z, nk in zip(calib_zs, noise_keys):
        got = jax.device_get(fwd(params, z, nk))["qstats"]
        # sow stores a 1-tuple per module; unwrap and max-reduce
        got = jax.tree_util.tree_map(
            lambda v: np.float32(v[0] if isinstance(v, tuple) else v), got,
            is_leaf=lambda v: isinstance(v, tuple))
        stats = got if stats is None else jax.tree_util.tree_map(
            np.maximum, stats, got)
    return stats


def generator_quant_scales(stats: Dict) -> Dict:
    """qstats absmax tree -> the ``quant`` collection for
    ``gen.apply({"params": p, "quant": q}, ...)``: per-conv static input
    scales, stored as ``inv_in`` = 127/absmax."""

    def conv(d):
        return {"inv_in": np.float32(127.0 / max(float(d["absmax"]), _EPS))}

    return jax.tree_util.tree_map(
        conv, stats, is_leaf=lambda d: isinstance(d, dict) and "absmax" in d)


def quantize_generator(gen, params, calib_zs, noise_keys) -> Dict:
    """One-call calibration: returns the ``quant`` collection enabling the
    int8 path in every wscale conv of the generator."""
    return generator_quant_scales(
        calibrate_generator(gen, params, calib_zs, noise_keys))
