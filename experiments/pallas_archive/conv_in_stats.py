"""Fused conv3x3 + noise + bias + lrelu with instance-norm statistics in the
epilogue (the VERDICT-r2 #4 shot).

Motivation. In every StyleGAN synthesis block the order is
conv3x3 -> AddNoise -> Bias -> lrelu -> AdaIN
(`networks_stylegan.py:56-73,239-264`). AdaIN's instance-norm statistics
(per-(N,C) mean/var over HxW) force XLA into a separate reduction pass that
re-reads the full activation from HBM — at 1024^2 that read is a pure
roofline cost on every block, and it is inexpressible as an XLA fusion
because the producer conv is itself a fusion barrier. This kernel computes
the conv (9 MXU taps per tile, the structure proven correct in
`experiments/pallas_archive/small_conv.py`), applies noise/bias/lrelu in
the f32 epilogue, and accumulates per-(N,C) sum and sum-of-squares into a
revisited output block across the row-tile grid — so the activation is
written ONCE and never re-read for statistics.

Traffic math (activation of T bytes): XLA path = conv-write T + stats-read
T + normalize read/write 2T = 4T around the op pair; fused = write T +
normalize 2T = 3T. The saving is real but bounded (25% of the pair's
traffic) and rides on this kernel's conv being competitive.

MEASURED VERDICT (round 3, axon-virtualized v5e; ARCHIVED on it): in
device time (`tools/bench_conv_in_stats.py --repeat 17`, in-program
chaining that cancels the ~26 ms dispatch floor) the fused kernel is
~2x SLOWER than the XLA conv + separate-stats composition:
256^2x64 b8: XLA 0.92 ms vs fused 1.95 ms (0.47x); 512^2x32: 3.90 vs
7.21 ms (0.54x). The Pallas direct conv's deficit exceeds the one
activation read the fusion saves, consistent with the archived
small_conv measurements. Wall-clock single-op numbers (~30 ms both
paths, "speedup 1.0") are the dispatch floor, not the kernel.
Compile notes for this environment's remote helper: 3-D blocks of a 3-D
operand are rejected (noise must be carried 4-D, see _kernel), and
W=1024 blocks at tile_h=8 exceed what the helper will build — tile_h=4
compiles and measures 0.77x in wall-clock mode. Rerun on real silicon
where the conv gap may close.

Statistics are accumulated from the f32 epilogue values (higher fidelity
than recomputing from a bf16-stored activation), matching the framework's
"norm statistics in f32" convention.

Contract: NHWC / HWIO, stride 1, pad 1, kernel 3x3, H % tile_h == 0,
noise is (N, H, W) f32 (pre-broadcast over channels by per-C ``nscale``).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(cur_ref, nxt_ref, noise_ref, w_ref, p_ref, out_ref, stats_ref, *,
            th, w_size, cin, cout, out_dtype, leaky):
    cur = cur_ref[0]                      # (TH, W+2, Cin)
    nxt = nxt_ref[0][:2]                  # (2, W+2, Cin) halo rows
    xin = jnp.concatenate([cur, nxt], axis=0)  # (TH+2, W+2, Cin)

    acc = jnp.zeros((th * w_size, cout), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            xs = xin[ky:ky + th, kx:kx + w_size, :].reshape(th * w_size, cin)
            acc += jax.lax.dot_general(
                xs, w_ref[ky, kx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    # epilogue in f32: x + noise * nscale + bias, then lrelu
    nscale = p_ref[0].astype(jnp.float32)        # (Cout,)
    bias = p_ref[1].astype(jnp.float32)          # (Cout,)
    # noise block is (1, TH, W, 1): kept 4-D because the axon Mosaic
    # compile helper rejects 3-D blocks of a 3-D operand here (bisected:
    # identical kernel with a (1, TH, W) noise spec fast-fails with
    # tpu_compile_helper exit 1; the 4-D layout compiles)
    noise = noise_ref[0].reshape(th * w_size, 1).astype(jnp.float32)
    acc = acc + noise * nscale[None, :] + bias[None, :]
    acc = jnp.where(acc >= 0, acc, leaky * acc)

    # per-(N, C) instance-norm statistics: the stats block is the SAME for
    # every row-tile step j (revisited output), so accumulate across the
    # sequential grid dimension; initialize on the first tile.
    @pl.when(pl.program_id(1) == 0)
    def _init():
        stats_ref[0] = jnp.zeros((2, cout), jnp.float32)

    s1 = jnp.sum(acc, axis=0)
    s2 = jnp.sum(acc * acc, axis=0)
    stats_ref[0] = stats_ref[0] + jnp.stack([s1, s2])

    out_ref[0] = acc.reshape(th, w_size, cout).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("tile_h", "leaky"))
def conv3x3_noise_bias_lrelu_instats(x, w, noise, nscale, bias, *,
                                     tile_h: int = 8, leaky: float = 0.2):
    """-> (y, mean, var): y = lrelu(conv3x3(x, w) + noise*nscale + bias),
    (mean, var) its per-(N, C) instance statistics over HxW, f32.

    ``w`` is the EFFECTIVE kernel (any wscale runtime multiplier
    pre-applied by the caller); ``noise`` is (N, H, W) f32.
    """
    n, h, w_size, cin = x.shape
    assert w.shape[:2] == (3, 3) and w.shape[2] == cin, (w.shape, x.shape)
    cout = w.shape[3]
    assert h % tile_h == 0, (h, tile_h)
    assert noise.shape == (n, h, w_size), (noise.shape, x.shape)

    x_pad = jnp.pad(x, ((0, 0), (1, tile_h + 1), (1, 1), (0, 0)))
    n_blocks = h // tile_h
    params = jnp.stack([jnp.asarray(nscale, jnp.float32),
                        jnp.asarray(bias, jnp.float32)])  # (2, Cout)

    body = functools.partial(
        _kernel, th=tile_h, w_size=w_size, cin=cin, cout=cout,
        out_dtype=x.dtype, leaky=leaky)

    y, stats = pl.pallas_call(
        body,
        grid=(n, n_blocks),
        in_specs=[
            pl.BlockSpec((1, tile_h, w_size + 2, cin),
                         lambda ni, j: (ni, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, w_size + 2, cin),
                         lambda ni, j: (ni, j + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, w_size, 1),
                         lambda ni, j: (ni, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # (nscale, bias)
        ],
        out_specs=[
            pl.BlockSpec((1, tile_h, w_size, cout),
                         lambda ni, j: (ni, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, cout), lambda ni, j: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w_size, cout), x.dtype),
            jax.ShapeDtypeStruct((n, 2, cout), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x_pad, x_pad, jnp.asarray(noise, jnp.float32)[..., None], w, params)

    hw = h * w_size
    mean = stats[:, 0] / hw
    var = stats[:, 1] / hw - mean * mean
    return y, mean, var
