"""Pallas direct 3x3 convolution for narrow layers.

XLA's TPU conv kernel runs at ~1-4% of MXU peak for the narrow (16-64
channel) layers that dominate this framework's hot loops — the generator's
high-res style blocks and the segmentation decoder at 1024^2
(`networks_stylegan.py` res>=256, `networks_seg.py`). XLA-level im2col
reformulations lose to HBM traffic (the 3x/9x materialized copies cost more
than the bad conv kernel wastes). This kernel keeps the taps in VMEM: each
grid step receives one TH-row block plus the *next* block (two block-aligned
input specs — the +1-row halo is assembled in-register, avoiding both
overlapping BlockSpecs and manual DMA, whose lane-alignment rules forbid
sub-128 channel slices), then runs the 9 taps as (TH*W, Cin) x (Cin, Cout)
MXU dots with f32 accumulation. Bias and leaky-relu epilogues are fused.

Contract: NHWC / HWIO, stride 1, pad 1, kernel 3x3, H % TH == 0.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(cur_ref, nxt_ref, w_ref, b_ref, out_ref, *, th, w_size, cin,
            cout, out_dtype, relu, leaky):
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
    if b_ref is not None:
        acc = acc + b_ref[0].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    elif leaky is not None:
        acc = jnp.where(acc >= 0, acc, leaky * acc)
    out_ref[0] = acc.reshape(th, w_size, cout).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("tile_h", "relu", "leaky"))
def conv3x3_small(x, w, b=None, *, tile_h: int = 8, relu: bool = False,
                  leaky: Optional[float] = None):
    """y = conv3x3(x, w) [+ b] [+ relu/leaky(0.2)], NHWC, stride 1, pad 1."""
    n, h, w_size, cin = x.shape
    assert w.shape[:2] == (3, 3) and w.shape[2] == cin, (w.shape, x.shape)
    cout = w.shape[3]
    assert h % tile_h == 0, (h, tile_h)

    # rows: [zero, x rows..., zero, extra zeros] so that row-block j+1 always
    # exists; width: [zero, x cols..., zero]
    x_pad = jnp.pad(x, ((0, 0), (1, tile_h + 1), (1, 1), (0, 0)))
    n_blocks = h // tile_h

    kern = functools.partial(
        _kernel, th=tile_h, w_size=w_size, cin=cin, cout=cout,
        out_dtype=x.dtype, relu=relu, leaky=leaky)

    in_specs = [
        pl.BlockSpec((1, tile_h, w_size + 2, cin),
                     lambda ni, j: (ni, j, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_h, w_size + 2, cin),
                     lambda ni, j: (ni, j + 1, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
    ]
    args = [x_pad, x_pad, w]
    if b is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(b.reshape(1, cout))
        body = kern
    else:
        def body(cur_ref, nxt_ref, w_ref, out_ref):
            return kern(cur_ref, nxt_ref, w_ref, None, out_ref)

    return pl.pallas_call(
        body,
        grid=(n, n_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile_h, w_size, cout),
                               lambda ni, j: (ni, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w_size, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(*args)
