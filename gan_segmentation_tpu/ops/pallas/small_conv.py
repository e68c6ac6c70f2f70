"""Pallas direct 3x3 convolution for small channel counts.

XLA's conv kernel runs at ~1-4% of MXU peak for the narrow layers that
dominate this framework's hot loops — the generator's high-res style blocks
and the segmentation decoder both convolve 1024^2 images with 16-64
channels (`networks_stylegan.py` res>=256, `networks_seg.py`). This kernel
formulates the conv as 9 shifted (TH*W, Cin) x (Cin, Cout) MXU matmuls over
a row-tile streamed HBM->VMEM per grid step, with the halo handled by
manual DMA (overlapping reads are not expressible as BlockSpecs).

Constraints: NHWC, stride 1, symmetric pad 1, kernel 3x3; Cin/Cout should
be <= 128 for the design to make sense (wider layers are fine in XLA).
Accumulation is f32 regardless of I/O dtype.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, b_ref, out_ref, scratch, sem, *, th, w_size, cin,
            cout, out_dtype, relu, leaky):
    ni = pl.program_id(0)
    i = pl.program_id(1)

    dma = pltpu.make_async_copy(
        x_hbm.at[ni, pl.ds(i * th, th + 2)], scratch, sem)
    dma.start()
    dma.wait()

    acc = jnp.zeros((th * w_size, cout), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            xs = scratch[ky:ky + th, kx:kx + w_size, :]
            xs = xs.reshape(th * w_size, cin)
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
    """y = conv3x3(x, w) [+ b] [+ relu/leaky], NHWC/HWIO, stride 1, pad 1.

    x: (N, H, W, Cin); w: (3, 3, Cin, Cout); b: (Cout,) or None.
    H must be divisible by ``tile_h``.
    """
    n, h, w_size, cin = x.shape
    assert w.shape[:2] == (3, 3) and w.shape[2] == cin, w.shape
    cout = w.shape[3]
    assert h % tile_h == 0, (h, tile_h)

    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    kern = functools.partial(
        _kernel, th=tile_h, w_size=w_size, cin=cin, cout=cout,
        out_dtype=x.dtype, relu=relu, leaky=leaky)

    has_bias = b is not None
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),   # full padded input
        pl.BlockSpec(memory_space=pltpu.VMEM),  # weights, full
    ]
    args = [x_pad, w]
    if has_bias:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(b.reshape(1, cout))
        body = kern
    else:
        def body(x_hbm, w_ref, out_ref, scratch, sem):
            return kern(x_hbm, w_ref, None, out_ref, scratch, sem)

    return pl.pallas_call(
        body,
        grid=(n, h // tile_h),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile_h, w_size, cout),
                               lambda ni, i: (ni, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w_size, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, w_size + 2, cin), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(*args)
