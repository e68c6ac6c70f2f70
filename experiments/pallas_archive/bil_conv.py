"""Pallas 3x3 conv in batch-in-lanes layout (narrow channels).

For the decoder's 1024^2 stages the channel count (16) is far below the
128-lane width; XLA's conv emitter packs batch into lanes but still runs at
~6% of the chip's achievable matmul peak. This kernel adopts the same
packing explicitly: the input is pre-transformed to (H, W, B*C) so the lane
dimension is exactly full when B*C == 128, and each of the 9 taps becomes a
dense (TH*W, B*C) x (B*C, B*C) MXU matmul against a **block-diagonal**
weight matrix (the per-sample C x C blocks are identical copies of the
conv's C x Cout matrix — the MXU multiplies a dense 128x128 anyway, so the
block-diagonal zeros cost nothing extra).

Row-halo handling is the two-block trick from ``small_conv.py`` (current +
next row-block, assembled in-register).

Contract: stride 1, pad 1, 3x3; B*Cin <= 128 and B*Cout <= 128.

MEASURED RESULT (round 1, axon-virtualized v5e): numerically exact, but
~85 ms for 8x1024^2 16->16 bf16 vs ~27 ms for XLA's own conv emitter —
the (B,H,W,C)<->(H,W,B*C) relayouts plus Mosaic's per-tap value-slice
reshapes dominate. Kept as documented groundwork; not wired into models.
Next avenue (future round): keep the whole high-res decoder stage resident
in the packed layout so the transposes amortize across several convs, and
express the tap shifts as pltpu.roll on the sublane dim instead of slices.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(cur_ref, nxt_ref, w_ref, b_ref, out_ref, *, th, w_size, lanes_in,
            lanes_out, out_dtype, relu, leaky):
    cur = cur_ref[...]
    nxt = nxt_ref[:2]
    xin = jnp.concatenate([cur, nxt], axis=0)  # (TH+2, W+2, lanes_in)

    acc = jnp.zeros((th * w_size, lanes_out), jnp.float32)
    for t in range(9):
        ky, kx = divmod(t, 3)
        xs = xin[ky:ky + th, kx:kx + w_size, :].reshape(th * w_size, lanes_in)
        acc += jax.lax.dot_general(
            xs, w_ref[t], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    if b_ref is not None:
        acc = acc + b_ref[0].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    elif leaky is not None:
        acc = jnp.where(acc >= 0, acc, leaky * acc)
    out_ref[...] = acc.reshape(th, w_size, lanes_out).astype(out_dtype)


def block_diag_weights(w, batch: int):
    """(3,3,Cin,Cout) -> (9, B*Cin, B*Cout) block-diagonal tap matrices."""
    cin, cout = w.shape[2], w.shape[3]
    eye = jnp.eye(batch, dtype=w.dtype)
    # (9, Cin, Cout) -> (9, B, Cin, B, Cout) with identity across B
    taps = w.reshape(9, cin, cout)
    bd = jnp.einsum("tio,bc->tbico", taps, eye)
    return bd.reshape(9, batch * cin, batch * cout)


@functools.partial(jax.jit, static_argnames=("tile_h", "relu", "leaky"))
def conv3x3_bil(x, w, b=None, *, tile_h: int = 4, relu: bool = False,
                leaky: Optional[float] = None):
    """y = conv3x3(x, w) [+b][+relu/leaky] via batch-in-lanes packing.

    x: (B, H, W, Cin), w: (3, 3, Cin, Cout), b: (Cout,) | None.
    Requires B*Cin <= 128 and B*Cout <= 128; H % tile_h == 0.
    """
    n, h, w_size, cin = x.shape
    cout = w.shape[3]
    assert w.shape == (3, 3, cin, cout)
    assert n * cin <= 128 and n * cout <= 128, (n, cin, cout)
    assert h % tile_h == 0

    lanes_in = n * cin
    lanes_out = n * cout

    # (B,H,W,C) -> (H,W,B*C), pad rows/cols
    xt = jnp.transpose(x, (1, 2, 0, 3)).reshape(h, w_size, lanes_in)
    xt = jnp.pad(xt, ((1, tile_h + 1), (1, 1), (0, 0)))

    w_bd = block_diag_weights(w, n).astype(x.dtype)
    b_full = None
    if b is not None:
        b_full = jnp.tile(b.astype(jnp.float32), (n,)).reshape(1, lanes_out)

    kern = functools.partial(
        _kernel, th=tile_h, w_size=w_size, lanes_in=lanes_in,
        lanes_out=lanes_out, out_dtype=x.dtype, relu=relu, leaky=leaky)

    in_specs = [
        pl.BlockSpec((tile_h, w_size + 2, lanes_in), lambda j: (j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_h, w_size + 2, lanes_in), lambda j: (j + 1, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = [xt, xt, w_bd]
    if b_full is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(b_full)
        body = kern
    else:
        def body(cur_ref, nxt_ref, w_ref, out_ref):
            return kern(cur_ref, nxt_ref, w_ref, None, out_ref)

    yt = pl.pallas_call(
        body,
        grid=(h // tile_h,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_h, w_size, lanes_out),
                               lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w_size, lanes_out), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(*args)
    # (H, W, B*C) -> (B, H, W, C)
    return jnp.transpose(yt.reshape(h, w_size, n, cout), (2, 0, 1, 3))
