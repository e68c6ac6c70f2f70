#!/usr/bin/env python3
"""Measure the fused conv+noise+bias+lrelu+IN-stats Pallas kernel against
the XLA composition at the generator's production shapes (VERDICT-r2 #4).

The shapes are the high-res StyleGAN block convs of the ffhq pipeline
(channel table `networks_stylegan.py:114-116`): 256^2x64, 512^2x32,
1024^2x16. Run on the real chip:

    python tools/bench_conv_in_stats.py [--batch 8] [--iters 8]

Prints one JSON line per shape: xla_ms, fused_ms, speedup. First Pallas
compile on the axon backend takes ~4 min per shape — budget accordingly.
"""

import argparse
import json
import sys
import time
from os.path import dirname, join

sys.path.insert(0, join(dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def xla_ref(x, w, noise, nscale, bias):
    from gan_segmentation_tpu.ops.conv import conv2d
    y = conv2d(x, w, padding=1)
    y = y + noise[..., None].astype(y.dtype) * nscale.astype(y.dtype)
    y = y + bias.astype(y.dtype)
    y = jnp.where(y >= 0, y, 0.2 * y)
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=(1, 2))
    var = jnp.mean(yf * yf, axis=(1, 2)) - mean * mean
    return y, mean, var


def checksum(args3):
    y, mean, var = args3
    return (jnp.sum(y.astype(jnp.float32)) + jnp.sum(mean) + jnp.sum(var))


def _chained(op, k_lo, k_hi):
    """Per-op DEVICE time via in-program repetition: this environment's
    ~26 ms synchronous dispatch floor swamps single-op wall measurements
    (e.g. a ~1 ms conv measures ~30 ms), so chain the op k times inside ONE
    jit program (x_{i+1} = y_i, cin==cout) and difference two chain lengths:
    (t(k_hi) - t(k_lo)) / (k_hi - k_lo) cancels dispatch + D2H overhead."""

    @jax.jit
    def run(k, x, w, noise, nscale, bias):
        def body(_, carry):
            x, s = carry
            y, mean, var = op(x, w, noise, nscale, bias)
            return y, s + jnp.sum(mean) + jnp.sum(var)
        y, s = jax.lax.fori_loop(0, k, body, (x, jnp.float32(0)))
        return jnp.sum(y.astype(jnp.float32)) + s

    def timed(k, args, reps=3):
        float(run(k, *args))  # warm (one compile total: k is traced)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(k, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    def measure(args):
        t_lo, t_hi = timed(k_lo, args), timed(k_hi, args)
        return (t_hi - t_lo) / (k_hi - k_lo) * 1e3

    return measure


def bench_one(h, c, batch, iters, dtype, tile_h, repeat=0):
    sys.path.insert(0, join(dirname(__file__), "..", "experiments",
                            "pallas_archive"))
    from conv_in_stats import conv3x3_noise_bias_lrelu_instats

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, h, h, c), dtype)
    w = (jax.random.normal(jax.random.fold_in(key, 1), (3, 3, c, c),
                           jnp.float32) * 0.1).astype(dtype)
    noise = jax.random.normal(jax.random.fold_in(key, 2), (batch, h, h),
                              jnp.float32)
    nscale = jax.random.normal(jax.random.fold_in(key, 3), (c,), jnp.float32)
    bias = jax.random.normal(jax.random.fold_in(key, 4), (c,), jnp.float32)

    xla_fn = jax.jit(lambda *a: checksum(xla_ref(*a)))
    fused_fn = jax.jit(lambda *a: checksum(
        conv3x3_noise_bias_lrelu_instats(*a, tile_h=tile_h)))

    out = {"h": h, "c": c, "batch": batch, "dtype": str(np.dtype(dtype))}
    if repeat:
        # device-time mode: requires cin == cout (chained), see _chained
        out["mode"] = f"device_time_chain_{repeat}"
        fused_op = lambda *a: conv3x3_noise_bias_lrelu_instats(
            *a, tile_h=tile_h)
        for name, op in (("xla", xla_ref), ("fused", fused_op)):
            try:
                out[f"{name}_ms"] = round(_chained(op, 1, repeat)(
                    (x, w, noise, nscale, bias)), 3)
            except Exception as exc:
                out[f"{name}_error"] = f"{type(exc).__name__}: {exc}"[:200]
    else:
        for name, fn in (("xla", xla_fn), ("fused", fused_fn)):
            try:
                float(fn(x, w, noise, nscale, bias))  # compile + warm
                t0 = time.perf_counter()
                vals = [fn(x, w, noise, nscale, bias) for _ in range(iters)]
                for v in vals:
                    float(v)  # 8-byte data-dependent D2H completion barrier
                out[f"{name}_ms"] = round(
                    (time.perf_counter() - t0) / iters * 1e3, 3)
            except Exception as exc:
                out[f"{name}_error"] = f"{type(exc).__name__}: {exc}"[:200]
    if "xla_ms" in out and "fused_ms" in out:
        out["speedup"] = round(out["xla_ms"] / out["fused_ms"], 3)
    # correctness spot-check on-device (checksums agree to bf16 tolerance)
    if not repeat and "xla_error" not in out and "fused_error" not in out:
        a = float(xla_fn(x, w, noise, nscale, bias))
        b = float(fused_fn(x, w, noise, nscale, bias))
        out["checksum_rel_err"] = round(abs(a - b) / max(abs(a), 1e-6), 6)
    print(json.dumps(out), flush=True)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=("bfloat16", "float32"))
    ap.add_argument("--tile-h", type=int, default=8)
    ap.add_argument("--repeat", type=int, default=0, metavar="K",
                    help="measure per-op DEVICE time by chaining the op K "
                         "times inside one program (cancels the ~26 ms "
                         "dispatch floor); 0 = wall-clock mode")
    ap.add_argument("--shapes", default="256:64,512:32,1024:16",
                    help="comma list of H:C (ffhq high-res block shapes)")
    a = ap.parse_args(argv)
    dtype = jnp.bfloat16 if a.dtype == "bfloat16" else jnp.float32
    for spec in a.shapes.split(","):
        h, c = (int(v) for v in spec.split(":"))
        bench_one(h, c, a.batch, a.iters, dtype, a.tile_h, repeat=a.repeat)


if __name__ == "__main__":
    main()
