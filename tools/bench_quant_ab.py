#!/usr/bin/env python3
"""Same-session INTERLEAVED bf16 vs int8 vs int8-full throughput A/B.

The round-3 "int8 loses to bf16 by ~15%" verdict (BASELINE.md: 368.4 /
366.5 vs 435.8) was measured through the conv-emitter int8 form that
commit 72d8847 later proved 21-50x slower than the im2col integer GEMM at
op level — so the end-to-end verdict is stale (VERDICT r4 next-step #2).
This tool re-decides it with the strongest protocol this variance-prone
virtualized chip allows: ALL modes' programs are built and warmed first,
then the timed windows run round-robin (bf16, int8, int8-full, bf16, ...)
so every mode samples the same environment windows — a between-session
throttle shift cannot masquerade as a mode difference.

Prints ONE JSON line:
  {"metric": "quant_ab_<res>px", "unit": "samples/sec/chip",
   "modes": {"bf16": {"median": .., "captures": {...}}, "int8": ...},
   "int8_form": "im2col", "int8_chunk_mb": 2048.0}

Ref anchor: the inference path this accelerates is the reference's
predict loop, /root/reference/seg_solver.py:307-329.
"""

import argparse
import json
import sys
import time
from os.path import dirname, join

sys.path.insert(0, join(dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--repeat", type=int, default=5)
    ap.add_argument("--max-res-log2", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--modes", default="bf16,int8,int8-full")
    args = ap.parse_args(argv)

    from gan_segmentation_tpu.core.jit_cache import enable_persistent_cache
    enable_persistent_cache()
    import bench

    modes = [m.strip() for m in args.modes.split(",")]
    progs = {}
    for mode in modes:
        quant = None if mode == "bf16" else mode
        t0 = time.perf_counter()
        fused_raw, gp, dprep = bench.build_fused(
            args.max_res_log2, quant=quant)

        @jax.jit
        def fused_sum(gp, dp, z, rng, _fr=fused_raw):
            img, mask = _fr(gp, dp, z, rng)
            return (jnp.sum(img.astype(jnp.int32))
                    + jnp.sum(mask.astype(jnp.int32)))

        progs[mode] = (fused_sum, gp, dprep)
        print(f"# built {mode} in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr, flush=True)

    rng = jax.random.PRNGKey(0)

    def launch(mode, i):
        fused_sum, gp, dprep = progs[mode]
        z = jax.random.normal(jax.random.fold_in(rng, i),
                              (args.batch, 512))
        return fused_sum(gp, dprep, z, jax.random.fold_in(rng, 1000 + i))

    for mode in modes:  # compile + warm every program BEFORE any timing
        t0 = time.perf_counter()
        for i in range(args.warmup):
            int(launch(mode, i))
        print(f"# warmed {mode} in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr, flush=True)

    rates = {m: [] for m in modes}
    k = args.warmup
    for r in range(args.repeat):
        for mode in modes:  # round-robin: same environment windows
            t0 = time.perf_counter()
            sums = [launch(mode, k + i) for i in range(args.iters)]
            for s in sums:
                int(s)  # data-dependent D2H barrier (bench.measure note)
            dt = time.perf_counter() - t0
            k += args.iters
            rates[mode].append(args.batch * args.iters / dt)
            print(f"# window {r} {mode}: {rates[mode][-1]:.1f}",
                  file=sys.stderr, flush=True)

    from gan_segmentation_tpu.ops.quant import INT8_CHUNK_MB, INT8_FORM
    out = {"metric": f"quant_ab_{2 ** args.max_res_log2}px",
           "unit": "samples/sec/chip", "modes": {},
           "int8_form": INT8_FORM, "int8_chunk_mb": INT8_CHUNK_MB}
    for mode in modes:
        value, captures = bench.median_and_captures(rates[mode])
        out["modes"][mode] = {"median": round(value, 3),
                              "captures": captures}
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    main()
