#!/usr/bin/env python3
"""Serving demo at toy scale: train -> export -> serve with no model code.

1. train the Decoder on fabricated annotations (as in full_pipeline_demo);
2. export the fused z->(image, mask) pipeline as a program+weights BUNDLE
   (`core/export.py::save_bundle` — KB-scale module, weights swappable);
3. simulate a serving process: load the bundle (weights bound, device-
   resident) and emit pairs through the native C++ writer — the only
   framework imports on the "serving side" are `core.export.load_bundle`
   and `native.PairWriter`; no flax model code runs.

Runs on whatever backend is visible (TPU here; pass --cpu to pin the host
CPU backend — the env-var route is overridden by this image's sitecustomize):

    python examples/serving_demo.py [--workdir DIR] [--cpu]
"""

import argparse
import sys
import time
from os.path import dirname, join

sys.path.insert(0, join(dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/ganseg_serving_demo")
    ap.add_argument("--max-res-log2", type=int, default=6)  # 64 px
    ap.add_argument("--n-annotations", type=int, default=8)
    ap.add_argument("--n-serve", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--decoder-epochs", type=int, default=6)
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (ignore any attached TPU)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from gan_segmentation_tpu.core.jit_cache import enable_persistent_cache
    enable_persistent_cache()  # repeat demo runs deserialize their compiles

    sys.path.insert(0, join(dirname(__file__), "..", "tests"))
    from util_fixtures import make_annotation_dir

    from gan_segmentation_tpu.core.config import SolverConfig
    from gan_segmentation_tpu.core.export import (
        export_fused_pipeline_bundle, load_bundle)
    from gan_segmentation_tpu.train.generator import (FusedPipeline,
                                                      ImageGenerator)
    from gan_segmentation_tpu.train.solver import SegSolver

    res = 2 ** args.max_res_log2
    data_dir = join(args.workdir, "data")
    ckpt_dir = join(args.workdir, "checkpoints")
    bundle_dir = join(args.workdir, "generate.bundle")
    out_dir = join(args.workdir, "served")
    import os
    os.makedirs(out_dir, exist_ok=True)

    # -- 1. train ----------------------------------------------------------
    print(f"[1/3] training decoder at {res}px on "
          f"{args.n_annotations} fabricated annotations ...")
    make_annotation_dir(data_dir, n_samples=args.n_annotations,
                        max_res_log2=args.max_res_log2, seed=0)
    cfg = SolverConfig(max_res_log2=args.max_res_log2)
    cfg.train_epochs = args.decoder_epochs
    solver = SegSolver(args.max_res_log2, data_dir, ckpt_dir, cfg=cfg)
    solver.fit()

    # -- 2. export ---------------------------------------------------------
    print("[2/3] exporting the fused pipeline as a serving bundle ...")
    gen = ImageGenerator(gan="bedrooms", batch_size=args.batch,
                         max_res_log2=args.max_res_log2,
                         gan_dir="/nonexistent")
    pipeline = FusedPipeline(gen, solver)
    export_fused_pipeline_bundle(pipeline, args.batch, bundle_dir)
    sizes = {f: os.path.getsize(join(bundle_dir, f))
             for f in sorted(os.listdir(bundle_dir))}
    print(f"      bundle: {sizes}")

    # -- 3. serve (no model code) -----------------------------------------
    print(f"[3/3] serving {args.n_serve} pairs from the bundle ...")
    serve = load_bundle(bundle_dir)
    rng = jax.random.PRNGKey(42)

    try:
        from gan_segmentation_tpu.native import PairWriter
        writer = PairWriter()
    except RuntimeError:
        writer = None
        import cv2
    t0 = time.perf_counter()
    index = 0
    while index < args.n_serve:
        rng, zk, nk = jax.random.split(rng, 3)
        z = np.asarray(jax.random.normal(zk, (args.batch, 512)))
        imgs, masks = serve(z, np.asarray(jax.random.key_data(nk)))
        imgs, masks = np.asarray(imgs), np.asarray(masks)
        packed = masks.ndim == 3 and masks.shape[-1] * 8 == imgs.shape[2]
        for i in range(min(args.batch, args.n_serve - index)):
            ip = join(out_dir, f"img_{index:06d}.jpg")
            mp = join(out_dir, f"mask_{index:06d}.png")
            if writer is not None:
                writer.submit(ip, mp, img=imgs[i], mask=masks[i],
                              mask_packed=packed, mask_width=imgs.shape[2])
            else:  # pragma: no cover - toolchain-less fallback
                m = np.unpackbits(masks[i], axis=-1) if packed else masks[i]
                cv2.imwrite(ip, imgs[i][:, :, ::-1])
                cv2.imwrite(mp, m)
            index += 1
    if writer is not None:
        writer.finish()
    dt = time.perf_counter() - t0
    print(f"      wrote {index} pairs to {out_dir} "
          f"({index / dt:.1f} pairs/s, writer="
          f"{'native' if writer is not None else 'cv2'})")


if __name__ == "__main__":
    main()
