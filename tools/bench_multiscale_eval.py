#!/usr/bin/env python3
"""Measure the fused multi-scale eval protocol, per-image vs batched
(VERDICT r2 #8): DeepLabV3+ (random init — throughput only), the
reference's gluoncv protocol (base 512, crop 480, flip) on 1024^2 images.

    python tools/bench_multiscale_eval.py [--batches 1,2,4] [--images 8]

Prints one JSON line per batch size: img/s. Round-2 per-image baseline on
this chip: 2.45 img/s; at one uint8 (H, W) pull per image (~1 MB) the
~20 MB/s tunnel allows ~20 img/s, so the path is compute-bound and the
batched program (`MultiEvalModel.device_scores_batch`) is the lever —
fuller MXU batches, amortized dispatch.
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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,2,4")
    ap.add_argument("--images", type=int, default=8)
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--base-size", type=int, default=512)
    ap.add_argument("--crop-size", type=int, default=480)
    ap.add_argument("--repeat", type=int, default=1,
                    help="timed windows per batch size on the same compiled "
                         "program; >1 reports median + min/max (the "
                         "repeated-capture protocol, as bench.py --repeat)")
    a = ap.parse_args(argv)

    from gan_segmentation_tpu.models.deeplab import DeepLabV3Plus
    from gan_segmentation_tpu.train.deeplab_trainer import MultiEvalModel

    model = DeepLabV3Plus(nclass=2, aux=False, crop_size=a.crop_size,
                          dtype=jnp.bfloat16)
    dummy = jnp.zeros((1, a.crop_size, a.crop_size, 3), jnp.float32)
    v = jax.jit(lambda x: model.init(jax.random.PRNGKey(0), x, False))(dummy)
    ev = MultiEvalModel(model, v["params"], v.get("batch_stats", {}),
                        nclass=2, base_size=a.base_size,
                        crop_size=a.crop_size, flip=True, scales=(1.0,))

    rs = np.random.RandomState(0)
    imgs = [rs.randn(a.res, a.res, 3).astype(np.float32)
            for _ in range(a.images)]

    @jax.jit
    def reduce_scores(s):  # 8-byte data-dependent completion barrier
        return jnp.sum(s.astype(jnp.float32))

    results = []
    for b in (int(x) for x in a.batches.split(",")):
        n = (a.images // b) * b
        # warm: compile the (b, H, W, C) program
        float(reduce_scores(ev.device_scores_batch(imgs[:b])))
        rates = []
        for _ in range(max(a.repeat, 1)):
            t0 = time.perf_counter()
            sums = []
            for s in range(0, n, b):
                sums.append(
                    reduce_scores(ev.device_scores_batch(imgs[s:s + b])))
            for x in sums:
                float(x)
            rates.append(n / (time.perf_counter() - t0))
        from bench import median_and_captures
        med, captures = median_and_captures(rates)
        rec = {"batch": b, "images": n,
               "img_per_sec": round(med, 3),
               "res": a.res, "flip": True, "base": a.base_size,
               "crop": a.crop_size}
        if captures:
            rec["captures"] = captures
        print(json.dumps(rec), flush=True)
        results.append(rec)
    return results


if __name__ == "__main__":
    main()
