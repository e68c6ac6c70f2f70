"""Benchmark the host-side (image.jpg, mask.png) pair readers.

Compares the reference-style cv2 decode pipeline (cv2.imread BGR -> cvtColor
-> cv2.resize, as in `lib/data/segmentation/ffhq_hair_segmentation.py:63-67`)
against the native C++ reader (`gan_segmentation_tpu/native/imgio.cc`) that
fuses the training scale factor into the JPEG decode itself (libjpeg
DCT-domain scaling) and emits RGB directly.  FFHQ trains at scale 0.5 of
1024^2 JPEGs (`01/main.py:97-99`): at denom 2 the IDCT runs on 1/4 the
coefficients and the resize pass disappears.

Also reports the thread-scaling of each path (both release the GIL;
parallelism = `--workers` on the deeplab CLIs).

Usage:  python tools/bench_reader.py [--res 1024] [--n 64] [--workers 0]
"""

import argparse
import os
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_writer import synth_pairs  # noqa: E402  (same synthetic content)


def write_set(d: str, res: int, n: int):
    import cv2
    imgs, masks = synth_pairs(res)
    paths = []
    for i in range(n):
        ip = os.path.join(d, f"img_{i:06d}.jpg")
        mp = os.path.join(d, f"mask_{i:06d}.png")
        k = i % len(imgs)
        cv2.imwrite(ip, imgs[k][:, :, ::-1])
        cv2.imwrite(mp, np.unpackbits(masks[k], axis=-1))
        paths.append((ip, mp))
    return paths


def cv2_read(ip, mp, scale):
    import cv2
    img = cv2.cvtColor(cv2.imread(ip), cv2.COLOR_BGR2RGB)
    if scale != 1.0:
        img = cv2.resize(img, (0, 0), fx=scale, fy=scale)
    mask = cv2.imread(mp, cv2.IMREAD_UNCHANGED)
    if mask.shape[:2] != img.shape[:2]:
        mask = cv2.resize(mask, (img.shape[1], img.shape[0]),
                          interpolation=cv2.INTER_NEAREST)
    return img, mask


def timed(fn, paths, workers):
    t0 = time.perf_counter()
    if workers > 1:
        with ThreadPoolExecutor(workers) as pool:
            list(pool.map(lambda p: fn(*p), paths))
    else:
        for p in paths:
            fn(*p)
    dt = time.perf_counter() - t0
    return len(paths) / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--workers", type=int, default=0,
                    help="0 = cpu_count")
    args = ap.parse_args()
    workers = args.workers or (os.cpu_count() or 1)

    from gan_segmentation_tpu import native
    if not native.native_available():
        print("native imgio unavailable; nothing to compare")
        return

    with tempfile.TemporaryDirectory() as d:
        paths = write_set(d, args.res, args.n)
        sz = sum(os.path.getsize(p) for pair in paths for p in pair)
        print(f"set: {args.n} pairs @{args.res}^2, "
              f"{sz / len(paths) / 1e3:.0f} KB/pair on disk")

        for scale, denom in ((1.0, 1), (0.5, 2)):
            for w in sorted({1, workers}):
                r_cv = timed(lambda i, m: cv2_read(i, m, scale), paths, w)
                r_na = timed(lambda i, m: native.read_pair(i, m, denom),
                             paths, w)
                print(f"scale {scale} workers {w}: "
                      f"cv2 {r_cv:6.1f} pairs/s | "
                      f"native {r_na:6.1f} pairs/s "
                      f"({r_na / r_cv:.2f}x)")


if __name__ == "__main__":
    main()
