"""Benchmark the host-side (image.jpg, mask.png) pair writers.

Compares the reference-style sequential cv2 loop (`main.py:100-103`,
including its BGR flip copy and the host `np.unpackbits`) against the native
C++ threaded writer (`gan_segmentation_tpu/native/imgio.cc`) at generate-path
shapes.  The native writer is the deployment path: at the measured device
rate (~440 pairs/sec @1024^2, BASELINE.md) host encode is the generate CLI's
bottleneck on real silicon, and the native pool scales with host cores where
the cv2 loop cannot.

Usage:  python tools/bench_writer.py [--res 1024] [--n 64] [--threads 0]
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synth_pairs(res: int, n_distinct: int = 8, seed: int = 0):
    """Photo-like images (smooth + texture), binary masks, device-packed."""
    rng = np.random.default_rng(seed)
    imgs, masks = [], []
    for _ in range(n_distinct):
        base = rng.integers(0, 256, (res // 32, res // 32, 3), np.uint8)
        img = np.kron(base, np.ones((32, 32, 1), np.uint8))
        img = np.clip(img.astype(np.int16)
                      + rng.integers(-12, 13, img.shape, np.int16),
                      0, 255).astype(np.uint8)
        yy, xx = np.indices((res, res))
        mask = (((yy - res / 2) ** 2 + (xx - res / 2) ** 2)
                < (res * rng.uniform(0.2, 0.45)) ** 2).astype(np.uint8)
        imgs.append(img)
        masks.append(np.packbits(mask, axis=-1))
    return imgs, masks


def bench_cv2(imgs, masks_packed, n, dst):
    import cv2
    t0 = time.perf_counter()
    for i in range(n):
        img = imgs[i % len(imgs)]
        mask = np.unpackbits(masks_packed[i % len(masks_packed)], axis=-1)
        cv2.imwrite(os.path.join(dst, f"img_{i:06d}.jpg"), img[:, :, ::-1])
        cv2.imwrite(os.path.join(dst, f"mask_{i:06d}.png"), mask)
    return n / (time.perf_counter() - t0)


def bench_native(imgs, masks_packed, n, dst, threads):
    """Returns (pairs/s wall, mean main-thread-blocked ms per submit).

    The second number is what the generate loop actually pays per pair
    while the device streams batches: for the cv2 loop it is the full
    encode (~1000/rate ms); for the native writer it is one memcpy into
    the bounded queue — encode runs GIL-free behind the D2H waits."""
    from gan_segmentation_tpu.native import PairWriter
    res = imgs[0].shape[1]
    t0 = time.perf_counter()
    blocked = 0.0
    with PairWriter(threads=threads) as w:
        for i in range(n):
            s0 = time.perf_counter()
            w.submit(os.path.join(dst, f"img_{i:06d}.jpg"),
                     os.path.join(dst, f"mask_{i:06d}.png"),
                     img=imgs[i % len(imgs)],
                     mask=masks_packed[i % len(masks_packed)],
                     mask_packed=True, mask_width=res)
            blocked += time.perf_counter() - s0
    return n / (time.perf_counter() - t0), 1e3 * blocked / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--threads", type=int, default=0,
                    help="native writer threads (0 = auto: cores-1)")
    args = ap.parse_args()

    from gan_segmentation_tpu.native import native_available
    imgs, masks = synth_pairs(args.res)
    print(f"res={args.res} n={args.n} cores={os.cpu_count()}")
    with tempfile.TemporaryDirectory() as dst:
        r = bench_cv2(imgs, masks, args.n, dst)
        print(f"cv2 sequential loop:   {r:7.1f} pairs/s")
    if not native_available():
        print("native writer unavailable (toolchain missing)")
        return
    for threads in sorted({1, args.threads or max(1, (os.cpu_count() or 1) - 1)}):
        with tempfile.TemporaryDirectory() as dst:
            r, blk = bench_native(imgs, masks, args.n, dst, threads)
            print(f"native writer x{threads:2d}:     {r:7.1f} pairs/s "
                  f"(wall incl. drain); main thread blocked {blk:.2f} "
                  "ms/pair (memcpy when the pool keeps up; backpressure "
                  "wait when encode-bound)")


if __name__ == "__main__":
    main()
