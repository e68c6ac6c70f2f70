"""CLI entry point mirroring the reference ``main.py``:

    python main.py [annotation|train|evaluate|generate]

reads ``config.yml`` from the working directory (keys at `main.py:33-43`),
seeds the RNGs with 0 (`main.py:29-31`), and dispatches:
- ``train``    decoder training on the annotated collection (`main.py:54-60`)
- ``evaluate`` decoder eval on BASE_DIR/eval (`main.py:61-74`)
- ``generate`` synthetic dataset emission (`main.py:75-104`) — fused on
  device: z -> image+mask in one jit program, only uint8 crossing to host
- ``annotation`` tkinter GUI (optional, host-side; `main.py:45-53`)
"""

import argparse
import logging
import os
import sys
from os import makedirs
from os.path import isdir, isfile, join
from typing import Optional

import numpy as np

from ..core.config import MAX_RES_LOG2, load_config_file
from ..train.generator import FusedPipeline, ImageGenerator
from ..train.solver import SegSolver

log = logging.getLogger(__name__)
logging.basicConfig(level=logging.INFO,
                    format="%(levelname)s:%(name)s:%(message)s")


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("action", nargs="?",
                        choices=("annotation", "train", "evaluate", "generate"),
                        default="annotation")
    parser.add_argument("--config", default="config.yml")
    parser.add_argument(
        "--spatial", type=int, default=1, metavar="N",
        help="generate: shard each image's height over N devices on a "
             "(data, space) mesh (spatial parallelism; devices/N batch "
             "groups run data-parallel). N must divide the device count.")
    parser.add_argument(
        "--dp", type=int, default=1, metavar="D",
        help="generate: run the fused pipeline data-parallel over D local "
             "devices (the TPU analog of the reference's multi-GPU "
             "GAN_GPU_IDS generation, image_generator.py:17,95: the batch "
             "is sharded over D chips; emitted pairs match --dp 1 up to "
             "bf16 rounding). 0 = all local devices. Composes with --spatial "
             "(D x N mesh); under multi-host each process uses its own "
             "local chips.")
    parser.add_argument(
        "--resume", action="store_true", default=False,
        help="generate: continue an interrupted emission — keep the "
             "contiguous (image, mask) pairs already on disk, fast-forward "
             "the seeded z stream past them, and write only the remainder "
             "(the pairs produced are identical to an uninterrupted run)")
    parser.add_argument(
        "--quant", choices=("none", "int8", "int8-full"), default="none",
        help="generate: post-training quantization (ops/quant.py, "
             "s8xs8->s32 on the MXU; scales self-calibrate on two "
             "fixed-key generator batches). int8 = decoder tail only, "
             "masks ~99%%+ identical to bf16; int8-full = generator "
             "synthesis convs too (~100%% of conv FLOPs; ~97%% mask "
             "agreement / ~35 dB image PSNR on worst-case random weights "
             "— validate on trained weights first). Incompatible with "
             "--spatial")
    parser.add_argument(
        "--writer", choices=("auto", "native", "cv2"), default="auto",
        help="generate: host-side pair writer. 'native' is the C++ threaded "
             "JPEG/PNG encoder (gan_segmentation_tpu.native, GIL-free, "
             "scales with host cores); 'cv2' is the reference-style "
             "sequential loop; 'auto' picks native when it builds.")
    return parser.parse_args(argv)


def build_solver(cfg, keep_weights=False):
    max_res_log2 = cfg.max_res_log2
    return SegSolver(max_res_log2, join(cfg.BASE_DIR, "data"),
                     join(cfg.BASE_DIR, "checkpoints"),
                     keep_weights=keep_weights,
                     cfg=cfg.solver_config())


def run_train(cfg):
    solver = build_solver(cfg, keep_weights=False)
    solver.fit()


def run_evaluate(cfg):
    solver = build_solver(cfg, keep_weights=False)
    if not solver.is_trained:
        print("train Decoder first!")
        sys.exit(-1)
    result = solver.evaluate(join(cfg.BASE_DIR, "eval"))
    print(", ".join(f"{name}: {value:.4f}" for name, value in result))


def _write_pairs_native(pipeline, n_local: int, dst_dir: str, start: int,
                        progress) -> None:
    """Drive the C++ threaded writer with device batches: masks stay
    bit-packed all the way into the PNG encoder, images are encoded as RGB
    directly (no BGR flip copy), and encode overlaps device compute."""
    from ..native import PairWriter
    with PairWriter() as writer:
        index = start
        for imgs, masks, packed in pipeline.generate_batches(n_local):
            width = imgs.shape[2]
            for i in range(imgs.shape[0]):
                writer.submit(join(dst_dir, f"img_{index:06d}.jpg"),
                              join(dst_dir, f"mask_{index:06d}.png"),
                              img=imgs[i], mask=masks[i], mask_packed=packed,
                              mask_width=width)
                index += 1
                if progress is not None:
                    progress.update()


def _write_pairs_cv2(pipeline, n_local: int, dst_dir: str, start: int,
                     progress) -> None:
    """Reference-style sequential writer loop (`main.py:96-104`).

    Writes are atomic (tmp + rename, format inferred from the tmp name's
    real extension) so a kill mid-encode never leaves a torn file at a
    final name — the invariant `resume_offset` relies on (the native
    writer's C++ encoders give the same guarantee)."""
    import cv2

    def atomic_write(name: str, arr) -> None:
        tmp = join(dst_dir, ".tmp_" + name)
        if not cv2.imwrite(tmp, arr):
            raise RuntimeError(f"cv2.imwrite failed for {name}")
        os.replace(tmp, join(dst_dir, name))

    for index, (img, mask) in enumerate(pipeline.generate_pairs(n_local)):
        atomic_write(f"img_{start + index:06d}.jpg", img[:, :, ::-1])
        atomic_write(f"mask_{start + index:06d}.png", mask)
        if progress is not None:
            progress.update()


def resume_offset(dst_dir: str, start: int, n_local: int,
                  batch_size: int) -> int:
    """How many of this process's pairs an interrupted `generate` already
    wrote, rounded DOWN to a device-batch boundary.

    Counts the contiguous run of (img, mask) pairs from ``start``. Both
    writers are ATOMIC (tmp + rename — the native pool encodes many files
    concurrently, so a kill could otherwise tear any in-flight file, not
    just the newest): a file at its final name is complete, making the
    contiguity scan sound. One pair of extra back-off defends datasets
    written by older/foreign tools, and the result rounds down to a
    multiple of ``batch_size`` so the resumed z stream stays batch-aligned
    with the original run (batches are fixed-size; sample i always comes
    from batch i // batch_size). The overlap is re-written with identical
    bytes."""
    done = 0
    while done < n_local:
        idx = start + done
        if not (isfile(join(dst_dir, f"img_{idx:06d}.jpg"))
                and isfile(join(dst_dir, f"mask_{idx:06d}.png"))):
            break
        done += 1
    return (max(0, done - 1) // batch_size) * batch_size


def run_generate(cfg, spatial: int = 1, writer: str = "auto",
                 resume: bool = False, quant: Optional[str] = None,
                 dp: int = 1):
    import jax
    if spatial > 1 and jax.process_count() > 1:
        # A (data, space) mesh would span processes: the per-process z
        # streams would be mis-assembled by shard_batch's multi-host path
        # and the host-side uint8 pulls need every device of a sample
        # addressable. Fail loudly instead of hanging in a collective.
        raise SystemExit(
            "--spatial > 1 is a single-process capability; run spatial "
            "generation in one process (it already uses every local "
            "device), or drop --spatial for multi-host generation")
    solver = build_solver(cfg, keep_weights=False)
    if not solver.is_trained:
        print("train Decoder first!")
        sys.exit(-1)

    # multi-host: generation is embarrassingly parallel — each process
    # draws its own z stream (seed = process_index) and writes a disjoint
    # contiguous slice of the global index range
    pc, pi = jax.process_count(), jax.process_index()
    n_total = cfg.GENERATE_NUM
    share = (n_total + pc - 1) // pc
    start = pi * share
    n_local = max(0, min(share, n_total - start))

    batch_size = cfg.GAN_BATCH_SIZE_PER_GPU * max(1, len(cfg.GAN_GPU_IDS))
    netG = ImageGenerator(gan=cfg.GAN, gan_dir=cfg.GAN_DIR,
                          batch_size=batch_size,
                          max_res_log2=cfg.MAX_RES_LOG2, seed=pi)
    from ..core.mesh import DATA_AXIS, SPACE_AXIS, spatial_mesh
    try:
        # local_devices: under multi-host each process generates its own
        # independent slice, so its mesh must stay process-local
        # (core/mesh.py is_local_mesh — the single-controller sharding path)
        mesh = spatial_mesh(spatial, dp=None if dp == 1 else dp,
                            devices=jax.local_devices())
    except ValueError as exc:
        raise SystemExit(str(exc))
    if mesh is not None:
        log.info("generation mesh (data=%d, space=%d): batch sharded over "
                 "the data axis, image height over the space axis",
                 mesh.shape[DATA_AXIS], mesh.shape[SPACE_AXIS])
        if batch_size % mesh.shape[DATA_AXIS]:
            log.warning(
                "batch size %d does not divide the %d data-parallel "
                "groups: batches run REPLICATED (correct but not "
                "parallel); set GAN_BATCH_SIZE_PER_GPU so the product "
                "divides --dp", batch_size, mesh.shape[DATA_AXIS])
    try:
        pipeline = FusedPipeline(netG, solver, mesh=mesh, quant=quant)
    except ValueError as exc:  # e.g. --quant with --spatial
        raise SystemExit(str(exc))
    if quant == "int8":
        log.info("decoder tail: int8 post-training quantization "
                 "(ops/quant.py; masks ~99%%+ identical to bf16)")
    elif quant == "int8-full":
        log.info("full pipeline int8: generator synthesis convs AND the "
                 "decoder tail are quantized (ops/quant.py; emitted images "
                 "differ from bf16 at ~35 dB PSNR, masks ~97%% identical — "
                 "validate on trained weights before production emission)")

    dst_dir = join(cfg.BASE_DIR, "dataset", "train_generated")
    if not isdir(dst_dir):
        makedirs(dst_dir)

    skip = 0
    if resume:
        skip = resume_offset(dst_dir, start, n_local, batch_size)
        if skip:
            netG.skip_batches(skip // batch_size)
            log.info("resume: %d pairs already on disk, fast-forwarded the "
                     "z stream %d batches; writing indices %d..%d",
                     skip, skip // batch_size, start + skip,
                     start + n_local - 1)
    n_todo = n_local - skip

    progress = None
    if pi == 0:
        try:
            from tqdm import tqdm
            progress = tqdm(total=n_todo)
        except ImportError:  # pragma: no cover
            pass
    if writer == "auto":
        from ..native import native_available
        writer = "native" if native_available() else "cv2"
    log.info("pair writer: %s", writer)
    write = _write_pairs_native if writer == "native" else _write_pairs_cv2
    write(pipeline, n_todo, dst_dir, start + skip, progress)
    if progress is not None:
        progress.close()
    log.info("wrote %d (image, mask) pairs to %s (indices %d..%d)",
             n_todo, dst_dir, start + skip, start + n_local - 1)


def run_annotation(cfg):
    import tkinter as tk

    from .annotator import SegmentationAnnotator

    root = tk.Tk()
    if cfg.ANNOTATION == "segmentation":
        SegmentationAnnotator(
            root, cfg.BASE_DIR, gan_dir=cfg.GAN_DIR, gan=cfg.GAN,
            n_generate=cfg.GENERATE_NUM,
            gan_batch_size=cfg.GAN_BATCH_SIZE_PER_GPU * max(1, len(cfg.GAN_GPU_IDS)),
        ).pack(fill="both", expand=True)
    else:
        print(f"uknown annotation type: {cfg.ANNOTATION}")
        return
    root.mainloop()


def main(argv=None):
    args = parse_args(argv)
    np.random.seed(0)  # `main.py:29-31`
    from ..core.jit_cache import enable_persistent_cache
    enable_persistent_cache()  # repeat runs reuse compiled programs
    cfg = load_config_file(args.config)
    if args.action == "train":
        run_train(cfg)
    elif args.action == "evaluate":
        run_evaluate(cfg)
    elif args.action == "generate":
        run_generate(cfg, spatial=args.spatial, writer=args.writer,
                     resume=args.resume,
                     quant=None if args.quant == "none" else args.quant,
                     dp=args.dp)
    else:
        run_annotation(cfg)


if __name__ == "__main__":
    main()
