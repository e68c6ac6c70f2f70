#!/usr/bin/env python3
"""End-to-end pipeline demo at toy scale (SURVEY §3.1-3.5 in one run):

1. fabricate ~12 'human' annotations from a random generator (the
   annotate-by-fixture stand-in for the tkinter GUI);
2. train the Decoder on them (`main.py train` equivalent);
3. emit a synthetic (image, mask) dataset with the fused z->(image,mask)
   pipeline (`main.py generate` equivalent);
4. train DeepLabV3+ on the synthetic dataset and evaluate mIoU on held-out
   pairs (`deeplab 01 main.py train` / `test` equivalent).

Runs on whatever backend is visible (TPU here, CPU with JAX_PLATFORMS=cpu).
Useful as an executable integration proof and a smoke benchmark:

    python examples/full_pipeline_demo.py [--workdir DIR]
"""

import argparse
import sys
import time
import types
from os.path import dirname, join

sys.path.insert(0, join(dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/ganseg_demo")
    ap.add_argument("--max-res-log2", type=int, default=6)  # 64 px
    ap.add_argument("--n-annotations", type=int, default=12)
    ap.add_argument("--n-generate", type=int, default=96)
    ap.add_argument("--decoder-epochs", type=int, default=10)
    ap.add_argument("--deeplab-epochs", type=int, default=2)
    ap.add_argument("--deeplab-epoch-len", type=int, default=64)
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (ignore any attached TPU)")
    args = ap.parse_args()

    import cv2
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from gan_segmentation_tpu.core.jit_cache import enable_persistent_cache
    enable_persistent_cache()  # repeat demo runs deserialize their compiles
    from pathlib import Path

    from gan_segmentation_tpu.core.config import SolverConfig
    from gan_segmentation_tpu.data.collection import save_annotation_sample
    from gan_segmentation_tpu.train.generator import FusedPipeline, ImageGenerator
    from gan_segmentation_tpu.train.solver import SegSolver

    res = 2 ** args.max_res_log2
    work = Path(args.workdir)
    for sub in ("data", "checkpoints", "dataset/train_generated",
                "dataset/val", "runs"):
        (work / sub).mkdir(parents=True, exist_ok=True)

    print(f"== devices: {jax.devices()}")

    # ---- 1. annotate-by-fixture ------------------------------------------
    t0 = time.time()
    gen = ImageGenerator(gan="bedrooms", gan_dir=str(work), batch_size=8,
                         max_res_log2=args.max_res_log2, dtype="bf16")

    def mask_rule(feats):
        # a rule the decoder can learn: sign of the final feature's chan 0
        return (feats[-1][..., 0] > 0).astype(np.int32)

    made = 0
    for img, feats in gen.get_images(args.n_annotations):
        save_annotation_sample(str(work / "data"), made, img,
                               mask_rule(feats), feats)
        made += 1
    print(f"== wrote {made} annotation triples in {time.time()-t0:.1f}s")

    # ---- 2. decoder training ---------------------------------------------
    t0 = time.time()
    cfg = SolverConfig(max_res_log2=args.max_res_log2)
    cfg.train_epochs = args.decoder_epochs
    solver = SegSolver(args.max_res_log2, str(work / "data"),
                       str(work / "checkpoints"), cfg=cfg, keep_weights=False)
    solver.fit()
    result = dict(solver.evaluate(str(work / "data")))
    print(f"== decoder trained in {time.time()-t0:.1f}s; train-set eval: "
          f"acc={result['accuracy']:.3f} mIoU={result['mean-iou']:.3f}")
    assert result["mean-iou"] > 0.5, "decoder failed to learn the rule"

    # ---- 3. synthetic dataset emission (fused) ---------------------------
    t0 = time.time()
    pipe = FusedPipeline(gen, solver)
    n_train = args.n_generate
    n_val = max(8, n_train // 8)
    for i, (img, mask) in enumerate(pipe.generate_pairs(n_train + n_val)):
        sub = "train_generated" if i < n_train else "val"
        j = i if i < n_train else i - n_train
        cv2.imwrite(str(work / "dataset" / sub / f"img_{j:06d}.jpg"),
                    img[:, :, ::-1])
        cv2.imwrite(str(work / "dataset" / sub / f"mask_{j:06d}.png"), mask)
    dt = time.time() - t0
    print(f"== emitted {n_train + n_val} pairs in {dt:.1f}s "
          f"({(n_train + n_val) / dt:.1f} pairs/s incl. JPEG encode)")

    # ---- 4. DeepLabV3+ on the synthetic data -----------------------------
    t0 = time.time()
    from gan_segmentation_tpu.core.mesh import make_mesh
    from gan_segmentation_tpu.data.augment import (
        CenterCrop, HorizontalFlip, PadIfNeeded, RandomCrop, RGBSegmentationAug,
    )
    from gan_segmentation_tpu.data.segmentation import (
        FFHQHairSegmentation, imagenet_transform,
    )
    from gan_segmentation_tpu.models.deeplab import DeepLabV3Plus
    from gan_segmentation_tpu.train.deeplab_trainer import SegmentationTrainer

    crop = res
    mesh = make_mesh()
    targs = types.SimpleNamespace(
        batch_size=8, test_batch_size=8, workers=0, weights=None,
        start_epoch=0, logs_path=None,
        checkpoints_path=work / "runs" / "checkpoints", mesh=mesh, seed=0)
    model = DeepLabV3Plus(nclass=2, aux=True, crop_size=crop)
    model_cfg = {"num_classes": 2, "crop_size": crop, "base_size": res,
                 "aux": True, "aux_weight": 0.5}
    aug = RGBSegmentationAug([HorizontalFlip(), PadIfNeeded(crop, crop),
                              RandomCrop(crop, crop)], ignore_class=-1)
    vaug = RGBSegmentationAug([PadIfNeeded(crop, crop),
                               CenterCrop(crop, crop)], ignore_class=-1)
    trainset = FFHQHairSegmentation(
        str(work / "dataset"), split="train", subdir="train_generated",
        train_epoch_len=args.deeplab_epoch_len, transform=imagenet_transform,
        augmentator=aug, rng_seed=0)
    valset = FFHQHairSegmentation(str(work / "dataset"), split="val",
                                  transform=imagenet_transform,
                                  augmentator=vaug)
    trainer = SegmentationTrainer(
        targs, model, model_cfg, trainset, valset,
        {"mode": "poly", "baselr": 0.005,
         "nepochs": args.deeplab_epochs, "wd": 2e-4, "momentum": 0.9},
        image_dump_interval=0, mesh=mesh)
    metrics = {}
    for epoch in range(args.deeplab_epochs):
        trainer.training(epoch)
        metrics = trainer.validation(epoch)
    print(f"== deeplab trained in {time.time()-t0:.1f}s; "
          f"val pixAcc={metrics.get('accuracy', 0):.3f} "
          f"mIoU={metrics.get('mean-iou', 0):.3f}")
    print("== full pipeline OK")


if __name__ == "__main__":
    main()
