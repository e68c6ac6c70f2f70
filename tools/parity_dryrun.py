#!/usr/bin/env python3
"""Parity-recipe dry run: validate every stage of the real-weights
measurement path on synthetic weights (README "Measuring mIoU parity").

The day real artifacts are mounted, the same plumbing runs unchanged:

  stage 1: stylegan-<gan>.params (mxnet binary) -> converter -> generator
  stage 2: annotations -> SegSolver.fit -> checkpoint_last.params
  stage 3: fused generate -> dataset/train_generated/{img,mask}_%06d
  stage 4: DeepLabV3+ train on the synthetic dataset
  stage 5: SegmentationTester multi-scale+flip eval -> accuracy / mean-iou
  stage 6: a reference-trained DeepLab mxnet checkpoint loads via the
           auto-converter (the migration path for existing runs)

Here every stage runs at toy scale (res 32) with fabricated files, so a
single command proves the plumbing end to end:

    python tools/parity_dryrun.py [--workdir DIR]
"""

import argparse
import os
import sys
import types
from os.path import dirname, join
from pathlib import Path

_ROOT = dirname(dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, join(_ROOT, "tests"))  # reuse the synthetic-file fixtures

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/ganseg_parity_dryrun")
    ap.add_argument("--max-res-log2", type=int, default=5)
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from gan_segmentation_tpu.core.config import GanConfig, SolverConfig
    from gan_segmentation_tpu.data.collection import save_annotation_sample
    from gan_segmentation_tpu.train.generator import (
        FusedPipeline, ImageGenerator)
    from gan_segmentation_tpu.train.solver import SegSolver

    from test_mx_params import make_reference_named_params, write_mx_file

    mrl = args.max_res_log2
    res = 2 ** mrl
    work = Path(args.workdir)
    for sub in ("gan_dir", "data", "checkpoints",
                "dataset/train_generated", "dataset/val"):
        (work / sub).mkdir(parents=True, exist_ok=True)

    # ---- stage 1: mxnet stylegan file -> converter -> generator ----------
    gcfg = GanConfig(max_res_log2=mrl)
    named = make_reference_named_params(gcfg, seed=0)
    write_mx_file(work / "gan_dir" / "stylegan-ffhq.params",
                  list(named.values()), list(named.keys()))
    gen = ImageGenerator(gan="ffhq", gan_dir=str(work / "gan_dir"),
                         batch_size=8, max_res_log2=mrl)
    imgs, feats, _ = gen.sample_batch(8)
    assert np.asarray(imgs).shape == (8, res, res, 3)
    print(f"[1/6] stylegan mx file converted + forward OK ({res}px)")

    # ---- stage 2: annotate-by-fixture -> decoder training ---------------
    feats_np = [np.asarray(f) for f in feats]
    for i in range(8):
        trimap = (feats_np[-1][i, ..., 0] > 0).astype(np.int32)
        trimap[:2] = -1
        save_annotation_sample(str(work / "data"), i, np.asarray(imgs)[i],
                               trimap, [f[i] for f in feats_np])
    scfg = SolverConfig(max_res_log2=mrl)
    scfg.train_epochs = 8
    solver = SegSolver(mrl, str(work / "data"), str(work / "checkpoints"),
                       cfg=scfg, keep_weights=True)
    solver.fit()
    assert solver.is_trained
    print("[2/6] decoder trained on fixture annotations, checkpoint saved")

    # ---- stage 3: fused generate -> dataset ------------------------------
    pipe = FusedPipeline(gen, solver)
    n_gen = 32
    for i, (img, mask) in enumerate(pipe.generate_pairs(n_gen)):
        d = work / "dataset" / ("train_generated" if i >= 4 else "val")
        cv2.imwrite(str(d / f"img_{i:06d}.jpg"), img[:, :, ::-1])
        cv2.imwrite(str(d / f"mask_{i:06d}.png"), mask)
    print(f"[3/6] fused generate emitted {n_gen} (image, mask) pairs")

    # ---- stage 4: DeepLabV3+ train on the synthetic dataset --------------
    from gan_segmentation_tpu.core.mesh import make_mesh
    from gan_segmentation_tpu.data.augment import (
        CenterCrop, PadIfNeeded, RGBSegmentationAug, RandomCrop)
    from gan_segmentation_tpu.data.segmentation import (
        FFHQHairSegmentation, imagenet_transform)
    from gan_segmentation_tpu.models.deeplab import DeepLabV3Plus
    from gan_segmentation_tpu.train.deeplab_trainer import (
        SegmentationTester, SegmentationTrainer)

    crop = res
    mesh = make_mesh()
    targs = types.SimpleNamespace(
        batch_size=4, test_batch_size=4, workers=0, weights=None,
        start_epoch=0, logs_path=None,
        checkpoints_path=work / "runs" / "checkpoints", mesh=mesh, seed=0,
        dtype="float32")
    model = DeepLabV3Plus(nclass=2, aux=True, crop_size=crop)
    model_cfg = {"num_classes": 2, "crop_size": crop, "base_size": res,
                 "aux": True, "aux_weight": 0.5}
    aug = RGBSegmentationAug([PadIfNeeded(crop, crop),
                              RandomCrop(crop, crop)], ignore_class=-1)
    vaug = RGBSegmentationAug([PadIfNeeded(crop, crop),
                               CenterCrop(crop, crop)], ignore_class=-1)
    trainset = FFHQHairSegmentation(str(work / "dataset"), split="train",
                                    subdir="train_generated",
                                    train_epoch_len=16, scale_factor=1.0,
                                    transform=imagenet_transform,
                                    augmentator=aug, rng_seed=0)
    valset = FFHQHairSegmentation(str(work / "dataset"), split="val",
                                  scale_factor=1.0,
                                  transform=imagenet_transform,
                                  augmentator=vaug)
    trainer = SegmentationTrainer(
        targs, model, model_cfg, trainset, valset,
        {"mode": "poly", "baselr": 0.005, "nepochs": 1, "wd": 2e-4,
         "momentum": 0.9}, image_dump_interval=0, mesh=mesh)
    trainer.training(0)
    trainer.validation(0)
    ckpt = targs.checkpoints_path / "last_checkpoint.params"
    assert ckpt.exists()
    print("[4/6] DeepLabV3+ trained 1 epoch on the synthetic dataset")

    # ---- stage 5: tester (the parity measurement itself) ------------------
    targs.weights = str(ckpt)
    tester = SegmentationTester(model, targs, num_classes=2, use_flip=True,
                                scales=[1.0], threshold=1e-15,
                                base_size=res, crop_size=crop)
    testset = FFHQHairSegmentation(str(work / "dataset"), split="val",
                                   scale_factor=1.0,
                                   transform=imagenet_transform,
                                   augmentator=None)
    result = tester.test(testset)
    assert "accuracy" in result and "mean-iou" in result
    print(f"[5/6] tester metrics: accuracy={result['accuracy']:.3f} "
          f"mean-iou={result['mean-iou']:.3f}  <- the parity numbers")

    # ---- stage 6: reference-trained DeepLab mxnet checkpoint migrates ----
    from test_deeplab_convert import synth_reference_deeplab

    tiny = DeepLabV3Plus(nclass=2, aux=True, crop_size=32)
    v = jax.jit(lambda x: tiny.init(jax.random.PRNGKey(0), x, False))(
        jnp.zeros((1, 32, 32, 3)))
    mx = synth_reference_deeplab(v["params"], v["batch_stats"])
    ref_ckpt = work / "runs" / "reference_last_checkpoint.params"
    write_mx_file(ref_ckpt, list(mx.values()), list(mx.keys()))
    targs.weights = str(ref_ckpt)
    SegmentationTester(tiny, targs, num_classes=2, use_flip=False,
                       scales=[1.0], base_size=32, crop_size=32)
    print("[6/6] reference mxnet DeepLab checkpoint auto-converted on load")
    print("parity dry run: ALL STAGES OK")


if __name__ == "__main__":
    main()
