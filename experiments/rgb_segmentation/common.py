"""Shared train/test driver for the hair DeepLabV3+ experiments.

Mirrors the reference experiment scripts
(`deeplabv3plus/experiments/rgb_segmentation/{00,01}*/main.py`): model cfg
(nclass 2, crop 480, base 512, syncbn, aux w=0.5, ImageNet norm), the
albumentations-equivalent pipelines, SGD poly schedules, and the
binary-threshold test protocol. The two experiments differ only in their
training subdir, rotation limit, LR, weight decay, and test threshold
(`01:80-116,130-139` vs `00`).
"""

import dataclasses

from gan_segmentation_tpu.data.augment import (
    CenterCrop, HorizontalFlip, PadIfNeeded, RandomCrop, RGBSegmentationAug,
    ShiftScaleRotate,
)
from gan_segmentation_tpu.data.segmentation import (
    FFHQHairSegmentation, imagenet_transform,
)
from gan_segmentation_tpu.models.deeplab import DeepLabV3Plus
from gan_segmentation_tpu.train.deeplab_trainer import (
    SegmentationTester, SegmentationTrainer,
)
from gan_segmentation_tpu.utils.log import logger


@dataclasses.dataclass
class ExpSpec:
    train_subdir: str        # 'train_generated' (01) vs 'train_real' (00)
    rotate_limit: float      # 15 (01) vs 0 (00)
    lr: float                # 0.005 (01) vs 0.01 (00)
    weight_decay: float      # 2e-4 (01) vs 1e-4 (00)
    test_threshold: float    # 1e-15 (01) vs 0.5 (00)
    num_epochs: int = 20
    crop_size: int = 480
    base_size: int = 512
    train_epoch_len: int = 10000
    scale_factor: float = 0.5


def init_model(spec: ExpSpec):
    model_cfg = {
        "num_classes": 2,
        "crop_size": spec.crop_size,
        "base_size": spec.base_size,
        "syncbn": True,
        "aux": True,
        "aux_weight": 0.5,
    }
    model = DeepLabV3Plus(nclass=2, backbone="resnet50", aux=True,
                          crop_size=spec.crop_size)
    return model, model_cfg


def train(args, spec: ExpSpec):
    logger.info("start training..")
    model, model_cfg = init_model(spec)
    crop_size = spec.crop_size

    train_augmentator = RGBSegmentationAug([
        HorizontalFlip(),
        ShiftScaleRotate(scale_limit=(-0.25, 0.25),
                         rotate_limit=spec.rotate_limit, p=1),
        PadIfNeeded(min_height=crop_size, min_width=crop_size),
        RandomCrop(crop_size, crop_size),
    ], ignore_class=-1)
    val_augmentator = RGBSegmentationAug([
        PadIfNeeded(min_height=crop_size, min_width=crop_size),
        CenterCrop(crop_size, crop_size),
    ], ignore_class=-1)

    # transform=None feeds raw uint8; the trainer normalizes ON DEVICE
    # (`deeplab_trainer._device_normalize`) — 4x less host-link traffic per
    # step than uploading normalized f32 (same numbers either way)
    native_reader = getattr(args, "reader", "cv2") == "native"
    trainset = FFHQHairSegmentation(
        args.input_path, scale_factor=spec.scale_factor,
        train_epoch_len=spec.train_epoch_len, split="train",
        subdir=spec.train_subdir, transform=None,
        augmentator=train_augmentator, native_reader=native_reader)
    valset = FFHQHairSegmentation(
        args.input_path, scale_factor=spec.scale_factor, split="val",
        transform=None, augmentator=val_augmentator,
        native_reader=native_reader)

    optimizer_params = {"mode": "poly", "baselr": spec.lr,
                        "nepochs": spec.num_epochs,
                        "wd": spec.weight_decay, "momentum": 0.9}
    trainer = SegmentationTrainer(args, model, model_cfg, trainset, valset,
                                  optimizer_params, image_dump_interval=50,
                                  mesh=args.mesh)
    # preemption safety (TPU extension): SIGTERM -> step-granular resume
    # bundle; a restart in the same run dir picks up mid-epoch, bit-exact
    start_epoch, start_iter = args.start_epoch, 0
    if getattr(args, "auto_resume", True):
        pos = trainer.try_resume()
        if pos is not None:
            start_epoch, start_iter = pos
    if getattr(args, "preempt_save", True):
        trainer.install_preemption_handler()
    logger.info("Starting Epoch: %d", start_epoch)
    logger.info("Total Epochs: %d", spec.num_epochs)
    for epoch in range(start_epoch, spec.num_epochs):
        trainer.training(epoch,
                         start_iter=start_iter if epoch == start_epoch else 0)
        if trainer.preempted:
            logger.info("training preempted; continue with "
                        "`train --resume %s` (same flags) to pick up "
                        "mid-epoch from the saved bundle", args.run_path)
            return
        trainer.validation(epoch)
        # the epoch completed and its checkpoint is newer than any bundle a
        # PREVIOUS preemption left: clear it now, not only at run end —
        # otherwise a later non-SIGTERM crash (OOM, hard kill) would make
        # the next --resume silently roll back to the stale bundle
        trainer.clear_resume_bundle()


def test(args, spec: ExpSpec):
    model, model_cfg = init_model(spec)
    tester = SegmentationTester(model, args,
                                num_classes=model_cfg["num_classes"],
                                use_flip=True, scales=[1.0],
                                threshold=spec.test_threshold,
                                base_size=spec.base_size,
                                crop_size=spec.crop_size)
    testset = FFHQHairSegmentation(
        args.input_path, scale_factor=spec.scale_factor, split="val",
        transform=imagenet_transform, augmentator=None,
        return_path=args.vizualization,
        native_reader=getattr(args, "reader", "cv2") == "native")
    if args.vizualization:
        tester.vizualizate(testset, args.viz_path, suffix="_rgb", save_gt=True)
    else:
        tester.test(testset)


def add_exp_args(parser):
    parser.add_argument("--input-path", type=str, help="Path to dataset",
                        default="../../../experiments/ffhq-hair/dataset")
    # smoke-scale overrides (not in the reference CLI): shrink the schedule
    # for quick end-to-end validation runs
    parser.add_argument("--backbone-weights", type=str, default=None,
                        help="gluoncv resnet50_v1s .params file (ImageNet "
                             "pretrained backbone, converted on load)")
    parser.add_argument("--reader", choices=["cv2", "native"], default="cv2",
                        help="host decode path: cv2, or the native C++ "
                             "reader with the scale factor fused into the "
                             "JPEG decode (gan_segmentation_tpu.native)")
    parser.add_argument("--no-auto-resume", dest="auto_resume",
                        action="store_false", default=True,
                        help="ignore a mid-epoch resume bundle left by a "
                             "preempted run")
    parser.add_argument("--no-preempt-save", dest="preempt_save",
                        action="store_false", default=True,
                        help="do not install the SIGTERM checkpoint-and-"
                             "stop handler")
    parser.add_argument("--crop-size", type=int, default=None)
    parser.add_argument("--base-size", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--epoch-len", type=int, default=None)
    parser.add_argument("--scale-factor", type=float, default=None)
    return parser


def apply_overrides(spec: ExpSpec, args) -> ExpSpec:
    updates = {}
    if getattr(args, "crop_size", None):
        updates["crop_size"] = args.crop_size
    if getattr(args, "base_size", None):
        updates["base_size"] = args.base_size
    if getattr(args, "epochs", None):
        updates["num_epochs"] = args.epochs
    if getattr(args, "epoch_len", None):
        updates["train_epoch_len"] = args.epoch_len
    if getattr(args, "scale_factor", None):
        updates["scale_factor"] = args.scale_factor
    return dataclasses.replace(spec, **updates) if updates else spec


def run(spec: ExpSpec, run_file: str):
    from gan_segmentation_tpu.train.experiments import init_exp

    args = init_exp(run_file, add_exp_args)
    spec = apply_overrides(spec, args)
    if args.mode == "train":
        train(args, spec)
    else:
        test(args, spec)
