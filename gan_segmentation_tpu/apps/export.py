"""Serving-export CLI — freeze trained inference programs into hermetic
StableHLO artifacts (see `core/export.py`).

    # z -> (image, mask) generate pipeline (weights baked in):
    python -m gan_segmentation_tpu.apps.export generate \
        --config config.yml -o generate.stablehlo --batch 8

    # DeepLab multi-scale+flip eval protocol at a fixed input shape
    # (the artifact emits per-class SCORES; thresholding stays in the
    # consumer's label map):
    python -m gan_segmentation_tpu.apps.export deeplab \
        --weights runs/train_x/checkpoints/last_checkpoint.params \
        -o deeplab_eval.stablehlo --shape 1,512,512,3

Pass ``--platforms cpu,tpu`` to produce one artifact loadable on either
backend (cross-platform lowering; no TPU needed at export time).
"""

import argparse
import logging

log = logging.getLogger(__name__)
logging.basicConfig(level=logging.INFO,
                    format="%(levelname)s:%(name)s:%(message)s")


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="what", required=True)

    g = sub.add_parser("generate", help="fused z -> (image, mask) pipeline")
    g.add_argument("--config", default="config.yml")
    g.add_argument("-o", "--output", default="generate.stablehlo")
    g.add_argument("--batch", type=int, default=0,
                   help="serving batch (default: config batch)")
    g.add_argument("--bundle", action="store_true",
                   help="write a program+weights bundle DIRECTORY instead "
                        "of a single hermetic file — the right form for "
                        "full-size generators (weights stay arguments, the "
                        "module stays KB-scale, weights swap without "
                        "re-export)")
    g.add_argument("--platforms", default=None,
                   help="comma-separated lowering targets, e.g. cpu,tpu")

    d = sub.add_parser("deeplab", help="multi-scale+flip eval protocol")
    d.add_argument("--weights", required=True)
    d.add_argument("-o", "--output", default="deeplab_eval.stablehlo")
    d.add_argument("--shape", default="1,512,512,3",
                   help="B,H,W,C of the (normalized f32) serving input")
    d.add_argument("--nclass", type=int, default=2)
    d.add_argument("--backbone", default="resnet50")
    d.add_argument("--crop-size", type=int, default=480)
    d.add_argument("--base-size", type=int, default=512)
    d.add_argument("--no-flip", action="store_true")
    d.add_argument("--scales", default="1.0")
    d.add_argument("--platforms", default=None)
    return parser.parse_args(argv)


def _platforms(arg):
    return tuple(p.strip() for p in arg.split(",")) if arg else None


def export_generate(args):
    from ..core.export import (export_fused_pipeline,
                               export_fused_pipeline_bundle)
    from .main import build_solver
    from ..core.config import load_config_file
    from ..train.generator import FusedPipeline, ImageGenerator

    cfg = load_config_file(args.config)
    solver = build_solver(cfg, keep_weights=False)
    if not solver.is_trained:
        raise SystemExit("train Decoder first!")
    batch = args.batch or (cfg.GAN_BATCH_SIZE_PER_GPU
                           * max(1, len(cfg.GAN_GPU_IDS)))
    netG = ImageGenerator(gan=cfg.GAN, gan_dir=cfg.GAN_DIR, batch_size=batch,
                          max_res_log2=cfg.MAX_RES_LOG2)
    pipeline = FusedPipeline(netG, solver)
    if args.bundle:
        export_fused_pipeline_bundle(pipeline, batch, args.output,
                                     platforms=_platforms(args.platforms))
    else:
        export_fused_pipeline(pipeline, batch, args.output,
                              platforms=_platforms(args.platforms))


def export_deeplab(args):
    import jax
    import jax.numpy as jnp

    from ..core.checkpoint import load_checkpoint
    from ..core.export import export_eval_model
    from ..models.deeplab import DeepLabV3Plus
    from ..train.deeplab_trainer import MultiEvalModel

    b, h, w, c = (int(x) for x in args.shape.split(","))
    model = DeepLabV3Plus(nclass=args.nclass, backbone=args.backbone,
                          aux=True, crop_size=args.crop_size)
    dummy = jnp.zeros((1, args.crop_size, args.crop_size, 3), jnp.float32)
    variables = jax.jit(
        lambda x: model.init(jax.random.PRNGKey(0), x, False))(dummy)
    params, batch_stats = load_checkpoint(
        args.weights, variables["params"], variables.get("batch_stats", {}))
    evaluator = MultiEvalModel(
        model, params, batch_stats, args.nclass, base_size=args.base_size,
        crop_size=args.crop_size, flip=not args.no_flip,
        scales=tuple(float(s) for s in args.scales.split(",")))
    export_eval_model(evaluator, b, h, w, c, args.output,
                      platforms=_platforms(args.platforms))


def main(argv=None):
    args = parse_args(argv)
    if args.what == "generate":
        export_generate(args)
    else:
        export_deeplab(args)


if __name__ == "__main__":
    main()
