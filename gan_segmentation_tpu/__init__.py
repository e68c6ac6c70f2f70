"""gan_segmentation_tpu — a TPU-native (JAX/XLA/Pallas) framework with the
capabilities of the `GAN-segmentation` reference ("Teaching GAN to generate
per-pixel annotation").

Subpackages
-----------
core     mesh/sharding helpers, configs, dtype policy, checkpoint I/O,
         mxnet-``.params`` converter
ops      TPU-native primitives: convs (incl. transposed/depthwise/dilated),
         resizes, norms, weight-scaling, losses, Pallas kernels
models   StyleGAN(v1) generator emitting the feature pyramid, segmentation
         Decoder, ResNet-v1s dilated backbone, DeepLabV3/V3+
data     annotation collection dataset (trimap), RGB segmentation datasets,
         native augmentation pipeline, device prefetch loader
train    SegSolver (decoder train/eval/predict), ImageGenerator + fused
         z->(image, mask) sampler, DeepLab trainer/tester, experiment mgmt
metrics  segmentation metrics (pixAcc/mIoU/precision/recall/dice/AUC/AP)
apps     CLI entry points mirroring the reference (`main.py`, deeplab
         experiments, optional tkinter annotator)

Everything model-facing uses NHWC layout and a functional, jit-first style;
data parallelism is expressed with `jax.sharding.Mesh` + `NamedSharding`
so XLA inserts ICI collectives (the TPU-native equivalent of the reference's
NCCL KVStore + SyncBatchNorm).
"""

__version__ = "0.1.0"
