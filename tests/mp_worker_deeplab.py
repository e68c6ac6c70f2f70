"""Worker for the two-process DeepLab trainer test: SegmentationTrainer
multi-host path (per-process batch_iter shards -> global arrays, SPMD train
step, process-sharded validation with cross-process metric all-reduce,
primary-only checkpoints/TB).

Usage: python mp_worker_deeplab.py <port> <process_id> <data_dir> <out_dir>
"""
import json
import os
import sys
import types

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
from gan_segmentation_tpu.core.jit_cache import enable_persistent_cache
enable_persistent_cache()  # share the suite's on-disk compile cache


def main():
    port, pid, data_dir, out_dir = sys.argv[1:5]
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from gan_segmentation_tpu.core.distributed import initialize, is_primary

    assert initialize(f"localhost:{port}", num_processes=2,
                      process_id=int(pid))
    assert jax.device_count() == 8 and jax.local_device_count() == 4

    from gan_segmentation_tpu.core.mesh import make_mesh
    from gan_segmentation_tpu.data.augment import (
        CenterCrop, PadIfNeeded, RGBSegmentationAug, RandomCrop)
    from gan_segmentation_tpu.data.segmentation import (
        FFHQHairSegmentation, imagenet_transform)
    from gan_segmentation_tpu.models.deeplab import DeepLabV3Plus
    from gan_segmentation_tpu.train.deeplab_trainer import SegmentationTrainer

    # multi-host shard_batch on a 2-D (data, space) mesh: each process's
    # local batch lands on its data row (replicated over space), round-trips
    # through local_shard, and a jitted global reduction sees both hosts
    import jax.numpy as jnp
    import numpy as np

    from gan_segmentation_tpu.core.distributed import local_shard
    from gan_segmentation_tpu.core.mesh import make_mesh_2d, shard_batch

    mesh2 = make_mesh_2d(2, 4)
    x2 = (np.arange(4 * 3, dtype=np.float32).reshape(4, 3)
          + 1000.0 * int(pid))
    g2 = shard_batch(mesh2, x2)
    assert g2.shape == (8, 3), g2.shape
    np.testing.assert_array_equal(local_shard(g2), x2)
    total = float(jax.jit(jnp.sum)(g2))
    assert total == 66.0 + 66.0 + 1000.0 * 12, total

    mesh = make_mesh()
    crop = 32
    args = types.SimpleNamespace(
        batch_size=8, test_batch_size=8, workers=0, weights=None,
        start_epoch=0, logs_path=None,
        checkpoints_path=os.path.join(out_dir, "ckpt"),
        mesh=mesh, seed=0, vizualization=False)
    model = DeepLabV3Plus(nclass=2, aux=True, crop_size=crop)
    model_cfg = {"num_classes": 2, "crop_size": crop, "base_size": 48,
                 "aux": True, "aux_weight": 0.5}
    # deterministic pipeline: item i must be a pure function of i so the
    # two-process loaders reproduce the single-process stream exactly
    # (RandomCrop + replacement draws use STATEFUL per-dataset rngs)
    aug = RGBSegmentationAug([PadIfNeeded(crop, crop),
                              CenterCrop(crop, crop)], ignore_class=-1)
    vaug = RGBSegmentationAug([PadIfNeeded(crop, crop),
                               CenterCrop(crop, crop)], ignore_class=-1)
    trainset = FFHQHairSegmentation(data_dir, split="train",
                                    subdir="train_generated",
                                    train_epoch_len=-1, scale_factor=1.0,
                                    transform=imagenet_transform,
                                    augmentator=aug)
    valset = FFHQHairSegmentation(data_dir, split="val", scale_factor=1.0,
                                  transform=imagenet_transform,
                                  augmentator=vaug)
    trainer = SegmentationTrainer(
        args, model, model_cfg, trainset, valset,
        {"mode": "poly", "baselr": 0.005, "nepochs": 1, "wd": 2e-4,
         "momentum": 0.9},
        image_dump_interval=1, mesh=mesh)

    # primary-only TensorBoard: the image-dump path must pull the LOCAL
    # shard of the batch-sharded pred (np.asarray on the global array would
    # raise "spans non-addressable devices")
    class _FakeSW:
        def __init__(self):
            self.images = 0

        def add_scalar(self, *a, **k):
            pass

        def add_scalars(self, *a, **k):
            pass

        def add_image(self, *a, **k):
            self.images += 1

    sw = _FakeSW()
    if is_primary():
        trainer.sw = sw
    loss = trainer.training(0)
    if is_primary():
        assert sw.images > 0, "image dump never ran on the primary"
    metrics = trainer.validation(0)
    # exact full-coverage check: total_label counts valid pixels of the
    # WHOLE val set (a pure function of the masks — the ragged tail the
    # sharded loop drops must be scored via the padded tail batch)
    total_label = int(np.sum(np.asarray(trainer.metric.total_label)))

    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("done")
    if is_primary():
        with open(os.path.join(out_dir, "result.json"), "w") as fp:
            json.dump({"loss": loss, "metrics": metrics,
                       "total_label": total_label}, fp)
    multihost_utils.sync_global_devices("dumped")

    # --- preemption agreement: only process 1 "receives" SIGTERM. The stop
    # must propagate through the cross-process OR (core.distributed.any_flag
    # at the log_interval cadence) so BOTH processes stop at the same step
    # boundary — a unilateral stop would strand the other process in the
    # next step's gradient all-reduce (train/deeplab_trainer.py::training).
    if int(pid) == 1:
        trainer._stop_requested = True
    trainer.training(0, log_interval=2)
    assert trainer.preempted, "agreed stop did not propagate to this process"
    multihost_utils.sync_global_devices("preempted")
    bundle = os.path.join(out_dir, "ckpt", "resume_bundle.msgpack")
    assert os.path.isfile(bundle), bundle  # written by the primary
    from flax import serialization
    with open(bundle, "rb") as fp:
        d = serialization.msgpack_restore(fp.read())
    assert (int(d["epoch"]), int(d["next_iter"])) == (0, 0), d
    # both processes resume from the agreed boundary and run to completion
    trainer._stop_requested = trainer._stop_agreed = False
    trainer.preempted = False
    pos = trainer.try_resume()
    assert pos == (0, 0), pos
    trainer.training(0, start_iter=pos[1])
    assert not trainer.preempted
    multihost_utils.sync_global_devices("resumed")
    if is_primary():
        trainer.clear_resume_bundle()

    jax.distributed.shutdown()
    print(f"deeplab worker {pid} OK", flush=True)


if __name__ == "__main__":
    main()
