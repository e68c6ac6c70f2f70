"""Preemption-safe training: SIGTERM -> step-granular resume bundle ->
bit-identical continuation.

TPU extension beyond the reference's fail-stop + epoch-level ``--weights``
resume (`/root/reference/deeplabv3plus/lib/core/segmentation.py:55-59,153`):
`SegmentationTrainer.install_preemption_handler` turns the SIGTERM a TPU VM
receives ahead of a preemption into a clean stop that persists the FULL
training state (params, BN stats, optimizer state, step counter, PRNG) plus
the (epoch, iter) position; `try_resume` continues from there. Because the
epoch data order is a pure function of the epoch seed and the restored PRNG
already accounts for the completed steps, the resumed run must compute the
SAME final weights as an uninterrupted one — asserted here to float
tolerance.
"""
import os
import signal
import types

import numpy as np
import pytest

from test_deeplab import make_rgb_dataset

pytestmark = pytest.mark.slow

CROP = 32
N_IMAGES = 24  # batch 8 on the 8-device mesh -> 3 iters/epoch
EPOCHS = 2


def _make_trainer(data_dir, ckpt_dir):
    from gan_segmentation_tpu.core.mesh import make_mesh
    from gan_segmentation_tpu.data.augment import (
        CenterCrop, PadIfNeeded, RGBSegmentationAug)
    from gan_segmentation_tpu.data.segmentation import (
        FFHQHairSegmentation, imagenet_transform)
    from gan_segmentation_tpu.models.deeplab import DeepLabV3Plus
    from gan_segmentation_tpu.train.deeplab_trainer import SegmentationTrainer

    mesh = make_mesh()
    args = types.SimpleNamespace(
        batch_size=8, test_batch_size=8, workers=0, weights=None,
        start_epoch=0, logs_path=None, checkpoints_path=str(ckpt_dir),
        mesh=mesh, seed=0, vizualization=False)
    model = DeepLabV3Plus(nclass=2, aux=True, crop_size=CROP)
    model_cfg = {"num_classes": 2, "crop_size": CROP, "base_size": 48,
                 "aux": True, "aux_weight": 0.5}
    # deterministic pipeline: item i is a pure function of i, so the
    # resumed run's fast-forwarded loader reproduces the same stream
    aug = RGBSegmentationAug([PadIfNeeded(CROP, CROP),
                              CenterCrop(CROP, CROP)], ignore_class=-1)
    trainset = FFHQHairSegmentation(str(data_dir), split="train",
                                    subdir="train_generated",
                                    train_epoch_len=-1, scale_factor=1.0,
                                    transform=imagenet_transform,
                                    augmentator=aug)
    valset = FFHQHairSegmentation(str(data_dir), split="val",
                                  scale_factor=1.0,
                                  transform=imagenet_transform,
                                  augmentator=aug)
    return SegmentationTrainer(
        args, model, model_cfg, trainset, valset,
        {"mode": "poly", "baselr": 0.005, "nepochs": EPOCHS, "wd": 2e-4,
         "momentum": 0.9}, image_dump_interval=0, mesh=mesh)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("preempt_data")
    make_rgb_dataset(root, "train_generated", N_IMAGES, size=CROP)
    make_rgb_dataset(root, "val", 8, size=CROP)
    return root


def _params_flat(trainer):
    import jax
    return [np.asarray(x) for x in
            jax.tree_util.tree_leaves(jax.device_get(trainer.state.params))]


def test_preempt_mid_epoch_then_resume_matches_uninterrupted(
        data_dir, tmp_path):
    # --- run A: uninterrupted --------------------------------------------
    a = _make_trainer(data_dir, tmp_path / "a")
    for epoch in range(EPOCHS):
        a.training(epoch)
    ref = _params_flat(a)
    ref_step = int(np.asarray(a.state.step))
    assert ref_step == EPOCHS * a.iters_per_epoch

    # --- run B: preempted during epoch 1, after 1 completed step ---------
    ckpt = tmp_path / "b"
    b = _make_trainer(data_dir, ckpt)
    b.training(0)
    orig_step = b._train_step
    done = []

    def stepping(*args, **kwargs):
        out = orig_step(*args, **kwargs)
        done.append(1)
        if len(done) == 1:  # flag AFTER step 0 of epoch 1 completes,
            b._stop_requested = True  # exactly like the SIGTERM handler
        return out

    b._train_step = stepping
    b.training(1)
    assert b.preempted
    assert (ckpt / "resume_bundle.msgpack").is_file()
    assert (ckpt / "last_checkpoint.params").is_file()
    assert int(np.asarray(b.state.step)) == b.iters_per_epoch + 1

    # --- run B': fresh process stand-in; restore + fast-forward ----------
    c = _make_trainer(data_dir, ckpt)
    pos = c.try_resume()
    assert pos == (1, 1)
    assert int(np.asarray(c.state.step)) == c.iters_per_epoch + 1
    epoch, start_iter = pos
    for e in range(epoch, EPOCHS):
        c.training(e, start_iter=start_iter if e == epoch else 0)
        assert not c.preempted
    c.clear_resume_bundle()
    assert not (ckpt / "resume_bundle.msgpack").is_file()

    got = _params_flat(c)
    assert int(np.asarray(c.state.step)) == ref_step
    for x, y in zip(ref, got):
        np.testing.assert_allclose(x, y, rtol=1e-6, atol=1e-7)


def test_sigterm_sets_stop_flag(data_dir, tmp_path):
    """The installed handler turns a REAL SIGTERM into a stop request."""
    t = _make_trainer(data_dir, tmp_path / "sig")
    prev = signal.getsignal(signal.SIGTERM)
    try:
        t.install_preemption_handler()
        os.kill(os.getpid(), signal.SIGTERM)
        assert t._stop_requested
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_resume_bundle_roundtrips_optimizer_state(data_dir, tmp_path):
    """The bundle carries optimizer state (momentum buffers), not just
    weights: a resumed trainer's opt_state equals the saved one leaf-for-
    leaf, including the multi_transform head/backbone split."""
    import jax

    t = _make_trainer(data_dir, tmp_path / "rt")
    t.training(0)
    t.save_resume_bundle(1, 0)
    saved = [np.asarray(x) for x in
             jax.tree_util.tree_leaves(jax.device_get(t.state.opt_state))]

    u = _make_trainer(data_dir, tmp_path / "rt")
    assert u.try_resume() == (1, 0)
    got = [np.asarray(x) for x in
           jax.tree_util.tree_leaves(jax.device_get(u.state.opt_state))]
    assert len(saved) == len(got)
    for x, y in zip(saved, got):
        np.testing.assert_array_equal(x, y)
