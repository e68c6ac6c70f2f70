#!/usr/bin/env python3
"""DeepLabV3+ train-step throughput on the real TPU.

Measures steady-state images/sec of the jitted train step at the
reference's production shape (crop 480, batch 8, SGD poly LR — see
`01_hair.../main.py:80-116`) for both the f32 and bf16 (`--dtype`) paths,
using the exact step the trainer builds (`train/deeplab_trainer.py:234-262`).

Env: B (batch, default 8), CROP (default 480), DT (f32|bf16|both), ITERS,
REPEAT (timed windows on the same compiled step; >1 adds median/min/max —
the repeated-capture protocol, same as ``bench.py --repeat``).
Prints one JSON line per dtype.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from gan_segmentation_tpu.models.deeplab import DeepLabV3Plus
from gan_segmentation_tpu.ops.losses import seg_loss_with_aux
from gan_segmentation_tpu.train.deeplab_trainer import make_optimizer

B = int(os.environ.get("B", 8))
CROP = int(os.environ.get("CROP", 480))
ITERS = int(os.environ.get("ITERS", 20))
DT = os.environ.get("DT", "both")


def build(dtype):
    model = DeepLabV3Plus(nclass=2, aux=True, crop_size=CROP, dtype=dtype)
    dummy = jnp.zeros((1, CROP, CROP, 3), jnp.float32)
    variables = jax.jit(lambda x: model.init(jax.random.PRNGKey(0), x, False))(dummy)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = make_optimizer(params, 0.005, 10_000, 2e-4, 0.9)
    opt_state = jax.jit(tx.init)(params)

    def train_step(params, batch_stats, opt_state, images, masks, rng):
        from gan_segmentation_tpu.train.deeplab_trainer import _device_normalize
        images = _device_normalize(images)
        masks = masks.astype(jnp.int32)

        def loss_fn(p):
            outputs, upd = model.apply(
                {"params": p, "batch_stats": batch_stats},
                images.astype(dtype), True, rngs={"dropout": rng},
                mutable=["batch_stats"])
            outputs = [o.astype(jnp.float32) for o in outputs]
            loss = jnp.mean(seg_loss_with_aux(outputs[0], outputs[1], masks,
                                              aux_weight=0.5))
            return loss, upd["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, bs, opt, loss

    step = jax.jit(train_step, donate_argnums=(0, 1, 2))
    return params, batch_stats, opt_state, step


def measure(dtype_name):
    """H2D env var: 'none' (default) reuses device arrays — pure device-step
    rate; 'f32'/'uint8' feed FRESH host arrays each step (the real training
    loop shape: upload rides the ~17 MB/s axon host link, so the feed dtype
    dominates — see `SegmentationTrainer._feed`)."""
    import numpy as np

    h2d = os.environ.get("H2D", "none")
    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    params, bs, opt, step = build(dtype)
    rng = jax.random.PRNGKey(0)
    if h2d == "none":
        img = jax.random.normal(rng, (B, CROP, CROP, 3), jnp.float32)
        msk = jax.random.randint(jax.random.fold_in(rng, 1),
                                 (B, CROP, CROP), 0, 2)
    else:
        rsn = np.random.RandomState(0)
        imgs_np = rsn.randint(0, 256, (B, CROP, CROP, 3), np.uint8)
        msk_np = rsn.randint(0, 2, (B, CROP, CROP)).astype(np.int8)
        if h2d == "f32":
            from gan_segmentation_tpu.data.segmentation import (
                IMAGENET_MEAN, IMAGENET_STD)
            imgs_np = ((imgs_np.astype(np.float32) / 255.0 - IMAGENET_MEAN)
                       / IMAGENET_STD)
            msk_np = msk_np.astype(np.int32)
        img, msk = jnp.asarray(imgs_np), jnp.asarray(msk_np)
    repeat = int(os.environ.get("REPEAT", 1))
    for i in range(2):  # warmup/compile
        params, bs, opt, loss = step(params, bs, opt, img, msk,
                                     jax.random.fold_in(rng, i))
        float(loss)
    rates, final = [], 0.0
    for r in range(max(repeat, 1)):
        losses = []
        t0 = time.perf_counter()
        for i in range(ITERS):
            if h2d != "none":
                # fresh host arrays each step: the upload is part of the loop
                img = jnp.asarray(np.ascontiguousarray(imgs_np))
                msk = jnp.asarray(np.ascontiguousarray(msk_np))
            params, bs, opt, loss = step(params, bs, opt, img, msk,
                                         jax.random.fold_in(rng, 10 + i))
            losses.append(loss)
        # D2H of a data-dependent scalar = the reliable completion barrier
        final = float(losses[-1])
        rates.append(B * ITERS / (time.perf_counter() - t0))
    from bench import median_and_captures
    med, captures = median_and_captures(rates)
    line = {"dtype": dtype_name, "h2d": h2d, "crop": CROP, "batch": B,
            "images_per_sec": round(med, 2),
            "sec_per_step": round(B / med, 4),
            "final_loss": round(final, 4)}
    if captures:
        line["captures"] = captures
    print(json.dumps(line), flush=True)


if __name__ == "__main__":
    for name in (["f32", "bf16"] if DT == "both" else [DT]):
        measure(name)
