"""Data-parallel training over the virtual 8-device mesh: gradient all-reduce
and global-batch (sync) BN fall out of jit + NamedSharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from gan_segmentation_tpu.core.config import SolverConfig
from gan_segmentation_tpu.core.mesh import (
    data_sharding, make_mesh, replicate, shard_batch,
)
from gan_segmentation_tpu.models.decoder import decoder_from_config
from gan_segmentation_tpu.ops.losses import weighted_softmax_ce


def tiny_setup(batch):
    cfg = SolverConfig(max_res_log2=4)
    model = decoder_from_config(cfg)
    feats = [jnp.asarray(np.random.RandomState(i).randn(
        batch, 2 ** (i + 2), 2 ** (i + 2), c).astype(np.float32))
        for i, c in enumerate(cfg.in_channels)]
    mask = jnp.asarray(np.random.RandomState(9).randint(
        0, 2, (batch, 16, 16)).astype(np.int32))
    variables = jax.jit(lambda f: model.init(jax.random.PRNGKey(0), f, False))(feats)
    return cfg, model, feats, mask, variables


def make_train_step(model, tx):
    def train_step(params, batch_stats, opt_state, feats, mask, rng):
        def loss_fn(p):
            logits, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, feats, True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            w = (mask > -1).astype(jnp.float32)
            return jnp.mean(weighted_softmax_ce(logits, mask, w)), upd["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), bs, opt_state, loss

    return jax.jit(train_step)


@pytest.mark.slow
def test_eight_way_dp_matches_single_device():
    mesh = make_mesh()
    assert mesh.size == 8
    _, model, feats, mask, variables = tiny_setup(batch=8)
    tx = optax.adam(1e-3)
    step = make_train_step(model, tx)
    rng = jax.random.PRNGKey(42)

    # single-device (fully replicated inputs)
    opt0 = jax.jit(tx.init)(variables["params"])
    p1, bs1, _, loss1 = step(variables["params"], variables["batch_stats"],
                             opt0, feats, mask, rng)

    # 8-way sharded batch, replicated params
    params_r = replicate(mesh, variables["params"])
    bstats_r = replicate(mesh, variables["batch_stats"])
    feats_s = shard_batch(mesh, feats)
    mask_s = shard_batch(mesh, mask)
    opt_r = jax.jit(tx.init)(params_r)
    p2, bs2, _, loss2 = step(params_r, bstats_r, opt_r, feats_s, mask_s, rng)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    # note: post-Adam params can't be compared tightly — Adam normalizes
    # noise-level gradients (g ~ 1e-12, whose sign depends on reduction
    # order) up to full step size. Compare params with step-size atol.
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.5e-3)
    # global-batch BN statistics identical => sync-BN semantics
    for a, b in zip(jax.tree_util.tree_leaves(bs1), jax.tree_util.tree_leaves(bs2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_sharded_output_stays_sharded():
    mesh = make_mesh()
    _, model, feats, mask, variables = tiny_setup(batch=8)
    feats_s = shard_batch(mesh, feats)
    logits = jax.jit(lambda v, f: model.apply(v, f, False))(variables, feats_s)
    # the output should still be sharded across the batch axis
    assert len(logits.sharding.device_set) == 8
