"""Spatial (image-height) parallelism over the virtual 8-device mesh.

The reference has no model parallelism (SURVEY §5.7); this validates the
TPU-native extension in `core/mesh.py`: NHWC activations with H sharded
over a ``space`` mesh axis. XLA's SPMD partitioner inserts the conv halo
exchanges, so a spatially-sharded forward must be numerically equal (up to
reassociation) to the unsharded one — including instance-norm (generator)
and running-stat batch-norm (decoder) spatial reductions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_segmentation_tpu.core.config import GanConfig, SolverConfig
from gan_segmentation_tpu.core.mesh import (
    constrain_spatial, make_mesh_2d, replicate, spatial_spec,
)
from gan_segmentation_tpu.models.decoder import decoder_from_config
from gan_segmentation_tpu.models.stylegan import init_generator
from jax.sharding import NamedSharding, PartitionSpec as P

pytestmark = pytest.mark.slow  # training/e2e: minutes on the 1-core host


def build(max_res_log2=5, batch=2, seed=0):
    gcfg = GanConfig(max_res_log2=max_res_log2, fix_noise=True)
    gen, gparams = init_generator(gcfg, seed=seed)
    scfg = SolverConfig(max_res_log2=max_res_log2)
    dec = decoder_from_config(scfg)
    z = jax.random.normal(jax.random.PRNGKey(seed + 1), (batch, 512))
    feats_shape = [jnp.zeros((1, 2 ** (i + 2), 2 ** (i + 2), c), jnp.float32)
                   for i, c in enumerate(scfg.in_channels)]
    dvars = jax.jit(lambda f: dec.init(jax.random.PRNGKey(seed + 2), f, False))(
        feats_shape)

    def fused(gp, dv, z, mesh=None):
        rgb, feats = gen.apply({"params": gp}, z,
                               rngs={"noise": jax.random.PRNGKey(7)})
        if mesh is not None:
            feats = constrain_spatial(feats, mesh)
        logits = dec.apply(dv, feats, False)
        if mesh is not None:
            logits = constrain_spatial(logits, mesh)
        return rgb, logits

    return fused, gparams, dvars, z


@pytest.mark.parametrize("data,space", [(1, 8), (2, 4)])
def test_spatial_forward_matches_unsharded(data, space):
    fused, gp, dv, z = build(batch=2)
    rgb_ref, logits_ref = jax.jit(fused)(gp, dv, z)

    mesh = make_mesh_2d(data, space)
    gp_m = replicate(mesh, gp)
    dv_m = replicate(mesh, dv)
    z_m = jax.device_put(z, NamedSharding(mesh, P()))
    rgb_s, logits_s = jax.jit(
        lambda gp, dv, z: fused(gp, dv, z, mesh=mesh))(gp_m, dv_m, z_m)

    # output really is sharded over (data, space)
    shard_shapes = {s.data.shape for s in logits_s.addressable_shards}
    n, h, w, c = logits_ref.shape
    assert shard_shapes == {(n // data, h // space, w, c)}, shard_shapes

    np.testing.assert_allclose(np.asarray(rgb_s), np.asarray(rgb_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits_s), np.asarray(logits_ref),
                               rtol=2e-4, atol=2e-4)


def test_spatial_spec_shape():
    assert spatial_spec(4) == P("data", "space", None, None)
    assert spatial_spec(2) == P("data", "space")


def test_spatial_train_step_matches_unsharded():
    """Gradients flow through the halo exchanges: one decoder train step
    with H-sharded activations equals the unsharded step."""
    import optax
    from gan_segmentation_tpu.ops.losses import weighted_softmax_ce

    scfg = SolverConfig(max_res_log2=5)
    dec = decoder_from_config(scfg)
    rs = np.random.RandomState(0)
    feats = [jnp.asarray(rs.randn(2, 2 ** (i + 2), 2 ** (i + 2), c)
                         .astype(np.float32))
             for i, c in enumerate(scfg.in_channels)]
    mask = jnp.asarray(rs.randint(-1, 2, (2, 32, 32)).astype(np.int32))
    dvars = jax.jit(lambda f: dec.init(jax.random.PRNGKey(1), f, False))(feats)
    # SGD: post-step params differ from pre-step by exactly lr*grad, so the
    # comparison tests the gradients (incl. halo-exchange transposes)
    # directly; Adam's m/sqrt(v) normalization would amplify ulp-level grad
    # noise on near-zero bias params into sign flips.
    tx = optax.sgd(1e-2)
    opt0 = jax.jit(tx.init)(dvars["params"])

    def step(params, batch_stats, opt, feats, mask, mesh=None):
        if mesh is not None:
            feats = constrain_spatial(feats, mesh)

        def loss_fn(p):
            logits, upd = dec.apply(
                {"params": p, "batch_stats": batch_stats}, feats, True,
                rngs={"dropout": jax.random.PRNGKey(2)},
                mutable=["batch_stats"])
            w = (mask > -1).astype(jnp.float32)
            return jnp.mean(weighted_softmax_ce(logits, mask, w))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), loss

    p_ref, l_ref = jax.jit(step)(dvars["params"], dvars["batch_stats"],
                                 opt0, feats, mask)

    mesh = make_mesh_2d(2, 4)
    p_sp, l_sp = jax.jit(
        lambda p, b, o, f, m: step(p, b, o, f, m, mesh=mesh))(
        replicate(mesh, dvars["params"]), replicate(mesh, dvars["batch_stats"]),
        replicate(mesh, opt0), replicate(mesh, feats),
        jax.device_put(mask, NamedSharding(mesh, P())))

    np.testing.assert_allclose(float(l_sp), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_sp),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
