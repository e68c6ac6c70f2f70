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
