"""Serving export — freeze inference programs into portable StableHLO
artifacts (`jax.export`).

The reference's only deployment artifact is a raw mxnet parameter file that
requires the full model code (and framework) to serve
(`image_generator.py:20-22`, `lib/utils/utils.py:5-16`). A production TPU
deployment wants a hermetic unit instead: ONE file holding the compiled
program *and* the weights (baked in as module constants), loadable in a
serving process with no model code, no flax, no checkpoint plumbing:

    from gan_segmentation_tpu.core.export import load_artifact
    serve = load_artifact("generate.stablehlo")
    images, masks = serve(z, noise_key_data)        # runs under jit

Artifacts are StableHLO + calling-convention metadata (the `jax.export`
serialization format), so they are forward-compatible across jax releases
per its compatibility guarantees and can be lowered for platforms the
exporting host does not have — e.g. export for TPU from a CPU build farm
with ``platforms=("cpu", "tpu")``.

Two first-class surfaces are exported here:
- the fused z -> (uint8 image, uint8 mask) generate pipeline
  (`train/generator.py::FusedPipeline`, SURVEY §3.2), and
- the DeepLab multi-scale + flip evaluation protocol for a fixed input
  shape (`train/deeplab_trainer.py::MultiEvalModel`,
  `lib/core/segmentation.py:207-253`).
"""

import logging
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax import export as jax_export

log = logging.getLogger(__name__)


def _key_data_shape() -> Tuple[int, ...]:
    """Key-data shape of the configured PRNG impl ((2,) for the default
    threefry2x32) — derived, not hard-coded, so a different
    ``jax_default_prng_impl`` still exports a matching signature."""
    return tuple(jax.eval_shape(
        lambda: jax.random.key_data(jax.random.PRNGKey(0))).shape)


def export_callable(fn, example_args: Sequence,
                    platforms: Optional[Sequence[str]] = None):
    """Jit + export ``fn`` for the shapes/dtypes of ``example_args``.

    ``platforms``: lowering targets (e.g. ``("cpu", "tpu")``); defaults to
    the current backend. Weights referenced via closure are embedded in the
    module as constants — the artifact is self-contained.
    """
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jax_export.export(jax.jit(fn), **kwargs)(*example_args)


def save_artifact(path: str, fn, example_args: Sequence,
                  platforms: Optional[Sequence[str]] = None):
    """Export and serialize to ``path``; returns the ``Exported``."""
    exported = export_callable(fn, example_args, platforms)
    data = exported.serialize()
    with open(path, "wb") as fh:
        fh.write(data)
    log.info("serialized %s (%d bytes, platforms=%s, in=%s)", path,
             len(data), exported.platforms, exported.in_avals)
    return exported


def load_artifact(path: str):
    """Deserialize an artifact; returns a callable running under jit."""
    with open(path, "rb") as fh:
        exported = jax_export.deserialize(fh.read())
    return exported.call


def save_bundle(dir_path: str, fn, params, example_args: Sequence,
                platforms: Optional[Sequence[str]] = None,
                params_sharding=None, args_shardings=None,
                meta: Optional[dict] = None):
    """Export ``fn(params, *args)`` as a program+weights BUNDLE directory.

    The hermetic single-file form (`save_artifact`) bakes weights into the
    module as constants — ideal for small heads, but for big models it
    bloats the module (every compile re-uploads ~100s of MB) and couples
    weight updates to re-export. A bundle keeps the weights as *inputs*:

        <dir>/module.stablehlo   the exported program (weights are args)
        <dir>/params.msgpack     flat list of weight arrays (flax msgpack)

    so the module stays KB-scale, compiles exactly like the live jit
    program, and weights can be swapped by rewriting params.msgpack alone.
    Load with :func:`load_bundle`.

    Multi-chip serving: pass ``params_sharding`` (one NamedSharding applied
    to every weight leaf, normally replicated) and ``args_shardings`` (one
    per example arg, e.g. batch over ``data``) to export an SPMD program —
    the artifact records the mesh size and must be served on that many
    devices (`load_bundle(..., params_sharding=...)` places the weights).

    ``meta``: caller-supplied attribution dict, merged over the recorded
    process quant config in ``<dir>/meta.json``. The int8 conv form and
    chunk cap are process-level config frozen at import (ops/quant.py
    `_read_once`) and BAKED into any int8 program traced here — recording
    them makes a bundle's lineage auditable (ADVICE r4). Read back with
    :func:`load_bundle_meta`.
    """
    import json
    import os

    from flax import serialization

    leaves, treedef = jax.tree_util.tree_flatten(params)

    def flat_fn(leaves_list, *args):
        return fn(jax.tree_util.tree_unflatten(treedef, leaves_list), *args)

    jit_kwargs = {}
    if params_sharding is not None or args_shardings is not None:
        if args_shardings is None:
            args_shardings = [None] * len(example_args)
        # pytree-prefix semantics: one sharding covers the whole leaves list
        jit_kwargs["in_shardings"] = (params_sharding, *args_shardings)

    # trace from specs, not the concrete arrays: values belong only in
    # params.msgpack, and concrete arrays would pin the exporting context's
    # device/sharding layout into the module
    leaf_specs = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in leaves]
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    exported = jax_export.export(jax.jit(flat_fn, **jit_kwargs), **kwargs)(
        leaf_specs, *example_args)
    os.makedirs(dir_path, exist_ok=True)
    with open(os.path.join(dir_path, "module.stablehlo"), "wb") as fh:
        fh.write(exported.serialize())
    with open(os.path.join(dir_path, "params.msgpack"), "wb") as fh:
        fh.write(serialization.to_bytes([np.asarray(x) for x in leaves]))
    from ..ops.quant import INT8_CHUNK_MB, INT8_FORM
    record = {"int8_form": INT8_FORM, "int8_chunk_mb": INT8_CHUNK_MB,
              "n_weights": len(leaves),
              "platforms": list(exported.platforms)}
    record.update(meta or {})
    with open(os.path.join(dir_path, "meta.json"), "w") as fh:
        json.dump(record, fh, indent=1)
    log.info("serialized bundle %s (%d weight arrays, platforms=%s)",
             dir_path, len(leaves), exported.platforms)
    return exported


def load_bundle_meta(dir_path: str) -> dict:
    """The attribution record `save_bundle` wrote (empty for bundles from
    before meta.json existed)."""
    import json
    import os

    try:
        with open(os.path.join(dir_path, "meta.json")) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def read_bundle(dir_path: str, params_sharding=None):
    """Deserialize a `save_bundle` directory into ``(exported, leaves)``.

    Lower-level than :func:`load_bundle` for callers that wrap the program
    in their own jit and must keep the weights as *arguments* rather than
    closed-over constants (constants would be baked into the module — the
    exact bloat the bundle form exists to avoid; see bench.py --serving).
    """
    import os

    from flax import serialization

    with open(os.path.join(dir_path, "module.stablehlo"), "rb") as fh:
        exported = jax_export.deserialize(fh.read())
    with open(os.path.join(dir_path, "params.msgpack"), "rb") as fh:
        raw = serialization.msgpack_restore(fh.read())
    # flax msgpack stores a Python list as an index-keyed dict
    leaves = ([raw[k] for k in sorted(raw, key=int)]
              if isinstance(raw, dict) else list(raw))
    # weights resident on device once, not re-uploaded per call
    leaves = [jax.device_put(x, params_sharding) for x in leaves]
    return exported, leaves


def load_bundle(dir_path: str, params_sharding=None):
    """Load a `save_bundle` directory; returns ``callable(*args)`` with the
    weights bound (no model code needed).

    For an SPMD bundle pass ``params_sharding`` (a NamedSharding over a
    mesh of ``Exported.nr_devices`` devices) so the weights land with the
    layout the program was exported for; args must be placed by the caller
    (e.g. `core.mesh.shard_batch`)."""
    exported, leaves = read_bundle(dir_path, params_sharding)
    return lambda *args: exported.call(leaves, *args)


def export_fused_pipeline(pipeline, batch_size: Optional[int] = None,
                          path: Optional[str] = None,
                          platforms: Optional[Sequence[str]] = None):
    """Freeze a trained ``FusedPipeline`` as a serving artifact.

    The exported signature is ``(z (B, latent) f32, key_data (2,) u32) ->
    (images (B, H, W, 3) u8, masks u8)`` — masks come in the pipeline's
    wire format (bit-packed 8 px/byte along W when binary, see
    ``FusedPipeline.generate_batches``). Generator weights and the folded
    decoder parameters are baked in.
    """
    b = batch_size or pipeline.gen.batch_size
    gen_params = pipeline._gen_params
    prepared = pipeline._prepared()
    fused = pipeline._fused

    def serve(z, key_data):
        return fused(gen_params, prepared, z, jax.random.wrap_key_data(key_data))

    z_spec = jax.ShapeDtypeStruct((b, pipeline.gen.cfg.latent_size),
                                  np.float32)
    key_spec = jax.ShapeDtypeStruct(_key_data_shape(), np.uint32)
    if path is None:
        return export_callable(serve, (z_spec, key_spec), platforms)
    return save_artifact(path, serve, (z_spec, key_spec), platforms)


def export_fused_pipeline_bundle(pipeline, batch_size: Optional[int] = None,
                                 dir_path: str = "generate.bundle",
                                 platforms: Optional[Sequence[str]] = None):
    """Bundle form of :func:`export_fused_pipeline` (program + weights dir)
    — the right choice for the full-size generator, whose ~10^8 bytes of
    weights would otherwise ride inside the module as constants.

    If the pipeline carries a mesh (`FusedPipeline(mesh=...)`), the bundle
    is exported as an SPMD program over it: weights replicated, batch
    sharded over ``data`` — one artifact serving a whole slice, with the
    spatial H-shard's halo exchanges compiled in when the mesh has a
    ``space`` axis."""
    b = batch_size or pipeline.gen.batch_size
    prepared = pipeline._prepared()
    fused = pipeline._fused
    weights = {"gen": pipeline._gen_params, "dec": prepared}

    def serve(w, z, key_data):
        return fused(w["gen"], w["dec"], z,
                     jax.random.wrap_key_data(key_data))

    z_spec = jax.ShapeDtypeStruct((b, pipeline.gen.cfg.latent_size),
                                  np.float32)
    key_spec = jax.ShapeDtypeStruct(_key_data_shape(), np.uint32)
    params_sharding = args_shardings = None
    if pipeline.mesh is not None:
        from .mesh import data_sharding, replicated_sharding
        params_sharding = replicated_sharding(pipeline.mesh)
        args_shardings = (data_sharding(pipeline.mesh, 2),
                          replicated_sharding(pipeline.mesh))
    return save_bundle(dir_path, serve, weights, (z_spec, key_spec),
                       platforms, params_sharding=params_sharding,
                       args_shardings=args_shardings)


def export_eval_model(eval_model, batch: int, height: int, width: int,
                      channels: int, path: Optional[str] = None,
                      platforms: Optional[Sequence[str]] = None):
    """Freeze a ``MultiEvalModel`` for one input shape.

    Exported signature: ``images (B, H, W, C) f32 normalized ->
    scores (B, H, W, nclass) f32`` — the full multi-scale + flip
    sliding-window protocol with DeepLab weights baked in.
    """
    run = eval_model._program(batch, height, width, channels)
    params, batch_stats = eval_model.params, eval_model.batch_stats

    def serve(images):
        return run(params, batch_stats, images)

    spec = jax.ShapeDtypeStruct((batch, height, width, channels), np.float32)
    if path is None:
        return export_callable(serve, (spec,), platforms)
    return save_artifact(path, serve, (spec,), platforms)
