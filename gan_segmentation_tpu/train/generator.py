"""ImageGenerator — batched GAN sampling engine, plus the fused
z -> (image, mask) pipeline.

Re-designs `image_generator.py` for TPU:
- ``get_images(n)`` keeps the reference's generator-of-samples API
  (`image_generator.py:86-123`): yields (uint8 HWC image, [feature arrays]).
  The uint8 conversion (`_transform_gan_back`, `:76-84`) happens **on
  device**; only the features the caller actually needs cross to host.
- ``FusedPipeline`` is the TPU-native redesign of `main.py generate`
  (SURVEY §3.2): ONE jit program runs z -> mapping -> synthesis (feature
  pyramid stays in HBM) -> decoder -> argmax, so only a uint8 image and a
  uint8 mask per sample cross the host boundary — eliminating the
  reference's ~130 MB/sample fp32 feature D2H (`image_generator.py:103-114`).
  Dispatch is asynchronous, so host-side JPEG/PNG encoding of batch i
  overlaps device compute of batch i+1.
"""

import logging
from os.path import isfile, join
from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import GanConfig, gan_config
from ..core.dtypes import default_policy
from ..core.mx_params import load_generator_params
from ..models.stylegan import StyleGanGenerator

log = logging.getLogger(__name__)


def _to_uint8(rgb, imrange=(-1.0, 1.0)):
    """(-1,1) float NHWC -> uint8, on device (`image_generator.py:76-84`)."""
    lo, hi = imrange
    x = (rgb.astype(jnp.float32) - lo) / (hi - lo)
    x = jnp.clip(x, 0.0, 1.0) * 255.0
    return x.astype(jnp.uint8)


def class_mask(logits):
    """argmax over the class axis as uint8. For the binary case a single
    compare replaces the generic argmax lowering (iota + reduce), which the
    profiler showed costing ~20 ms/step at 1024^2."""
    if logits.shape[-1] == 2:
        return (logits[..., 1] > logits[..., 0]).astype(jnp.uint8)
    return jnp.argmax(logits, axis=-1).astype(jnp.uint8)


class ImageGenerator:
    def __init__(self, gan: str = "ffhq", gan_dir: str = "stylegan-models",
                 batch_size: int = 4, dtype: str = "bf16",
                 return_latents: bool = False, seed: int = 0,
                 params=None, max_res_log2: Optional[int] = None):
        if max_res_log2 is not None:
            self.cfg = GanConfig(max_res_log2=max_res_log2, dtype=dtype)
        else:
            self.cfg = gan_config(gan, dtype)
        self.gan = gan
        self.batch_size = batch_size
        self.return_latents = return_latents
        self.policy = default_policy(dtype)
        self.model = StyleGanGenerator(self.cfg, self.policy.compute_dtype)

        if params is not None:
            self.params = params
        else:
            path = join(gan_dir, f"stylegan-{gan}.params")
            if isfile(path):
                log.info("loading generator weights: %s", path)
                self.params = jax.tree_util.tree_map(
                    jnp.asarray, load_generator_params(path, self.cfg))
            else:
                log.warning("generator checkpoint %s not found; using random "
                            "init (init='normal' std=1, "
                            "image_generator.py:62-63)", path)
                from ..models.stylegan import init_generator
                _, self.params = init_generator(
                    self.cfg, seed=seed,
                    compute_dtype=self.policy.compute_dtype)

        self._rng = jax.random.PRNGKey(seed)
        self._fwd = jax.jit(self._forward)

    def _forward(self, params, z, noise_rng):
        rgb, feats = self.model.apply({"params": params}, z,
                                      rngs={"noise": noise_rng})
        return _to_uint8(rgb, self.cfg.imrange), feats

    def _next_rngs(self):
        self._rng, k1, k2 = jax.random.split(self._rng, 3)
        return k1, k2

    def skip_batches(self, k: int):
        """Advance the z/noise stream past k batches WITHOUT generating
        them: the stream is a pure function of the seed, so a restarted
        process can fast-forward to where an interrupted emission stopped
        and produce the exact same remaining samples (resumable
        `main.py generate --resume`; the reference regenerates the whole
        set from scratch, `main.py:75-104`)."""
        for _ in range(k):
            self._rng = jax.random.split(self._rng, 3)[0]

    def sample_batch(self, batch_size: Optional[int] = None):
        """One device-resident batch: (uint8 imgs, features list, z)."""
        b = batch_size or self.batch_size
        zk, nk = self._next_rngs()
        z = jax.random.normal(zk, (b, self.cfg.latent_size), jnp.float32)
        imgs, feats = self._fwd(self.params, z, nk)
        return imgs, feats, z

    def get_images(self, n: int) -> Iterator[Tuple[np.ndarray, List[np.ndarray]]]:
        """Reference-compatible sample iterator (`image_generator.py:86-123`)."""
        produced = 0
        while produced < n:
            b = min(self.batch_size, n - produced)
            imgs, feats, z = self.sample_batch(self.batch_size)
            imgs_np = np.asarray(imgs)[:b]
            feats_np = [np.asarray(f)[:b] for f in feats]
            z_np = np.asarray(z)[:b]
            for i in range(b):
                sample_feats = [f[i] for f in feats_np]
                if self.return_latents:
                    yield imgs_np[i], sample_feats, z_np
                else:
                    yield imgs_np[i], sample_feats
            produced += b


class FusedPipeline:
    """z -> (image uint8, mask uint8) in one jit program (SURVEY §3.2).

    ``mesh``: optional 2-D ``(data, space)`` mesh (`core.mesh.make_mesh_2d`)
    for spatial parallelism — the TPU-native extension the reference can't
    express (SURVEY §5.7): each image's feature pyramid and decoder
    activations are H-sharded over the ``space`` axis so one sample spans
    several chips, with XLA inserting the conv halo exchanges. Use when a
    single image's working set exceeds one chip's HBM (larger-than-1024²
    synthesis) or to cut per-sample latency; for throughput, pure data
    parallelism (the default 1-D mesh) is optimal.

    ``quant="int8"``: decoder tail runs post-training int8 (`ops/quant.py`,
    s8xs8->s32 on the MXU at 2x the bf16 rate nominal); activation scales
    self-calibrate on two FIXED-key generator batches at prepare time, so
    the emission z stream — and with it `generate --resume`'s byte-
    identity — is untouched. Masks agree with bf16 on ~99%+ of pixels;
    requires the s2d path (incompatible with spatial mode).

    ``quant="int8-full"``: additionally quantizes the GENERATOR's synthesis
    convs (every wscale conv through the flax `quant` collection), putting
    ~100% of the pipeline's conv FLOPs on the int8 MXU path. Measured on
    worst-case random weights: ~97% mask agreement and ~35 dB image PSNR vs
    the float path (error stays linear across blocks — AdaIN's instance
    norm renormalizes after every conv); validate on trained weights
    before production emission.
    """

    def __init__(self, image_generator: ImageGenerator, solver,
                 inference_dtype=jnp.bfloat16, s2d: bool = True,
                 n_block_stages: int = 3, mesh=None,
                 quant: Optional[str] = None):
        self.gen = image_generator
        self.solver = solver
        self.quant = quant
        from ..core.mesh import (DATA_AXIS, SPACE_AXIS, constrain_spatial,
                                 replicate)
        self.mesh = mesh
        spatial = (mesh is not None and SPACE_AXIS in mesh.axis_names
                   and mesh.shape[SPACE_AXIS] > 1)
        # dp extent of the batch axis: the int8 chunker sizes its
        # per-DEVICE working set from this and never reshapes a sharded
        # batch axis (ops/quant.conv2d_s8_fused)
        dp_shards = (mesh.shape[DATA_AXIS]
                     if mesh is not None and DATA_AXIS in mesh.axis_names
                     else 1)
        if quant not in (None, "int8", "int8-full"):
            raise ValueError(f"unknown quant mode {quant!r}")
        if quant and spatial:
            # the int8 path rides the s2d tail, which spatial mode disables
            raise ValueError("--quant requires the s2d decoder path, which "
                             "spatial parallelism replaces")
        if mesh is not None:
            # params live replicated over the mesh; jit then compiles one
            # SPMD program spanning all its devices
            self._gen_params = replicate(mesh, image_generator.params)
        else:
            self._gen_params = image_generator.params
        gen_model = image_generator.model
        if quant == "int8-full" and dp_shards != getattr(
                gen_model.cfg, "quant_batch_shards", 1):
            # thread the mesh's dp extent into the generator's int8 form
            # policy (per-DEVICE im2col working set — same plumb the
            # decoder path gets via apply_s2d_int8(batch_shards=...));
            # param tree is unchanged, so the existing params still fit
            import dataclasses
            gen_model = gen_model.clone(cfg=dataclasses.replace(
                gen_model.cfg, quant_batch_shards=dp_shards))
        # inference copy of the decoder in bf16: params stay f32, BN stats
        # are f32 inside flax; activations at 1024^2 halve their HBM traffic
        dec_model = (solver.model.clone(compute_dtype=inference_dtype)
                     if inference_dtype is not None else solver.model)
        nclass = int(dec_model.features_cfg[-1])
        # the s2d tail re-tiles H x W into block layout, which would fight
        # the H-shard (every reshape across the sharded dim forces a
        # reshard); spatial mode uses the standard decoder path, whose
        # convs partition cleanly with halo exchanges
        use_s2d = (s2d and not spatial
                   and len(dec_model.in_channels) - dec_model.start_res >= 2)

        from ..ops.s2d_decoder import (apply_s2d_prepared, class_mask_s2d,
                                       prepare_s2d)

        if quant and not use_s2d:
            raise ValueError("--quant requires the s2d decoder path "
                             "(decoder too shallow for a block tail?)")
        gen_quant = None
        if quant in ("int8", "int8-full"):
            # Calibration uses the FIXED-key protocol (ops/quant.py
            # calibration_batches — shared with bench.build_fused so the
            # benchmark measures the same calibrated pipeline): never the
            # sampling stream, so generate's byte-identity and --resume
            # survive quantization.
            from ..ops.quant import (apply_s2d_int8, calibration_batches,
                                     collect_calibration, prepare_s2d_int8,
                                     quantize_generator)
            # the protocol's FIXED batch of 4 regardless of the pipeline
            # batch size: PRNGKey(100+i) at a different shape is a
            # different sample, so varying the batch here would calibrate
            # a different pipeline than bench validates
            czs, cnks = calibration_batches(image_generator.cfg.latent_size)
            if quant == "int8-full":
                # quantize the GENERATOR's synthesis convs too (ops/quant.py
                # "generator" section): the quant collection is ~50 scalar
                # scales, closed over below (XLA folds them as constants)
                gen_quant = quantize_generator(
                    gen_model, image_generator.params, czs, cnks)
                # one jit object for both calibration batches (a fresh
                # lambda per batch would pay a second 30-90 s remote compile)
                _calib_fwd = jax.jit(lambda p, z, k: gen_model.apply(
                    {"params": p, "quant": gen_quant}, z,
                    rngs={"noise": k}))
            else:
                _calib_fwd = image_generator._fwd
            # The calibration pyramids depend only on the generator params
            # (fixed for this pipeline's lifetime) and the fixed keys —
            # compute them ONCE here, not per decoder refold: the
            # annotator's Retrain path swaps only SOLVER params, and each
            # refold would otherwise pay two generator dispatches. int8-full
            # calibrates the decoder on the QUANTIZED generator's pyramid —
            # the distribution it will serve.
            calib = [_calib_fwd(image_generator.params, z, k)[1]
                     for z, k in zip(czs, cnks)]

            # ONE jit object each for the fold and calibration programs,
            # reused across refolds: the annotator's Retrain swaps solver
            # params every round, and fresh lambdas per refold would pay
            # two 30-90 s remote recompiles each time
            _prep_jit = jax.jit(
                lambda v: prepare_s2d(dec_model, v, n_block_stages))
            _collect_jit = jax.jit(lambda p, f: collect_calibration(
                dec_model, p, f, n_block_stages))

            def _prepare_int8(v):
                prep = prepare_s2d_int8(dec_model, v, calib, n_block_stages,
                                        prepare_fn=_prep_jit,
                                        collect_fn=_collect_jit)
                # Device_put: the quantizer returns host numpy, which jit
                # would re-upload every step otherwise. With a mesh,
                # _prepared() replicates from host anyway — a device_put
                # here would be a wasted H2D+D2H roundtrip.
                return prep if self.mesh is not None else jax.device_put(prep)

            self._prepare = _prepare_int8
        elif use_s2d:
            # parameter folding (kernel scatters, BN fold, casts) runs once
            # per solver-parameter set, NOT in the per-batch step program
            self._prepare = jax.jit(
                lambda v: prepare_s2d(dec_model, v, n_block_stages))
        else:
            self._prepare = lambda v: v
        self._prep_cache = None  # (params_obj, stats_obj, prepared)

        # binary masks cross the host link bit-PACKED (8 pixels/byte, MSB
        # first == np.unpackbits order): the generate writer loop is
        # D2H-bound on this link (~4.2 MB/pair), and the mask is 1/4 of it
        res = 2 ** image_generator.cfg.max_res_log2
        self._pack_masks = nclass == 2 and res % 8 == 0
        pack_masks = self._pack_masks

        def fused(gen_params, dec_prepared, z, noise_rng):
            gvars = {"params": gen_params}
            if gen_quant is not None:
                gvars["quant"] = gen_quant
            rgb, feats = gen_model.apply(gvars, z, rngs={"noise": noise_rng})
            if spatial:
                # H-shard the pyramid over the ``space`` axis; XLA propagates
                # the layout into the decoder convs and adds halo exchanges
                feats = constrain_spatial(feats, mesh)
            if quant in ("int8", "int8-full"):
                # s8xs8->s32 convs over the same s2d stage walk
                logits = apply_s2d_int8(dec_model, dec_prepared, feats,
                                        n_block_stages,
                                        batch_shards=dp_shards)
                mask = class_mask_s2d(logits, nclass)
            elif use_s2d:
                # narrow high-res convs run in space-to-depth block layout
                # (ops/s2d_decoder.py) — numerically equivalent, full lanes
                logits = apply_s2d_prepared(dec_model, dec_prepared, feats,
                                            n_block_stages)
                mask = class_mask_s2d(logits, nclass)
            else:
                logits = dec_model.apply(dec_prepared, feats, False)
                if spatial:
                    logits = constrain_spatial([logits], mesh)[0]
                mask = class_mask(logits)
            if pack_masks:
                n, h, w = mask.shape
                bits = mask.reshape(n, h, w // 8, 8).astype(jnp.uint8)
                weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1],
                                      jnp.uint8)
                mask = jnp.sum(bits * weights, axis=-1, dtype=jnp.uint8)
            return _to_uint8(rgb, image_generator.cfg.imrange), mask

        self._fused = jax.jit(fused)

    def _prepared(self):
        """Fold solver params once; refold only if they were swapped
        (e.g. the annotator's Retrain re-fits the solver in place)."""
        p, s = self.solver.params, self.solver.batch_stats
        if self._prep_cache is None or self._prep_cache[0] is not p \
                or self._prep_cache[1] is not s:
            prep = self._prepare({"params": p, "batch_stats": s})
            if self.mesh is not None:
                from ..core.mesh import replicate
                prep = replicate(self.mesh, jax.device_get(prep))
            self._prep_cache = (p, s, prep)
        return self._prep_cache[2]

    def sample_batch(self, batch_size: Optional[int] = None):
        """Device batch: (uint8 imgs NHWC, uint8 masks). Binary masks come
        bit-packed along W (8 px/byte, `np.unpackbits` order) when
        ``self._pack_masks``; `generate_pairs` unpacks on host."""
        b = batch_size or self.gen.batch_size
        zk, nk = self.gen._next_rngs()
        z = jax.random.normal(zk, (b, self.gen.cfg.latent_size), jnp.float32)
        if self.mesh is not None:
            from ..core.mesh import shard_batch
            z = shard_batch(self.mesh, z)  # batch over ``data`` when it divides
        return self._fused(self._gen_params, self._prepared(), z, nk)

    def generate_batches(self, n: int) -> Iterator[Tuple[np.ndarray, np.ndarray, bool]]:
        """Yield host batches ``(uint8 imgs (B,H,W,3), uint8 masks, packed)``
        covering n samples (the last batch is trimmed).

        Keeps one batch in flight: the device computes batch i+1 while the
        host consumes batch i (JAX async dispatch).  When ``packed`` the
        masks are bit-packed along W (8 px/byte, ``np.unpackbits`` order) —
        the native writer (`native.PairWriter`) consumes that form directly,
        so the unpacked mask never materializes on host.
        """
        if n <= 0:
            return  # e.g. a multi-host process whose share rounded to zero
        b = self.gen.batch_size
        pending = self.sample_batch(b)
        produced = 0
        while produced < n:
            imgs_dev, masks_dev = pending
            take = min(b, n - produced)
            if produced + take < n:
                pending = self.sample_batch(b)  # enqueue next before D2H wait
            imgs = np.asarray(imgs_dev)[:take]
            masks = np.asarray(masks_dev)[:take]
            yield imgs, masks, self._pack_masks
            produced += take

    def generate_pairs(self, n: int) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yield n (uint8 image HWC, uint8 mask HW) pairs (unpacked masks)."""
        for imgs, masks, packed in self.generate_batches(n):
            if packed:
                masks = np.unpackbits(masks, axis=-1)
            for i in range(imgs.shape[0]):
                yield imgs[i], masks[i]
