"""Serving export (core/export.py): StableHLO artifact roundtrips.

The artifact must be hermetic — weights baked in — and reproduce the live
program's outputs exactly after serialize -> deserialize.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_segmentation_tpu.core.export import (export_eval_model,
                                              export_fused_pipeline,
                                              load_artifact)

from test_multiscale_eval import build as build_tiny_eval


class TestEvalExport:
    def test_roundtrip_matches_live_program(self, tmp_path):
        ev = build_tiny_eval(crop=32, base=48, scales=(0.5, 1.0), flip=True)
        imgs = np.random.RandomState(0).randn(2, 40, 40, 3).astype(np.float32)
        path = str(tmp_path / "eval.stablehlo")
        export_eval_model(ev, 2, 40, 40, 3, path)
        serve = load_artifact(path)
        live = ev.device_scores_batch(list(imgs))
        np.testing.assert_array_equal(np.asarray(serve(imgs)),
                                      np.asarray(live))

    def test_artifact_is_weight_hermetic(self, tmp_path):
        """Mutating the live params after export must not change the
        artifact's outputs (weights are module constants)."""
        ev = build_tiny_eval(crop=32, base=32, scales=(1.0,), flip=False)
        imgs = np.random.RandomState(1).randn(1, 32, 32, 3).astype(np.float32)
        path = str(tmp_path / "eval.stablehlo")
        export_eval_model(ev, 1, 32, 32, 3, path)
        before = np.asarray(load_artifact(path)(imgs))
        ev.params = jax.tree_util.tree_map(lambda p: p * 0, ev.params)
        after = np.asarray(load_artifact(path)(imgs))
        np.testing.assert_array_equal(before, after)
        assert not np.allclose(before,
                               np.asarray(ev.device_scores_batch(list(imgs))))

    def test_multi_platform_artifact(self, tmp_path):
        """Export for cpu+tpu from the cpu host; artifact still runs here."""
        from jax import export as jax_export
        ev = build_tiny_eval(crop=32, base=32, scales=(1.0,), flip=False)
        path = str(tmp_path / "xplat.stablehlo")
        export_eval_model(ev, 1, 32, 32, 3, path, platforms=("cpu", "tpu"))
        with open(path, "rb") as fh:
            exported = jax_export.deserialize(fh.read())
        assert set(exported.platforms) == {"cpu", "tpu"}
        imgs = np.zeros((1, 32, 32, 3), np.float32)
        assert np.isfinite(np.asarray(exported.call(imgs))).all()


class TestBundle:
    def test_bundle_roundtrip_and_weight_swap(self, tmp_path):
        """Bundle keeps weights as inputs: the module is small, outputs
        match, and rewriting params.msgpack alone changes the outputs."""
        import os

        from flax import serialization

        from gan_segmentation_tpu.core.export import load_bundle, save_bundle

        params = {"w": jnp.full((3, 3), 2.0), "b": jnp.arange(3.0)}

        def fn(p, x):
            return x @ p["w"] + p["b"]

        d = str(tmp_path / "bundle")
        save_bundle(d, fn, params,
                    (jax.ShapeDtypeStruct((2, 3), np.float32),))
        x = np.random.RandomState(0).randn(2, 3).astype(np.float32)
        out = np.asarray(load_bundle(d)(x))
        np.testing.assert_allclose(out, x @ np.full((3, 3), 2.0) + np.arange(3.0),
                                   rtol=1e-6)
        # module stays small: weights live in params.msgpack, not the module
        assert os.path.getsize(os.path.join(d, "module.stablehlo")) < 20_000
        # swap weights without re-export (leaf order = tree_flatten order:
        # dict keys sorted -> ["b", "w"])
        leaves = [np.arange(3.0, dtype=np.float32) * 0,
                  np.eye(3, dtype=np.float32)]
        with open(os.path.join(d, "params.msgpack"), "wb") as fh:
            fh.write(serialization.to_bytes(leaves))
        np.testing.assert_allclose(np.asarray(load_bundle(d)(x)), x,
                                   rtol=1e-6)


@pytest.mark.slow
class TestFusedPipelineExport:
    @pytest.fixture(scope="class")
    def pipeline(self, tmp_path_factory):
        from util_fixtures import make_annotation_dir
        from gan_segmentation_tpu.core.config import SolverConfig
        from gan_segmentation_tpu.train.generator import (FusedPipeline,
                                                          ImageGenerator)
        from gan_segmentation_tpu.train.solver import SegSolver

        data = tmp_path_factory.mktemp("data")
        ckpt = tmp_path_factory.mktemp("ckpt")
        make_annotation_dir(data, n_samples=4, max_res_log2=5, seed=0)
        cfg = SolverConfig(max_res_log2=5)
        cfg.train_epochs = 2
        solver = SegSolver(5, str(data), str(ckpt), cfg=cfg)
        solver.fit()
        gen = ImageGenerator(gan="bedrooms", batch_size=2, dtype="fp32",
                             max_res_log2=5, gan_dir="/nonexistent")
        return FusedPipeline(gen, solver), str(ckpt), str(data)

    def test_roundtrip_matches_fused_program(self, pipeline, tmp_path):
        pipe, _, _ = pipeline
        path = str(tmp_path / "generate.stablehlo")
        export_fused_pipeline(pipe, 2, path)
        serve = load_artifact(path)
        z = jax.random.normal(jax.random.PRNGKey(5), (2, 512), jnp.float32)
        key = jax.random.PRNGKey(9)
        live_imgs, live_masks = pipe._fused(pipe._gen_params,
                                            pipe._prepared(), z, key)
        imgs, masks = serve(np.asarray(z), jax.random.key_data(key))
        # export lowers through a different jaxpr than the live jit, so XLA
        # may fuse the bf16 decoder differently: borderline argmax pixels
        # can flip (cf. the spatial-mesh tolerance). Require near-exact.
        np.testing.assert_array_equal(np.asarray(imgs), np.asarray(live_imgs))
        m1 = np.unpackbits(np.asarray(masks), axis=-1)
        m2 = np.unpackbits(np.asarray(live_masks), axis=-1)
        assert np.mean(m1 != m2) < 0.005
        # the artifact itself is deterministic
        imgs2, masks2 = serve(np.asarray(z), jax.random.key_data(key))
        np.testing.assert_array_equal(np.asarray(imgs), np.asarray(imgs2))
        np.testing.assert_array_equal(np.asarray(masks), np.asarray(masks2))

    def test_int8_full_pipeline_bundle_roundtrip(self, pipeline, tmp_path):
        """A fully quantized pipeline (generator + decoder int8,
        ops/quant.py) exports through the BUNDLE form: int8 kernels and
        scales ride params.msgpack, the ~50 generator activation scales are
        closed-over constants, and the roundtrip reproduces the live
        quantized program exactly.

        Batch 4 on purpose: it makes the live ``pipe._fused`` program
        byte-identical to test_quant_int8_full_pipeline's, so the two
        tests share ONE ~5.5-minute XLA CPU int8-conv compile through the
        persistent cache instead of paying it twice per cold suite run."""
        from gan_segmentation_tpu.core.export import (
            export_fused_pipeline_bundle, load_bundle)
        from gan_segmentation_tpu.train.generator import (FusedPipeline,
                                                          ImageGenerator)
        pipe_f, _, _ = pipeline  # reuse the fixture's trained solver
        gen = ImageGenerator(gan="bedrooms", batch_size=4, dtype="fp32",
                             max_res_log2=5, gan_dir="/nonexistent")
        pipe = FusedPipeline(gen, pipe_f.solver, quant="int8-full")
        d = str(tmp_path / "gen_int8.bundle")
        export_fused_pipeline_bundle(pipe, 4, d)
        serve = load_bundle(d)
        z = jax.random.normal(jax.random.PRNGKey(5), (4, 512), jnp.float32)
        key = jax.random.PRNGKey(9)
        live_imgs, live_masks = pipe._fused(pipe._gen_params,
                                            pipe._prepared(), z, key)
        imgs, masks = serve(np.asarray(z), jax.random.key_data(key))
        np.testing.assert_array_equal(np.asarray(imgs),
                                      np.asarray(live_imgs))
        np.testing.assert_array_equal(np.asarray(masks),
                                      np.asarray(live_masks))

    def test_bundle_matches_hermetic(self, pipeline, tmp_path):
        from gan_segmentation_tpu.core.export import (
            export_fused_pipeline_bundle, load_bundle)

        pipe, _, _ = pipeline
        hpath = str(tmp_path / "gen.stablehlo")
        export_fused_pipeline(pipe, 2, hpath)
        bdir = str(tmp_path / "gen.bundle")
        export_fused_pipeline_bundle(pipe, 2, bdir)
        z = np.random.RandomState(3).randn(2, 512).astype(np.float32)
        kd = np.asarray(jax.random.key_data(jax.random.PRNGKey(4)))
        h_imgs, h_masks = load_artifact(hpath)(z, kd)
        b_imgs, b_masks = load_bundle(bdir)(z, kd)
        # both lower through export; same program modulo where weights live
        np.testing.assert_array_equal(np.asarray(h_imgs), np.asarray(b_imgs))
        m1 = np.unpackbits(np.asarray(h_masks), axis=-1)
        m2 = np.unpackbits(np.asarray(b_masks), axis=-1)
        assert np.mean(m1 != m2) < 0.005

    def test_spmd_bundle_over_mesh(self, pipeline, tmp_path):
        """A mesh-carrying pipeline exports an SPMD bundle: 8-device
        program, weights replicated, batch sharded over ``data`` — and it
        reproduces the single-device pipeline's outputs."""
        from jax import export as jax_export

        from gan_segmentation_tpu.core.export import (
            export_fused_pipeline_bundle, load_bundle)
        from gan_segmentation_tpu.core.mesh import (data_sharding, make_mesh,
                                                    replicated_sharding)
        from gan_segmentation_tpu.train.generator import (FusedPipeline,
                                                          ImageGenerator)

        pipe_plain, _, _ = pipeline
        mesh = make_mesh()
        gen = ImageGenerator(gan="bedrooms", batch_size=8, dtype="fp32",
                             max_res_log2=5, gan_dir="/nonexistent")
        pipe_mesh = FusedPipeline(gen, pipe_plain.solver,
                                  inference_dtype=None, s2d=False, mesh=mesh)
        bdir = str(tmp_path / "spmd.bundle")
        export_fused_pipeline_bundle(pipe_mesh, 8, bdir)
        with open(f"{bdir}/module.stablehlo", "rb") as fh:
            assert jax_export.deserialize(fh.read()).nr_devices == 8

        serve = load_bundle(bdir,
                            params_sharding=replicated_sharding(mesh))
        z = np.random.RandomState(7).randn(8, 512).astype(np.float32)
        kd = np.asarray(jax.random.key_data(jax.random.PRNGKey(2)))
        imgs, masks = serve(jax.device_put(z, data_sharding(mesh, 2)),
                            jax.device_put(kd, replicated_sharding(mesh)))
        # reference: the same fused program, unsharded
        ref_imgs, ref_masks = pipe_mesh._fused(
            pipe_mesh._gen_params, pipe_mesh._prepared(),
            jax.device_put(z, data_sharding(mesh, 2)),
            jax.random.wrap_key_data(jax.device_put(
                kd, replicated_sharding(mesh))))
        np.testing.assert_array_equal(np.asarray(imgs), np.asarray(ref_imgs))
        np.testing.assert_array_equal(np.asarray(masks),
                                      np.asarray(ref_masks))

    def test_serves_in_fresh_process(self, pipeline, tmp_path):
        """Across a PROCESS boundary: a subprocess with no shared jax state
        (fresh backend, single CPU device, loader API only — see
        serve_worker.py) loads both export forms and reproduces this
        process's outputs up to recompilation rounding: the serving host
        compiles the portable StableHLO fresh for ITS flags/features, so a
        float landing exactly on a u8 quantization boundary may flip by 1
        (observed 1/6144 px) — images must match within ±1 and mask bits
        within 0.5%, same tolerance as test_bundle_matches_hermetic. Ref
        anchor: the checkpoint-consumer contract, `seg_solver.py:331-349`."""
        import os
        import subprocess
        import sys

        from gan_segmentation_tpu.core.export import (
            export_fused_pipeline_bundle, load_bundle)

        pipe, _, _ = pipeline
        hpath = str(tmp_path / "gen.stablehlo")
        export_fused_pipeline(pipe, 2, hpath)
        bdir = str(tmp_path / "gen.bundle")
        export_fused_pipeline_bundle(pipe, 2, bdir)

        z = np.random.RandomState(11).randn(2, 512).astype(np.float32)
        kd = np.asarray(jax.random.key_data(jax.random.PRNGKey(6)))
        in_npz = str(tmp_path / "in.npz")
        np.savez(in_npz, a0=z, a1=kd)

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = {**os.environ, "PYTHONPATH": repo}
        worker = os.path.join(repo, "tests", "serve_worker.py")
        for kind, path, local in (
                ("artifact", hpath, load_artifact(hpath)),
                ("bundle", bdir, load_bundle(bdir))):
            out_npz = str(tmp_path / f"out_{kind}.npz")
            r = subprocess.run(
                [sys.executable, worker, kind, path, in_npz, out_npz],
                capture_output=True, text=True, timeout=900, env=env,
                cwd=str(tmp_path))  # NOT the repo: imports go via PYTHONPATH
            assert r.returncode == 0 and "serve-ok" in r.stdout, \
                (r.stdout + r.stderr)[-2000:]
            got = np.load(out_npz)
            ref_imgs, ref_masks = local(z, kd)
            img_diff = np.abs(got["out0"].astype(np.int16) -
                              np.asarray(ref_imgs, dtype=np.int16))
            assert img_diff.max() <= 1 and np.mean(img_diff > 0) < 0.005, \
                (kind, img_diff.max(), np.mean(img_diff > 0))
            m1 = np.unpackbits(got["out1"], axis=-1)
            m2 = np.unpackbits(np.asarray(ref_masks), axis=-1)
            assert np.mean(m1 != m2) < 0.005, (kind, np.mean(m1 != m2))

    def test_export_cli(self, pipeline, tmp_path):
        """apps.export generate: config -> artifact -> runs."""
        from gan_segmentation_tpu.apps import export as export_cli

        _, ckpt, data = pipeline
        base = tmp_path / "base"
        base.mkdir()
        # the CLI reads BASE_DIR/{data,checkpoints}
        (base / "data").symlink_to(data)
        (base / "checkpoints").symlink_to(ckpt)
        cfg_file = tmp_path / "config.yml"
        cfg_file.write_text(f"""
BASE_DIR: {base}
GAN: bedrooms
GAN_DIR: {tmp_path}/no-models
GAN_GPU_IDS: [0]
GAN_BATCH_SIZE_PER_GPU: 2
SOLVER_GPU_IDS: [0]
ANNOTATION: segmentation
GENERATE_NUM: 4
MAX_RES_LOG2: 5
""")
        out = tmp_path / "gen.stablehlo"
        export_cli.main(["generate", "--config", str(cfg_file),
                         "-o", str(out), "--batch", "2"])
        serve = load_artifact(str(out))
        z = np.zeros((2, 512), np.float32)
        kd = np.asarray(jax.random.key_data(jax.random.PRNGKey(0)))
        imgs, masks = serve(z, kd)
        assert np.asarray(imgs).shape == (2, 32, 32, 3)
        assert np.asarray(imgs).dtype == np.uint8
