"""ImageGenerator + fused pipeline + CLI end-to-end at tiny resolution."""

import numpy as np
import pytest

from gan_segmentation_tpu.core.config import SolverConfig
from gan_segmentation_tpu.train.generator import FusedPipeline, ImageGenerator
from gan_segmentation_tpu.train.solver import SegSolver

from util_fixtures import make_annotation_dir


@pytest.fixture(scope="module")
def trained_setup(tmp_path_factory):
    data = tmp_path_factory.mktemp("data")
    ckpt = tmp_path_factory.mktemp("ckpt")
    make_annotation_dir(data, n_samples=4, max_res_log2=5, seed=0)
    cfg = SolverConfig(max_res_log2=5)
    cfg.train_epochs = 2
    solver = SegSolver(5, str(data), str(ckpt), cfg=cfg)
    solver.fit()
    return data, ckpt, solver


class TestImageGenerator:
    def test_get_images_contract(self):
        """reference API: yields (uint8 HWC image, [feature arrays])
        (`image_generator.py:118-123`)."""
        gen = ImageGenerator(gan="bedrooms", batch_size=3, dtype="fp32",
                             max_res_log2=5, gan_dir="/nonexistent")
        samples = list(gen.get_images(5))
        assert len(samples) == 5
        img, feats = samples[0]
        assert img.shape == (32, 32, 3) and img.dtype == np.uint8
        assert len(feats) == 4
        assert feats[0].shape == (4, 4, 512)

    def test_batches_are_distinct(self):
        gen = ImageGenerator(gan="bedrooms", batch_size=2, dtype="fp32",
                             max_res_log2=5, gan_dir="/nonexistent")
        (a, _), (b, _) = list(gen.get_images(2))
        assert not np.array_equal(a, b)


@pytest.mark.slow
class TestFusedPipeline:
    def test_generate_pairs(self, trained_setup):
        _, _, solver = trained_setup
        gen = ImageGenerator(gan="bedrooms", batch_size=4, dtype="fp32",
                             max_res_log2=5, gan_dir="/nonexistent")
        pipe = FusedPipeline(gen, solver)
        pairs = list(pipe.generate_pairs(6))
        assert len(pairs) == 6
        img, mask = pairs[0]
        assert img.shape == (32, 32, 3) and img.dtype == np.uint8
        assert mask.shape == (32, 32) and mask.dtype == np.uint8
        assert set(np.unique(mask)) <= {0, 1}

    def test_quant_int8_pipeline(self, trained_setup):
        """FusedPipeline(quant='int8'): same seed stream, near-identical
        masks to the bf16/f32 path, and the z stream is untouched by the
        self-calibration (fixed keys — resume byte-identity depends on it)."""
        _, _, solver = trained_setup
        mk = lambda: ImageGenerator(gan="bedrooms", batch_size=4,
                                    dtype="fp32", max_res_log2=5,
                                    gan_dir="/nonexistent")
        ref_pairs = list(FusedPipeline(mk(), solver).generate_pairs(4))
        q_pairs = list(FusedPipeline(mk(), solver,
                                     quant="int8").generate_pairs(4))
        agree = np.mean([np.mean(r[1] == q[1])
                         for r, q in zip(ref_pairs, q_pairs)])
        assert agree > 0.97, agree
        # images come from the generator (unquantized): byte-identical
        for (ri, _), (qi, _) in zip(ref_pairs, q_pairs):
            np.testing.assert_array_equal(ri, qi)

    def test_quant_int8_full_pipeline(self, trained_setup):
        """int8-full: generator AND decoder quantized. Masks stay close to
        the float path; images deviate within PTQ tolerance (worst-case
        random generator — see ops/quant.py generator notes)."""
        _, _, solver = trained_setup
        mk = lambda: ImageGenerator(gan="bedrooms", batch_size=4,
                                    dtype="fp32", max_res_log2=5,
                                    gan_dir="/nonexistent")
        ref_pairs = list(FusedPipeline(mk(), solver).generate_pairs(4))
        q_pairs = list(FusedPipeline(mk(), solver,
                                     quant="int8-full").generate_pairs(4))
        agree = np.mean([np.mean(r[1] == q[1])
                         for r, q in zip(ref_pairs, q_pairs)])
        assert agree > 0.90, agree  # measured ~0.97 on random weights
        rel = np.mean([np.linalg.norm(q[0].astype(np.float32)
                                      - r[0].astype(np.float32))
                       / max(np.linalg.norm(r[0].astype(np.float32)), 1e-6)
                       for r, q in zip(ref_pairs, q_pairs)])
        assert rel < 0.3, rel

    def test_quant_calibration_independent_of_batch_size(self, trained_setup):
        """The int8 calibration protocol is FIXED at batch 4
        (`ops/quant.calibration_batches`): a pipeline with a smaller
        sampling batch must still produce the exact same quantization
        scales, or `bench.py --quant` would validate a different pipeline
        than a small-batch CLI config serves."""
        import jax

        _, _, solver = trained_setup

        def scales(bs):
            gen = ImageGenerator(gan="bedrooms", batch_size=bs, dtype="fp32",
                                 max_res_log2=5, gan_dir="/nonexistent")
            pipe = FusedPipeline(gen, solver, quant="int8")
            return jax.device_get(pipe._prepared())

        a, b = scales(2), scales(4)
        af = jax.tree_util.tree_flatten_with_path(a)[0]
        bf = jax.tree_util.tree_flatten_with_path(b)[0]
        assert len(af) == len(bf) > 0
        for (pa, va), (pb, vb) in zip(af, bf):
            assert pa == pb
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                          err_msg=str(pa))

    def test_quant_rejects_spatial(self, trained_setup):
        _, _, solver = trained_setup
        import jax
        from gan_segmentation_tpu.core.mesh import make_mesh_2d
        gen = ImageGenerator(gan="bedrooms", batch_size=4, dtype="fp32",
                             max_res_log2=5, gan_dir="/nonexistent")
        mesh = make_mesh_2d(len(jax.devices()) // 2, 2)
        with pytest.raises(ValueError, match="spatial"):
            FusedPipeline(gen, solver, mesh=mesh, quant="int8")

    def test_generate_batches_contract(self, trained_setup):
        """generate_batches keeps masks device-packed (8 px/byte) and trims
        the last batch; generate_pairs over it matches unpacked shapes."""
        _, _, solver = trained_setup
        gen = ImageGenerator(gan="bedrooms", batch_size=4, dtype="fp32",
                             max_res_log2=5, gan_dir="/nonexistent")
        pipe = FusedPipeline(gen, solver)
        batches = list(pipe.generate_batches(6))
        assert [b[0].shape[0] for b in batches] == [4, 2]
        for imgs, masks, packed in batches:
            assert packed  # res 32 is divisible by 8 -> device bit-packs
            assert masks.shape == (imgs.shape[0], 32, 4)  # W/8 bytes
            unpacked = np.unpackbits(masks, axis=-1)
            assert set(np.unique(unpacked)) <= {0, 1}

    def test_dp_mesh_pipeline(self, trained_setup):
        """Pure data parallelism (`--dp`, the TPU analog of the reference's
        multi-GPU generation, `image_generator.py:17,95`): on a (8, 1) mesh
        the batch shards over all devices, the s2d tail stays enabled
        (unlike spatial mode), and the emitted pairs match the
        single-device run — per-sample compute is batch-position
        independent, so DP must not change what generate writes."""
        from gan_segmentation_tpu.core.mesh import spatial_mesh

        _, _, solver = trained_setup

        def pairs_with(mesh):
            gen = ImageGenerator(gan="bedrooms", batch_size=8, dtype="fp32",
                                 max_res_log2=5, gan_dir="/nonexistent",
                                 seed=13)
            pipe = FusedPipeline(gen, solver, inference_dtype=None,
                                 mesh=mesh)
            return list(pipe.generate_pairs(8))

        plain = pairs_with(None)
        dp = pairs_with(spatial_mesh(1, dp=0))
        for (ia, ma), (ib, mb) in zip(plain, dp):
            # same tolerance as the spatial test: uint8 quantization can
            # flip a boundary pixel under reassociation across programs
            assert np.mean(np.abs(ia.astype(int) - ib.astype(int)) > 1) < 1e-3
            assert np.mean(ma != mb) < 1e-3

    def test_quant_composes_with_dp(self, trained_setup):
        """int8 rides the s2d tail, which a pure-DP mesh keeps — so quant
        + --dp must construct (only spatial mode rejects it)."""
        from gan_segmentation_tpu.core.mesh import spatial_mesh

        _, _, solver = trained_setup
        gen = ImageGenerator(gan="bedrooms", batch_size=8, dtype="fp32",
                             max_res_log2=5, gan_dir="/nonexistent")
        pipe = FusedPipeline(gen, solver, mesh=spatial_mesh(1, dp=0),
                             quant="int8")
        (img, mask), = list(pipe.generate_pairs(1))
        assert img.shape == (32, 32, 3) and mask.shape == (32, 32)

    def test_spatial_mesh_pipeline(self, trained_setup):
        """Spatial parallelism as a capability (VERDICT r2 #3): the same
        pipeline on a (2, 4) mesh — each image H-sharded over 4 devices —
        yields the same pairs as the unsharded run (same seeds -> same z/
        noise stream; fp32 so only reassociation noise separates them)."""
        from gan_segmentation_tpu.core.mesh import make_mesh_2d

        _, _, solver = trained_setup

        def pairs_with(mesh):
            gen = ImageGenerator(gan="bedrooms", batch_size=4, dtype="fp32",
                                 max_res_log2=5, gan_dir="/nonexistent",
                                 seed=11)
            pipe = FusedPipeline(gen, solver, inference_dtype=None,
                                 s2d=False, mesh=mesh)
            return list(pipe.generate_pairs(4))

        plain = pairs_with(None)
        spatial = pairs_with(make_mesh_2d(2, 4))
        for (ia, ma), (ib, mb) in zip(plain, spatial):
            # uint8 quantization: reassociation can flip a pixel crossing an
            # integer boundary; require near-exact agreement
            assert np.mean(np.abs(ia.astype(int) - ib.astype(int)) > 1) < 0.001
            assert np.mean(ma != mb) < 0.001


class TestResumeOffset:
    """`resume_offset`: contiguous-complete-pair count, torn-write back-off,
    device-batch alignment (no jax involved)."""

    @staticmethod
    def _touch_pairs(d, indices):
        for i in indices:
            (d / f"img_{i:06d}.jpg").write_bytes(b"x")
            (d / f"mask_{i:06d}.png").write_bytes(b"x")

    def test_counts_and_aligns(self, tmp_path):
        from gan_segmentation_tpu.apps.main import resume_offset

        self._touch_pairs(tmp_path, range(5))
        # 5 complete, back off 1 (torn-write guard) -> 4, batch 2 -> 4
        assert resume_offset(str(tmp_path), 0, 8, 2) == 4
        # batch 4: 4 -> boundary 4
        assert resume_offset(str(tmp_path), 0, 8, 4) == 4
        # batch 3: 4 -> boundary 3
        assert resume_offset(str(tmp_path), 0, 8, 3) == 3

    def test_gap_stops_the_count(self, tmp_path):
        from gan_segmentation_tpu.apps.main import resume_offset

        self._touch_pairs(tmp_path, [0, 1, 3, 4])  # idx 2 missing
        assert resume_offset(str(tmp_path), 0, 8, 2) == 0  # (2-1)//2*2

    def test_incomplete_pair_stops_the_count(self, tmp_path):
        from gan_segmentation_tpu.apps.main import resume_offset

        self._touch_pairs(tmp_path, range(4))
        (tmp_path / "mask_000003.png").unlink()  # img without mask
        assert resume_offset(str(tmp_path), 0, 8, 2) == 2

    def test_empty_and_offset_start(self, tmp_path):
        from gan_segmentation_tpu.apps.main import resume_offset

        assert resume_offset(str(tmp_path), 0, 8, 2) == 0
        # multi-host: process range starts at 10
        self._touch_pairs(tmp_path, range(10, 15))
        assert resume_offset(str(tmp_path), 10, 8, 2) == 4


class TestSkipBatches:
    def test_skip_batches_fast_forwards_stream(self):
        """A fresh generator that skips k batches continues the z/noise
        stream exactly where an interrupted one stopped."""
        full = ImageGenerator(gan="bedrooms", batch_size=2, dtype="fp32",
                              max_res_log2=5, gan_dir="/nonexistent", seed=3)
        batches = [np.asarray(full.sample_batch()[0]) for _ in range(4)]

        resumed = ImageGenerator(gan="bedrooms", batch_size=2, dtype="fp32",
                                 max_res_log2=5, gan_dir="/nonexistent",
                                 seed=3)
        resumed.skip_batches(2)
        rest = [np.asarray(resumed.sample_batch()[0]) for _ in range(2)]
        np.testing.assert_array_equal(batches[2], rest[0])
        np.testing.assert_array_equal(batches[3], rest[1])


@pytest.mark.slow
class TestCLI:
    def test_train_evaluate_generate(self, tmp_path, monkeypatch):
        from gan_segmentation_tpu.apps.main import main

        base = tmp_path / "exp"
        (base / "data").mkdir(parents=True)
        (base / "eval").mkdir()
        make_annotation_dir(base / "data", n_samples=4, max_res_log2=5, seed=0)
        make_annotation_dir(base / "eval", n_samples=2, max_res_log2=5, seed=5)

        cfg_file = tmp_path / "config.yml"
        cfg_file.write_text(f"""
BASE_DIR: {base}
GAN: bedrooms
GAN_DIR: {tmp_path}/no-models
GAN_GPU_IDS: [0]
GAN_BATCH_SIZE_PER_GPU: 4
SOLVER_GPU_IDS: [0]
ANNOTATION: segmentation
GENERATE_NUM: 5
MAX_RES_LOG2: 5
""")
        # speed: shrink the decoder schedule via env-free monkeypatching
        import gan_segmentation_tpu.apps.main as app
        orig = app.SegSolver

        def fast_solver(max_res_log2, data, ckpt, **kw):
            from gan_segmentation_tpu.core.config import SolverConfig
            cfg = SolverConfig(max_res_log2=max_res_log2)
            cfg.train_epochs = 2
            kw["cfg"] = cfg
            return orig(max_res_log2, data, ckpt, **kw)

        monkeypatch.setattr(app, "SegSolver", fast_solver)

        main(["train", "--config", str(cfg_file)])
        main(["evaluate", "--config", str(cfg_file)])
        main(["generate", "--config", str(cfg_file)])

        out = base / "dataset" / "train_generated"
        imgs = sorted(p.name for p in out.glob("img_*.jpg"))
        masks = sorted(p.name for p in out.glob("mask_*.png"))
        assert len(imgs) == 5 and len(masks) == 5
        assert imgs[0] == "img_000000.jpg" and masks[-1] == "mask_000004.png"

        # resume leg: drop the tail pair (simulating an interrupted
        # emission) and `generate --resume` — the seeded z stream
        # fast-forwards and reproduces the missing pairs byte-identically
        ref_bytes = {p.name: p.read_bytes() for p in out.iterdir()}
        (out / "img_000004.jpg").unlink()
        (out / "mask_000004.png").unlink()
        main(["generate", "--resume", "--config", str(cfg_file)])
        got = {p.name: p.read_bytes() for p in out.iterdir()}
        assert got == ref_bytes

        # data-parallel leg (--dp 4: the batch of 4 shards one sample per
        # device): same file set, near-identical masks. The CLI pipeline is
        # bf16, where the sharded program's different op tilings shift
        # rounding — measured <=0.8% boundary-pixel flips on these random
        # weights (fp32 is ~bit-identical: test_dp_mesh_pipeline)
        import cv2
        ref_masks = {p.name: cv2.imread(str(p), cv2.IMREAD_GRAYSCALE)
                     for p in out.glob("mask_*.png")}
        for p in out.iterdir():
            p.unlink()
        main(["generate", "--dp", "4", "--config", str(cfg_file)])
        assert sorted(p.name for p in out.iterdir()) == sorted(ref_bytes)
        for p in out.glob("mask_*.png"):
            m = cv2.imread(str(p), cv2.IMREAD_GRAYSCALE)
            diff = np.mean(m != ref_masks[p.name])
            assert diff < 0.02, (p.name, diff)
