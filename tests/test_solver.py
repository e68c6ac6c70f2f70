"""Minimum end-to-end slice: fixture annotations -> decoder training ->
predict/evaluate -> save/load, all on the virtual CPU mesh."""

import dataclasses

import numpy as np
import pytest

from gan_segmentation_tpu.core.config import SolverConfig
from gan_segmentation_tpu.data.collection import CollectionDataset, trimap_from_gray
from gan_segmentation_tpu.train.solver import SegSolver

from util_fixtures import make_annotation_dir, mask_rule


@pytest.fixture(scope="module")
def annotation_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    make_annotation_dir(d, n_samples=6, max_res_log2=5, seed=0)
    return d


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("ckpt")


def small_cfg():
    cfg = SolverConfig(max_res_log2=5)
    cfg.train_epochs = 20
    return cfg


class TestCollectionDataset:
    def test_trimap_mapping(self):
        gray = np.array([[255, 200, 193], [192, 64, 128], [63, 0, 210]], np.uint8)
        tri = trimap_from_gray(gray)
        # >192 -> 1; 64..192 -> 0; <64 -> -1 (`seg_datasets.py:85-106`)
        np.testing.assert_array_equal(
            tri, [[1, 1, 1], [0, 0, 0], [-1, -1, 1]])

    def test_roundtrip_reference_format(self, annotation_dir):
        ds = CollectionDataset(str(annotation_dir), load_to_memory=True)
        assert len(ds) == 6
        img, mask, feats = ds[0]
        assert img.shape == (32, 32, 3) and img.dtype == np.float32
        assert mask.shape == (32, 32) and mask.dtype == np.int32
        # num_features(res_log2) = min(8192 / 2^(res_log2-1), 512) -> all 512
        # at these low resolutions (`networks_stylegan.py:114-116`)
        assert [f.shape for f in feats] == [(4, 4, 512), (8, 8, 512),
                                            (16, 16, 512), (32, 32, 512)]
        assert set(np.unique(mask)) <= {-1, 0, 1}
        assert (mask[:2] == -1).all()  # ignore band survived the roundtrip

    def test_cube_feature_layout(self, tmp_path):
        """The 128px scale of every supported pyramid is a (128,128,128)
        cube — shape alone cannot disambiguate CHW from HWC. Both the
        reference annotator and our writers store CHW; verify a cube
        round-trips un-scrambled, with and without a config (ADVICE r1)."""
        import pickle
        import cv2
        from gan_segmentation_tpu.data.collection import to_nhwc_feature

        rs = np.random.RandomState(0)
        chw = rs.randn(128, 128, 128).astype(np.float32)
        # direct: expected_channels picks CHW on the ambiguous cube
        out = to_nhwc_feature(chw, expected_channels=128)
        np.testing.assert_array_equal(out, np.transpose(chw, (1, 2, 0)))
        # no-config fallback must also default cubes to CHW (disk convention)
        np.testing.assert_array_equal(
            to_nhwc_feature(chw), np.transpose(chw, (1, 2, 0)))
        # unambiguous HWC passes through; wrong channel count raises
        hwc = rs.randn(16, 16, 32).astype(np.float32)
        np.testing.assert_array_equal(
            to_nhwc_feature(hwc, expected_channels=32), hwc)
        with pytest.raises(ValueError):
            to_nhwc_feature(hwc, expected_channels=64)

        # end-to-end through CollectionDataset with a cfg whose channel
        # table includes a cube scale
        cv2.imwrite(str(tmp_path / "img_000000.jpg"),
                    np.zeros((128, 128, 3), np.uint8))
        cv2.imwrite(str(tmp_path / "mask_000000.png"),
                    np.zeros((128, 128), np.uint8))
        feats = [rs.randn(512, 4, 4).astype(np.float32), chw]
        with open(tmp_path / "feat_000000.pickle", "wb") as fp:
            pickle.dump(feats, fp)
        cfg = dataclasses.make_dataclass("C", ["in_channels"])(  # duck cfg
            in_channels=[512, 128])
        ds = CollectionDataset(str(tmp_path), cfg=cfg, load_to_memory=True)
        _, _, loaded = ds[0]
        np.testing.assert_array_equal(loaded[1],
                                      np.transpose(chw, (1, 2, 0)))

    def test_batches(self, annotation_dir):
        ds = CollectionDataset(str(annotation_dir), load_to_memory=False)
        batches = list(ds.batches(2, shuffle=True, seed=1))
        assert len(batches) == 3
        b = batches[0]
        assert b["image"].shape == (2, 32, 32, 3)
        assert b["mask"].shape == (2, 32, 32)
        assert len(b["features"]) == 4


@pytest.mark.slow
class TestSolverEndToEnd:
    def test_fit_learns_and_roundtrips(self, annotation_dir, ckpt_dir):
        solver = SegSolver(5, str(annotation_dir), str(ckpt_dir),
                           cfg=small_cfg(), keep_weights=True)
        assert not solver.is_trained
        solver.fit()
        assert solver.is_trained

        # the decoder must have (over)fit the rule on the train set
        result = dict(solver.evaluate(str(annotation_dir)))
        assert result["accuracy"] > 0.9, result
        assert result["mean-iou"] > 0.8, result
        assert result["total-loss"] < 0.2, result

        # predict shape contract (`seg_solver.py:307-329`): (N, H, W, 1)
        ds = CollectionDataset(str(annotation_dir), load_to_memory=False)
        _, _, feats = ds[0]
        pred = solver.predict(feats)
        assert pred.shape == (1, 32, 32, 1)

        # auto-resume: a fresh solver picks up the checkpoint
        solver2 = SegSolver(5, str(annotation_dir), str(ckpt_dir),
                            cfg=small_cfg())
        assert solver2.is_trained
        pred2 = solver2.predict(feats)
        np.testing.assert_array_equal(pred, pred2)

    def test_evaluate_dumps_images(self, annotation_dir, ckpt_dir, tmp_path):
        solver = SegSolver(5, str(annotation_dir), str(ckpt_dir),
                           cfg=small_cfg())
        assert solver.is_trained  # from previous test's checkpoint
        out = tmp_path / "eval_out"
        solver.evaluate(str(annotation_dir), output_dir=str(out))
        files = sorted(p.name for p in out.iterdir())
        assert "img_000000.jpg" in files
        assert "mask_000000.png" in files
        assert "gt_mask_000000.png" in files
        assert "metrics_000000.txt" in files


@pytest.mark.slow
class TestDeviceCache:
    """HBM-resident dataset cache (`SegSolver._try_device_cache`): batch
    selection via on-device dynamic-slice must train identically to the
    per-step upload path (same seed -> same order -> same numbers)."""

    @pytest.mark.parametrize("n_dev,batch", [(1, 2), (2, 2), (8, 2)])
    def test_cached_fit_matches_uncached(self, annotation_dir, tmp_path,
                                         n_dev, batch):
        """Cache composes with data parallelism: the replicated HBM cache +
        re-sharded gathered batch (n_dev=2, batch divides mesh) trains
        bit-identically to the host-sharded upload path; n_dev=8/batch=2
        exercises the replicated-compute fallback on the full mesh."""
        import jax
        from gan_segmentation_tpu.core.mesh import make_mesh

        mesh = make_mesh(jax.devices()[:n_dev])

        def run(device_cache: bool, sub: str):
            cfg = small_cfg()
            cfg.train_epochs = 3
            cfg.train_batch_size = batch
            cfg.device_cache = device_cache
            # pin the per-step cached program: this test isolates cache-vs-
            # upload equivalence (bitwise batch content). The scanned-epoch
            # program computes the same trajectory but XLA fuses it
            # differently, and a 1-ulp gradient difference flips Adam's
            # early ~lr*sign(g) updates — that equivalence is asserted on
            # the (loss, acc) trajectory in test_scanned_epoch_matches_per_step.
            cfg.scan_epochs = False
            d = tmp_path / sub
            d.mkdir()
            s = SegSolver(5, str(annotation_dir), str(d), cfg=cfg,
                          mesh=mesh, keep_weights=True, seed=7)
            s.fit()
            return s

        a = run(True, "cached")
        b = run(False, "plain")
        la = jax.tree_util.tree_leaves(a.params)
        lb = jax.tree_util.tree_leaves(b.params)
        for x, y in zip(la, lb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-5, atol=1e-6)

    def test_scanned_epoch_matches_per_step(self, annotation_dir, tmp_path):
        """`scan_epochs`: running the whole cached epoch as ONE `lax.scan`
        program must compute the same numbers as dispatching the cached
        step per batch (same step body, same index order, same PRNG split
        order) — asserted on the per-step (loss, acc) trajectory, which any
        semantic divergence (wrong batch, wrong rng, mis-threaded state)
        would alter from step 2 on.

        Parameters are NOT compared bitwise: Adam's early updates are
        ~lr*sign(g) (bias-corrected m/sqrt(v) with v~=0), so a 1-ulp
        gradient difference between the scan-compiled and separately-jitted
        programs — mere XLA fusion reassociation — flips whole updates.
        Measured here: loss/acc bit-identical, params within ~lr after an
        epoch. The bound below scales with that mechanism.
        """
        import jax
        import jax.numpy as jnp
        from gan_segmentation_tpu.core.mesh import make_mesh
        from gan_segmentation_tpu.train.solver import SolverState

        mesh = make_mesh(jax.devices()[:1])
        cfg = small_cfg()
        cfg.train_batch_size = 2
        s = SegSolver(5, str(annotation_dir), str(tmp_path), cfg=cfg,
                      mesh=mesh, keep_weights=True, seed=7)
        dataset, ipe = s.init_data()
        tx = s._make_optimizer(ipe)
        cached = s._try_device_cache(dataset)
        assert cached is not None
        feats_all, masks_all = cached

        def fresh_state():
            # deep copies: both programs donate their input state, and the
            # donated buffers alias s.params
            p = jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)),
                                       jax.device_get(s.params))
            bs = jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)),
                                        jax.device_get(s.batch_stats))
            return SolverState(p, bs, jax.jit(tx.init)(p),
                               jnp.zeros((), jnp.int32))

        steps = len(dataset) // 2  # full batches only (6 samples -> 3)
        order = np.arange(len(dataset))
        np.random.RandomState(7).shuffle(order)
        idx_all = np.stack([order[i * 2:(i + 1) * 2]
                            for i in range(steps)]).astype(np.int32)

        step = s._build_train_step_cached(tx, 2)
        state_a, rng = fresh_state(), jax.random.PRNGKey(7)
        traj_a = []
        for i in range(steps):
            rng, step_rng = jax.random.split(rng)
            state_a, loss, acc = step(state_a, feats_all, masks_all,
                                      jnp.asarray(idx_all[i]), step_rng)
            traj_a.append((float(loss), float(acc)))

        epoch = s._build_train_epoch_cached(tx, 2)
        state_b, _, losses, accs = epoch(fresh_state(), feats_all, masks_all,
                                         jnp.asarray(idx_all),
                                         jax.random.PRNGKey(7))
        traj_b = list(zip([float(x) for x in losses],
                          [float(x) for x in accs]))

        np.testing.assert_allclose(np.asarray(traj_a), np.asarray(traj_b),
                                   rtol=1e-5, atol=0)
        assert int(np.asarray(state_b.step)) == steps
        lr_bound = steps * 2.5 * cfg.base_lr  # sign-flip envelope (see doc)
        for x, y in zip(jax.tree_util.tree_leaves(state_a.params),
                        jax.tree_util.tree_leaves(state_b.params)):
            assert float(np.abs(np.asarray(x) - np.asarray(y)).max()) \
                <= lr_bound

    def test_cache_respects_budget(self, annotation_dir):
        import jax
        from gan_segmentation_tpu.core.mesh import make_mesh

        cfg = small_cfg()
        cfg.device_cache_gb = 1e-9  # force over-budget
        s = SegSolver(5, str(annotation_dir), "/tmp/nonexistent-ckpt-dir-x",
                      cfg=cfg, mesh=make_mesh(jax.devices()[:1]),
                      keep_weights=True)
        ds, _ = s.init_data()
        assert s._try_device_cache(ds) is None

    def test_cache_decision_is_unanimous_across_processes(
            self, annotation_dir, monkeypatch):
        """Multi-host: cached-vs-per-step picks the SPMD program; if ANY
        process fails to build the cache, every process must fall back
        (divergent programs would deadlock the first collective)."""
        import jax
        from gan_segmentation_tpu.core import distributed
        from gan_segmentation_tpu.core.mesh import make_mesh

        s = SegSolver(5, str(annotation_dir), "/tmp/nonexistent-ckpt-dir-x",
                      cfg=small_cfg(), mesh=make_mesh(jax.devices()[:1]),
                      keep_weights=True)
        ds, _ = s.init_data()
        monkeypatch.setattr(jax, "process_count", lambda: 2)

        # a (simulated) remote process failed -> local success still bails
        monkeypatch.setattr(distributed, "allreduce_sum",
                            lambda x: np.int32(x) + 1)
        assert s._try_device_cache(ds) is None

        # unanimous success -> cache is built
        monkeypatch.setattr(distributed, "allreduce_sum",
                            lambda x: np.int32(x))
        assert s._try_device_cache(ds) is not None
