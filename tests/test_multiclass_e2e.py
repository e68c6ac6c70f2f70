"""Multi-class (num_classes > 2) driven end to end.

The reference supports face (9-class), hair_with_skin (3-class) and LSUN
(150-class) segmentation by editing the solver config
(`seg_solver.py:92-94`, class tables `metrics.py:7-35`); annotations for
num_classes > 2 store raw class indices, so the binary trimap gray
protocol (`seg_datasets.py:85-106`) does not apply. These tests drive the
same flows here: annotate-by-fixture -> train -> evaluate -> generate at
num_classes=3 (hair_with_skin) through the CLI, a 150-class tiny-res
config through the solver + fused pipeline (the `class_mask_s2d` argmax
branch and the bit-pack gate's OFF path), and s2d == standard-tail
equivalence at nclass > 2.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_segmentation_tpu.core.config import SolverConfig, load_config_file
from gan_segmentation_tpu.models.decoder import decoder_from_config
from gan_segmentation_tpu.ops.s2d_decoder import class_mask_s2d, decoder_apply_s2d
from gan_segmentation_tpu.train.generator import class_mask

from util_fixtures import make_annotation_dir

pytestmark = pytest.mark.slow  # training/e2e: minutes on the 1-core host


@pytest.mark.parametrize("nclass,n_block", [(3, 2), (150, 1)])
def test_decoder_s2d_matches_flax_multiclass(nclass, n_block):
    """The channel-major s2d tail == the standard decoder at nclass > 2:
    per-logit agreement AND the `class_mask_s2d` generic-argmax branch
    (reshape (..., nclass, 4), `ops/s2d_decoder.py:324-334`) == fine
    argmax."""
    cfg = SolverConfig(max_res_log2=5, num_classes=nclass,
                       preprocess_mask=False)
    dec = decoder_from_config(cfg)
    rs = np.random.RandomState(11)
    feats = [jnp.asarray(rs.randn(2, 2 ** (i + 2), 2 ** (i + 2), c),
                         jnp.float32)
             for i, c in enumerate(cfg.in_channels)]
    v = jax.jit(lambda f: dec.init(jax.random.PRNGKey(0), f, False))(feats)
    v = jax.device_get(v)
    v["batch_stats"] = jax.tree_util.tree_map(
        lambda a: np.abs(rs.randn(*np.shape(a))).astype(np.float32) + 0.5,
        v["batch_stats"])

    ref = jax.jit(lambda v, f: dec.apply(v, f, False))(v, feats)
    assert ref.shape[-1] == nclass
    got = jax.jit(lambda v, f: decoder_apply_s2d(
        dec, v, f, fine_logits=True, n_block_stages=n_block))(v, feats)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    logits_s2d = jax.jit(lambda v, f: decoder_apply_s2d(
        dec, v, f, n_block_stages=n_block))(v, feats)
    m_fine = np.asarray(class_mask(ref))
    m_s2d = np.asarray(class_mask_s2d(logits_s2d, nclass))
    assert m_fine.max() >= 2  # random weights spread over > 2 labels
    np.testing.assert_array_equal(m_s2d, m_fine)


def test_collection_multiclass_read_and_not_ignore(tmp_path):
    """Raw-index masks round-trip through the collection (no trimap
    mapping at preprocess_mask=False), and `not_ignore_classes` maps
    excluded labels to ignore (-1) — reference `seg_datasets.py:85-113`."""
    make_annotation_dir(tmp_path, n_samples=3, max_res_log2=5, seed=0,
                        n_classes=4)
    from gan_segmentation_tpu.data.collection import CollectionDataset
    cfg = SolverConfig(max_res_log2=5, num_classes=4, preprocess_mask=False)
    ds = CollectionDataset(str(tmp_path), cfg)
    _, mask, _ = ds[0]
    assert set(np.unique(mask)) == {0, 1, 2, 3}

    cfg2 = SolverConfig(max_res_log2=5, num_classes=4, preprocess_mask=False,
                        not_ignore_classes=[0, 2])
    ds2 = CollectionDataset(str(tmp_path), cfg2)
    _, mask2, _ = ds2[0]
    assert set(np.unique(mask2)) == {-1, 0, 2}
    np.testing.assert_array_equal(mask2 == -1,
                                  np.isin(mask, [1, 3]))


def test_raw_mask_save_rejects_negative_labels(tmp_path):
    """`save_annotation_sample(raw_mask=True)` must refuse ignore labels:
    astype(uint8) would wrap -1 to class 255, which preprocess_mask=False
    reads back as a VALID label that silently overflows num_classes. The
    binary protocol encodes -1 explicitly via the gray trimap; the raw
    multi-class protocol has no on-disk ignore encoding."""
    import pytest
    from gan_segmentation_tpu.data.collection import save_annotation_sample

    img = np.zeros((8, 8, 3), np.uint8)
    bad = np.zeros((8, 8), np.int32)
    bad[:2, :] = -1  # the ignore-band convention of the binary fixtures
    with pytest.raises(ValueError, match="negative"):
        save_annotation_sample(str(tmp_path), 0, img, bad, [], raw_mask=True)
    # non-negative labels still write fine
    save_annotation_sample(str(tmp_path), 0, img, np.abs(bad), [],
                           raw_mask=True)


def test_cli_multiclass3_train_evaluate_generate(tmp_path, monkeypatch,
                                                 capsys):
    """hair_with_skin (3-class) through the real CLI: config-driven
    NUM_CLASSES/CLS_TYPE (`seg_solver.py:92-94` semantics lifted into
    config.yml), train on raw-index annotations, evaluate (multi-class
    SegmentationMetric aggregation), generate (fused pipeline's
    `class_mask_s2d` argmax branch + the UNPACKED png writer path — the
    bit-pack gate is nclass==2-only, train/generator.py:272)."""
    from gan_segmentation_tpu.apps.main import main

    base = tmp_path / "exp"
    (base / "data").mkdir(parents=True)
    (base / "eval").mkdir()
    make_annotation_dir(base / "data", n_samples=4, max_res_log2=5, seed=0,
                        n_classes=3)
    make_annotation_dir(base / "eval", n_samples=2, max_res_log2=5, seed=5,
                        n_classes=3)

    cfg_file = tmp_path / "config.yml"
    cfg_file.write_text(f"""
BASE_DIR: {base}
GAN: bedrooms
GAN_DIR: {tmp_path}/no-models
GAN_GPU_IDS: [0]
GAN_BATCH_SIZE_PER_GPU: 4
SOLVER_GPU_IDS: [0]
ANNOTATION: segmentation
GENERATE_NUM: 4
MAX_RES_LOG2: 5
NUM_CLASSES: 3
CLS_TYPE: hair_with_skin
""")
    cfg = load_config_file(str(cfg_file))
    scfg = cfg.solver_config()
    assert (scfg.num_classes, scfg.cls_type, scfg.preprocess_mask) == \
        (3, "hair_with_skin", False)

    # speed: shrink the schedule but KEEP the config-derived class keys
    import gan_segmentation_tpu.apps.main as app
    orig = app.SegSolver

    def fast_solver(max_res_log2, data, ckpt, **kw):
        kw["cfg"].train_epochs = 4
        return orig(max_res_log2, data, ckpt, **kw)

    monkeypatch.setattr(app, "SegSolver", fast_solver)

    main(["train", "--config", str(cfg_file)])

    capsys.readouterr()
    main(["evaluate", "--config", str(cfg_file)])
    text = capsys.readouterr().out
    assert "mean-iou" in text or "accuracy" in text, text
    import re
    vals = [float(v) for v in re.findall(r": ([-\d.]+)", text)]
    assert vals and all(np.isfinite(v) for v in vals), text

    main(["generate", "--config", str(cfg_file)])
    out = base / "dataset" / "train_generated"
    masks = sorted(out.glob("mask_*.png"))
    assert len(masks) == 4
    labels = set()
    for p in masks:
        m = cv2.imread(str(p), cv2.IMREAD_GRAYSCALE)
        assert m is not None and m.shape == (32, 32)
        labels |= set(np.unique(m).tolist())
    # decodable multi-class masks: >2 labels present across the emission,
    # all within the 3-class range
    assert labels <= {0, 1, 2} and len(labels) == 3, labels


def test_cli_face9_train_evaluate_generate(tmp_path, monkeypatch, capsys):
    """face (9-class) — the reference's flagship multi-class map
    (`metrics.py:7-35`: background/hair/brows/eyes/nose/mouth/ears/skin/
    beard) — through the real CLI: train -> evaluate -> generate at
    NUM_CLASSES=9 / CLS_TYPE=face (`seg_solver.py:92-94` semantics), plus
    per-class SegMetric rows for ALL 9 class names through the solver's
    evaluate_for_data seam. Completes the multi-class matrix: 3
    (hair_with_skin) and 150 (LSUN) are covered by the tests above."""
    from gan_segmentation_tpu.apps.main import main
    from gan_segmentation_tpu.metrics.seg_metrics import (CLASS_MAPS,
                                                          SegMetric)

    base = tmp_path / "exp"
    (base / "data").mkdir(parents=True)
    (base / "eval").mkdir()
    make_annotation_dir(base / "data", n_samples=6, max_res_log2=5, seed=0,
                        n_classes=9)
    make_annotation_dir(base / "eval", n_samples=2, max_res_log2=5, seed=7,
                        n_classes=9)

    cfg_file = tmp_path / "config.yml"
    cfg_file.write_text(f"""
BASE_DIR: {base}
GAN: bedrooms
GAN_DIR: {tmp_path}/no-models
GAN_GPU_IDS: [0]
GAN_BATCH_SIZE_PER_GPU: 4
SOLVER_GPU_IDS: [0]
ANNOTATION: segmentation
GENERATE_NUM: 8
MAX_RES_LOG2: 5
NUM_CLASSES: 9
CLS_TYPE: face
""")
    cfg = load_config_file(str(cfg_file))
    scfg = cfg.solver_config()
    assert (scfg.num_classes, scfg.cls_type, scfg.preprocess_mask) == \
        (9, "face", False)

    import gan_segmentation_tpu.apps.main as app
    orig = app.SegSolver

    def fast_solver(max_res_log2, data, ckpt, **kw):
        kw["cfg"].train_epochs = 14  # 9-way needs more steps than 3-way
        return orig(max_res_log2, data, ckpt, **kw)

    monkeypatch.setattr(app, "SegSolver", fast_solver)

    main(["train", "--config", str(cfg_file)])

    capsys.readouterr()
    main(["evaluate", "--config", str(cfg_file)])
    text = capsys.readouterr().out
    assert "mean-iou" in text or "accuracy" in text, text
    import re
    vals = [float(v) for v in re.findall(r": ([-\d.]+)", text)]
    assert vals and all(np.isfinite(v) for v in vals), text

    # per-class rows for every one of the 9 face names: the named
    # SegMetric (reference `metrics.py:49-216` full_output protocol)
    # driven through the solver's own eval loop. Scored on the TRAIN
    # split: fixture eval dirs use a different seed, which reseeds the
    # GENERATOR WEIGHTS, so cross-seed features are from a different
    # network and chance-level by construction (the same gotcha the
    # round-1 capstone hit); the train split proves learnability.
    from gan_segmentation_tpu.data.collection import CollectionDataset
    solver = app.build_solver(cfg, keep_weights=True)
    assert solver.is_trained  # auto-resumed from the CLI train above
    names = CLASS_MAPS["face"]
    metric = SegMetric(9, class_names=names, full_output=True,
                       skip_bg=False)
    ds = CollectionDataset(str(base / "data"), solver.cfg,
                           load_to_memory=False, output_idx=True)
    rows = dict(solver.evaluate_for_data(ds, metric))
    for n in names:
        for suffix in ("iou", "recall", "precision"):
            assert f"{n}-{suffix}" in rows, (n, suffix, sorted(rows))
            assert np.isfinite(rows[f"{n}-{suffix}"])
    assert len(names) == 9
    # the fixture rule is learnable: the model must beat chance (1/9
    # pixel accuracy) by a wide margin even on this 6-epoch smoke
    assert rows["accuracy"] > 0.4, rows["accuracy"]

    main(["generate", "--config", str(cfg_file)])
    out = base / "dataset" / "train_generated"
    masks = sorted(out.glob("mask_*.png"))
    assert len(masks) == 8
    labels = set()
    for p in masks:
        m = cv2.imread(str(p), cv2.IMREAD_GRAYSCALE)
        assert m is not None and m.shape == (32, 32)
        labels |= set(np.unique(m).tolist())
    # all 9 face labels appear across the emission, none out of range
    assert labels <= set(range(9)), labels
    assert len(labels) == 9, labels


def test_lsun150_tiny_train_generate(tmp_path):
    """A 150-class LSUN-scale config at tiny res: solver trains (finite
    losses), evaluate aggregates a 150-bin histogram metric, and the fused
    pipeline emits raw-index masks with many labels — `metrics.py:7-35`
    scale driven for real rather than asserted."""
    from gan_segmentation_tpu.train.generator import FusedPipeline, ImageGenerator
    from gan_segmentation_tpu.train.solver import SegSolver

    data = tmp_path / "data"
    data.mkdir()
    make_annotation_dir(data, n_samples=4, max_res_log2=5, seed=2,
                        n_classes=150)
    # raw masks really span a big label range
    m0 = cv2.imread(str(data / "mask_000000.png"), cv2.IMREAD_GRAYSCALE)
    assert len(np.unique(m0)) > 50 and m0.max() <= 149

    cfg = SolverConfig(max_res_log2=5, num_classes=150,
                       preprocess_mask=False, train_epochs=2)
    solver = SegSolver(5, str(data), str(tmp_path / "ckpt"), cfg=cfg,
                       keep_weights=True)
    solver.fit()
    assert solver.is_trained

    result = dict(solver.evaluate(str(data)))
    assert all(np.isfinite(v) for v in result.values()), result

    netG = ImageGenerator(gan="bedrooms", gan_dir=str(tmp_path / "none"),
                          batch_size=2, max_res_log2=5, seed=0)
    pipe = FusedPipeline(netG, solver)
    assert pipe._pack_masks is False  # nclass > 2: packing gate off
    labels = set()
    for img, mask in pipe.generate_pairs(4):
        assert img.shape == (32, 32, 3) and img.dtype == np.uint8
        assert mask.shape == (32, 32) and mask.dtype == np.uint8
        assert mask.max() <= 149
        labels |= set(np.unique(mask).tolist())
    assert len(labels) > 2, labels
