"""Annotation collection dataset (feature-pyramid + trimap mask triples).

Re-implements `seg_datasets.py` (CollectionDataset):
- discovers ``feat_*.pickle`` files and derives ``img_*.jpg`` / ``mask_*.png``
  names (`seg_datasets.py:33-73`);
- trimap preprocessing of the gray mask: >192 -> 1 (positive), 64..192 -> 0
  (negative), <64 -> -1 (ignore) (`:85-106`);
- optional ``not_ignore_classes`` filter (`:110-113`);
- optional in-memory cache (``load_to_memory``).

Differences from the reference (TPU-native contract):
- images are returned NHWC float32 and masks (H, W) int32 — no NCHW
  transpose; feature arrays are returned NHWC (the layout the jit programs
  consume). Pickled features written by the *reference* annotator are NCHW
  fp32; layout is auto-detected per array against the generator channel
  table and converted once at load.
"""

import pickle
from os.path import join, splitext
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

from ..utils.io import list_files_with_ext


def trimap_from_gray(mask_gray: np.ndarray) -> np.ndarray:
    """Gray annotation -> {1, 0, -1} trimap (`seg_datasets.py:85-106`)."""
    mask = mask_gray.astype(np.int32)
    out = np.where(mask_gray > 192, 1, np.where(mask_gray >= 64, 0, -1))
    return out.astype(np.int32)


def gray_from_trimap(trimap: np.ndarray) -> np.ndarray:
    """Inverse encoding used when *writing* annotation masks
    (annotator convention: pos=255, neg=128, ignore=0; cf.
    `seg_solver.py:278-282`)."""
    out = np.zeros(trimap.shape, np.uint8)
    out[trimap == 1] = 255
    out[trimap == 0] = 128
    return out


def to_nhwc_feature(arr: np.ndarray,
                    expected_channels: Optional[int] = None) -> np.ndarray:
    """Accept a single feature map as CHW/NCHW (reference pickles) or
    HWC/NHWC and return HWC float32.

    Layout is decided against ``expected_channels`` (the generator channel
    table, GanConfig.num_features / SolverConfig.in_channels) when the
    caller knows it. A perfect cube — e.g. the 128-channel 128x128 scale of
    every ffhq/cars/bedrooms pyramid — is indistinguishable by shape alone,
    so it defaults to CHW: every pickle writer in this ecosystem (the
    reference annotator `seg_annotator.py:322-337`, our
    ``save_annotation_sample``, and ``apps/annotator.py``) stores CHW.
    """
    if arr.ndim == 4:
        arr = arr[0]
    assert arr.ndim == 3, arr.shape
    d0, d1, d2 = arr.shape
    if expected_channels is not None:
        chw = d0 == expected_channels and d1 == d2
        hwc = d2 == expected_channels and d0 == d1
        if chw:  # on a cube both match; CHW is the on-disk convention
            arr = np.transpose(arr, (1, 2, 0))
        elif not hwc:
            raise ValueError(
                f"feature shape {arr.shape} matches neither CHW nor HWC "
                f"with {expected_channels} channels")
    elif d0 == d1 == d2 or (d1 == d2 and d0 != d1):
        arr = np.transpose(arr, (1, 2, 0))  # CHW (cubes: disk convention)
    return np.ascontiguousarray(arr, np.float32)


class CollectionDataset:
    """Lazily loads (img, trimap-mask, feature-pyramid) triples."""

    def __init__(self, db_dir: str, cfg=None, is_validation: bool = False,
                 output_idx: bool = False, max_samples: Optional[int] = None,
                 allow_missed_mask: bool = False, load_to_memory: bool = True,
                 preprocess_mask: Optional[bool] = None,
                 not_ignore_classes: Optional[Sequence[int]] = None,
                 seed: int = 0):
        if cfg is not None:
            if preprocess_mask is None:
                preprocess_mask = getattr(cfg, "preprocess_mask", True)
            if not_ignore_classes is None:
                not_ignore_classes = getattr(cfg, "not_ignore_classes", None)
        self._preprocess_mask = True if preprocess_mask is None else preprocess_mask
        self._not_ignore_classes = not_ignore_classes
        # expected per-scale channel counts: disambiguates pickle layout at
        # the cube-shaped 128px scale (see to_nhwc_feature)
        self._expected_channels = None
        if cfg is not None:
            chans = getattr(cfg, "in_channels", None) or \
                getattr(cfg, "feature_channels", None)
            if chans:
                self._expected_channels = list(chans)
        self._allow_missed_mask = allow_missed_mask
        self._output_idx = output_idx
        self._db_dir = db_dir
        self._load_to_memory = load_to_memory

        feat_names = [f for f in list_files_with_ext(db_dir, [".pickle"])
                      if "feat" in f]
        if max_samples is not None and len(feat_names) > max_samples:
            rs = np.random.RandomState(seed)
            feat_names = list(rs.choice(feat_names, max_samples, replace=False))
        self._feat_names = feat_names
        self._samples = None
        if load_to_memory:
            self._samples = [self.load_sample(f) for f in feat_names]

    def __len__(self):
        return len(self._feat_names)

    def get_imname(self, idx: int) -> str:
        base = splitext(self._feat_names[idx])[0]
        return base.replace("feat", "img") + ".jpg"

    def load_sample(self, feature_name: str):
        base = splitext(feature_name)[0]
        imname = base.replace("feat", "img") + ".jpg"
        mask_name = base.replace("feat", "mask") + ".png"

        img = cv2.imread(join(self._db_dir, imname))
        assert img is not None, f"missing image {imname}"
        img = img[:, :, ::-1]  # BGR -> RGB

        mask = cv2.imread(join(self._db_dir, mask_name), 0)
        if mask is None and self._allow_missed_mask:
            mask = np.zeros(img.shape[:2], np.uint8)
        assert mask is not None, f"missing mask {mask_name}"

        with open(join(self._db_dir, feature_name), "rb") as fp:
            features = pickle.load(fp)
        expected = self._expected_channels
        if expected is not None and len(expected) != len(features):
            raise ValueError(
                f"{feature_name}: {len(features)} feature scales but the "
                f"config expects {len(expected)} ({expected})")
        features = [
            to_nhwc_feature(np.asarray(f),
                            expected[i] if expected is not None else None)
            for i, f in enumerate(features)]
        return mask, np.ascontiguousarray(img), features

    def get_item(self, idx: int):
        if self._samples is not None:
            mask, img, features = self._samples[idx]
        else:
            mask, img, features = self.load_sample(self._feat_names[idx])

        if self._preprocess_mask:
            mask = trimap_from_gray(mask)
        else:
            mask = mask.astype(np.int32)

        if self._not_ignore_classes is not None:
            keep = np.isin(mask, self._not_ignore_classes)
            mask = np.where(keep, mask, -1).astype(np.int32)

        img = img.astype(np.float32)
        if self._output_idx:
            return (np.int32(idx), img, mask, features)
        return (img, mask, features)

    def __getitem__(self, idx):
        return self.get_item(idx)

    def batches(self, batch_size: int, shuffle: bool = True, seed: int = 0,
                drop_last: bool = True):
        """Yield dicts of stacked numpy arrays: img (N,H,W,3), mask (N,H,W),
        features list[(N,h,w,c)], idx (N,)."""
        order = np.arange(len(self))
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        n = len(order)
        step = batch_size
        for s in range(0, n - (step - 1 if drop_last else 0), step):
            sel = order[s:s + step]
            if drop_last and len(sel) < step:
                return
            items = [self.get_item(i) for i in sel]
            if self._output_idx:
                idxs, imgs, masks, feats = zip(*items)
            else:
                imgs, masks, feats = zip(*items)
                idxs = sel
            yield {
                "idx": np.asarray(idxs, np.int32),
                "image": np.stack(imgs),
                "mask": np.stack(masks),
                "features": [np.stack([f[i] for f in feats])
                             for i in range(len(feats[0]))],
            }


def save_annotation_sample(db_dir: str, index: int, img_rgb: np.ndarray,
                           trimap: np.ndarray, features: List[np.ndarray],
                           raw_mask: bool = False):
    """Write one annotated triple in the reference's on-disk format
    (`seg_annotator.py:322-337`): img_%06d.jpg (BGR on disk),
    mask_%06d.png (gray trimap encoding), feat_%06d.pickle (list of NCHW-
    compatible CHW float32 arrays so reference tools can read them).

    ``raw_mask``: write class indices verbatim instead of the binary
    trimap gray encoding — the multi-class annotation convention
    (num_classes > 2 collections are read with ``preprocess_mask=False``,
    `seg_datasets.py:85-106` applying only to the binary protocol)."""
    cv2.imwrite(join(db_dir, f"img_{index:06d}.jpg"), img_rgb[:, :, ::-1])
    if raw_mask:
        trimap = np.asarray(trimap)
        if trimap.min() < 0:
            # astype(uint8) would wrap ignore labels (-1) to class 255 and
            # they would silently survive into training targets; the raw
            # multi-class protocol has no ignore encoding on disk
            raise ValueError("raw_mask=True cannot encode negative labels "
                             f"(got min {int(trimap.min())}); ignore bands "
                             "are a binary-trimap concept")
        mask_u8 = trimap.astype(np.uint8)
    else:
        mask_u8 = gray_from_trimap(trimap)
    cv2.imwrite(join(db_dir, f"mask_{index:06d}.png"), mask_u8)
    chw = [np.ascontiguousarray(np.transpose(f, (2, 0, 1)), np.float32)
           for f in features]
    with open(join(db_dir, f"feat_{index:06d}.pickle"), "wb") as fp:
        pickle.dump(chw, fp)
