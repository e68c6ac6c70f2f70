#!/usr/bin/env python3
"""Hair DeepLabV3+ trained on real annotated data (reference
`00_hair_deeplabv3_ffhq_pretrain_no_gan/main.py`): train_real subdir,
no rotation, SGD poly lr 0.01 wd 1e-4, test threshold 0.5."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))  # repo root
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # rgb_segmentation

from common import ExpSpec, run

SPEC = ExpSpec(train_subdir="train_real", rotate_limit=0,
               lr=0.01, weight_decay=1e-4, test_threshold=0.5)

if __name__ == "__main__":
    run(SPEC, __file__)
