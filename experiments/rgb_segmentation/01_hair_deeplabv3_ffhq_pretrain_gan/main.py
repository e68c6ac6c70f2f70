#!/usr/bin/env python3
"""Hair DeepLabV3+ trained on the GAN-generated synthetic dataset
(reference `01_hair_deeplabv3_ffhq_pretrain_gan/main.py`):
train_generated subdir, rotate 15, SGD poly lr 0.005 wd 2e-4,
test threshold 1e-15."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))  # repo root
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # rgb_segmentation

from common import ExpSpec, run

SPEC = ExpSpec(train_subdir="train_generated", rotate_limit=15,
               lr=0.005, weight_decay=2e-4, test_threshold=1e-15)

if __name__ == "__main__":
    run(SPEC, __file__)
