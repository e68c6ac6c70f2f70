#!/usr/bin/env python3
"""Regenerate tests/goldens.npz — fixed-seed CPU reference activations.

Run after an INTENTIONAL numerics change (and say so in the commit):
    JAX_PLATFORMS=cpu python tools/make_goldens.py
"""

import os
import sys
from os.path import dirname, join

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, join(dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from gan_segmentation_tpu.core.config import GanConfig, SolverConfig
from gan_segmentation_tpu.models.decoder import decoder_from_config
from gan_segmentation_tpu.models.stylegan import init_generator


def main():
    cfg = GanConfig(max_res_log2=4)
    model, params = init_generator(cfg, seed=0)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 512))
    rgb, feats = jax.jit(
        lambda p, z, r: model.apply({"params": p}, z, rngs={"noise": r})
    )(params, z, jax.random.PRNGKey(2))

    scfg = SolverConfig(max_res_log2=4)
    dec = decoder_from_config(scfg)
    dvars = jax.jit(lambda f: dec.init(jax.random.PRNGKey(3), f, False))(feats)
    logits = jax.jit(lambda v, f: dec.apply(v, f, False))(dvars, feats)

    out = {
        "rgb": np.asarray(rgb),
        "logits": np.asarray(logits),
    }
    for i, f in enumerate(feats):
        f = np.asarray(f)
        out[f"feat{i}_crop"] = f[:, :4, :4, :8]
        out[f"feat{i}_mean"] = f.mean(axis=(1, 2))
        out[f"feat{i}_std"] = f.std(axis=(1, 2))

    path = join(dirname(__file__), "..", "tests", "goldens.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: " + ", ".join(f"{k}{v.shape}" for k, v in out.items()))


if __name__ == "__main__":
    main()
