"""Fixtures: fabricate a tiny annotated dataset (reference on-disk format)
from a random-weight generator at low resolution — the 'annotate-by-fixture'
step of the minimum end-to-end slice (SURVEY.md §7 step 3)."""

import numpy as np
import jax
import jax.numpy as jnp

from gan_segmentation_tpu.core.config import GanConfig
from gan_segmentation_tpu.data.collection import save_annotation_sample
from gan_segmentation_tpu.models.stylegan import init_generator


def synthesize_samples(n_samples, max_res_log2=5, seed=0, batch=None):
    """Run a random generator; returns (imgs_uint8 NHWC, feats list NHWC)."""
    cfg = GanConfig(max_res_log2=max_res_log2)
    model, params = init_generator(cfg, seed=seed)

    @jax.jit
    def fwd(params, z, rng):
        return model.apply({"params": params}, z, rngs={"noise": rng})

    z = jax.random.normal(jax.random.PRNGKey(seed + 1), (n_samples, 512))
    rgb, feats = fwd(params, z, jax.random.PRNGKey(seed + 2))
    rgb = np.asarray(rgb)
    imgs = np.clip((rgb + 1) / 2, 0, 1)
    imgs = (imgs * 255).astype(np.uint8)
    return imgs, [np.asarray(f) for f in feats]


def mask_rule(feats):
    """A mask the decoder can learn: sign of channel 0 of the final feature."""
    return (feats[-1][..., 0] > 0).astype(np.int32)


def mask_rule_multiclass(feats, n_classes):
    """A learnable n-class mask: quantile-bucket channel 0 of the final
    feature into ``n_classes`` labels (every label present by construction
    on non-degenerate features)."""
    x = feats[-1][..., 0]
    qs = np.quantile(x, np.linspace(0, 1, n_classes + 1)[1:-1])
    return np.digitize(x, qs).astype(np.int32)


def make_annotation_dir(db_dir, n_samples=6, max_res_log2=5, seed=0,
                        with_ignore=True, n_classes=2):
    """Fabricate the reference on-disk annotation format. ``n_classes > 2``
    writes raw class-index masks (the multi-class convention, read with
    ``preprocess_mask=False``) instead of the binary trimap encoding."""
    import os
    os.makedirs(str(db_dir), exist_ok=True)
    imgs, feats = synthesize_samples(n_samples, max_res_log2, seed)
    for i in range(n_samples):
        sample_feats = [f[i] for f in feats]
        if n_classes > 2:
            mask = mask_rule_multiclass(sample_feats, n_classes)
            save_annotation_sample(str(db_dir), i, imgs[i], mask,
                                   sample_feats, raw_mask=True)
            continue
        trimap = mask_rule(sample_feats)
        if with_ignore:
            trimap = trimap.copy()
            trimap[:2, :] = -1  # ignore band like a sloppy annotation border
        save_annotation_sample(str(db_dir), i, imgs[i], trimap, sample_feats)
    return imgs, feats
