#!/usr/bin/env python3
"""First contact with a real reference (mxnet) checkpoint, mechanized.

Automates PARITY.md's "converter first-contact checklist" as one command —
the four converters (stylegan / backbone / decoder / deeplab) have only ever
been validated against synthetic fixtures, so the first real file
(`/root/reference/image_generator.py:20-22` and
`deeplabv3plus/lib/utils/utils.py:5-16` save formats) must run this
sequence before being trusted:

  1. header dump      — binary layout + full entry table (name/shape/dtype)
  2. kind detection   — stylegan | backbone | decoder | deeplab, by name table
  3. strict load      — the matching converter with strict=True, so any
                        unmatched or missing weight is pinpointed by name
  4. transpose spot-check — one 4-D conv kernel independently re-laid-out
                        (OIHW -> HWIO) and located in the converted tree
  5. golden forward   — the converted model runs a fixed-seed input; output
                        activation means/stds are printed and written to
                        ``tests/fixtures/<stem>.golden.json`` so later loads
                        of the same file can be regression-checked

Usage:
    python tools/first_contact.py FILE [--kind auto] [--max-res-log2 N]
                                       [--fixtures-dir tests/fixtures]

Exit code 0 = every stage passed.
"""

import argparse
import json
import math
import sys
from os import makedirs
from os.path import basename, dirname, isdir, join, splitext

sys.path.insert(0, join(dirname(__file__), ".."))

import numpy as np


def _flat_leaves(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flat_leaves(v, f"{prefix}/{k}" if prefix else str(k))
    else:
        yield prefix, np.asarray(tree)


def header_dump(path):
    from gan_segmentation_tpu.core.mx_params import (
        is_mx_params_file, load_mx_ndarray_file)

    if not is_mx_params_file(path):
        raise SystemExit(f"{path}: not an mxnet NDArray-list file "
                         "(for flax checkpoints use tools/inspect_checkpoint.py)")
    mx = load_mx_ndarray_file(path)
    print(f"== 1. header dump: {len(mx)} entries " + "=" * 30)
    total = 0
    for name, arr in mx.items():
        total += arr.size
        print(f"  {name:<58} {str(tuple(arr.shape)):<22} {arr.dtype}")
    print(f"  {'total':<58} {total}")
    return mx


def detect_kind(mx) -> str:
    from gan_segmentation_tpu.core.deeplab_convert import (
        is_deeplab_reference_file)

    keys = set(mx)
    if is_deeplab_reference_file(mx):
        return "deeplab"
    if ("constant_tensor" in keys or "mp_dense_0_weight" in keys
            or any(k.endswith("_adain_1_dense_affine_weight") for k in keys)):
        return "stylegan"
    if any("bottleneckv1b" in k or "layers1" in k.replace(".", "_")
           for k in keys):
        return "backbone"
    # gluon creation-order or dotted decoder names
    if any(k.startswith(("conv0_", "batchnorm0_")) or ".cvt" in k
           or "resblock" in k for k in keys):
        return "decoder"
    raise SystemExit("cannot detect checkpoint kind from its names; pass "
                     "--kind {stylegan,backbone,decoder,deeplab}")


def _infer_stylegan_res(mx) -> int:
    tops = [k.split("_")[0] for k in mx if k.endswith("_conv_to_rgb_weight")]
    if not tops:
        raise SystemExit("stylegan file without *_conv_to_rgb_weight")
    return int(math.log2(max(int(t) for t in tops)))


def strict_load(path, mx, kind, max_res_log2):
    """Stage 3: converter in strict mode -> (variables, model_builder)."""
    import jax.numpy as jnp

    print(f"== 3. strict load ({kind}) " + "=" * 38)
    if kind == "stylegan":
        from gan_segmentation_tpu.core.config import GanConfig
        from gan_segmentation_tpu.core.mx_params import convert_stylegan_params
        from gan_segmentation_tpu.models.stylegan import StyleGanGenerator
        res = max_res_log2 or _infer_stylegan_res(mx)
        cfg = GanConfig(max_res_log2=res)
        params = convert_stylegan_params(mx, cfg)
        model = StyleGanGenerator(cfg, jnp.float32)
        return {"params": params}, ("stylegan", model, cfg)
    if kind == "backbone":
        from gan_segmentation_tpu.core.backbone_convert import (
            convert_resnet_v1s_params)
        from gan_segmentation_tpu.models.resnet import resnet50_v1s
        params, stats = convert_resnet_v1s_params(mx, strict=True)
        return ({"params": params, "batch_stats": stats},
                ("backbone", resnet50_v1s(), None))
    if kind == "decoder":
        from gan_segmentation_tpu.core.config import SolverConfig
        from gan_segmentation_tpu.core.decoder_convert import (
            convert_decoder_params)
        from gan_segmentation_tpu.models.decoder import decoder_from_config
        last = None
        # the file carries no resolution tag; find the config whose layer
        # table matches by trying strict loads smallest-first
        candidates = ([max_res_log2] if max_res_log2
                      else list(range(5, 11)))
        for res in candidates:
            cfg = SolverConfig(max_res_log2=res)
            try:
                params, stats = convert_decoder_params(mx, cfg, strict=True)
                print(f"  matched SolverConfig(max_res_log2={res})")
                return ({"params": params, "batch_stats": stats},
                        ("decoder", decoder_from_config(cfg), cfg))
            except Exception as exc:  # try the next resolution
                last = exc
        raise SystemExit(f"strict decoder load failed at every "
                         f"max_res_log2 in {candidates}: {last}")
    if kind == "deeplab":
        from gan_segmentation_tpu.core.deeplab_convert import (
            convert_deeplabv3plus_params)
        from gan_segmentation_tpu.models.deeplab import DeepLabV3Plus
        params, stats = convert_deeplabv3plus_params(mx)
        nclass = int(np.asarray(
            params["head_classifier"]["kernel"]).shape[-1])
        aux = "auxlayer" in params
        model = DeepLabV3Plus(nclass=nclass, aux=aux)
        return {"params": params, "batch_stats": stats}, ("deeplab", model, None)
    raise SystemExit(f"unknown kind {kind}")


def transpose_spot_check(mx, variables):
    """Stage 4: pick one OIHW conv from the source, re-transpose it
    independently, and require the exact tensor to exist in the converted
    tree (catches a silently-wrong layout convention)."""
    print("== 4. transpose spot-check " + "=" * 37)
    leaves = list(_flat_leaves(variables))
    for name, arr in mx.items():
        if arr.ndim != 4 or "deconv" in name or arr.shape[2] < 2:
            continue  # deconvs are flipped+swapped; 1x1 transposes are weak
        want = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
        for lname, leaf in leaves:
            if leaf.shape == want.shape and np.allclose(leaf, want):
                print(f"  {name} {arr.shape} OIHW == {lname} HWIO  OK")
                return name, lname
    # wscale'd kernels are stored scaled at runtime, not in the tree — a
    # miss here is a hard failure only if NO conv matched at all
    raise SystemExit("no source conv kernel found as an HWIO transpose in "
                     "the converted tree — layout convention is wrong")


def golden_forward(variables, built, seed=0):
    """Stage 5: fixed-seed forward; returns {output_name: [mean, std]}."""
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_platforms", "cpu")  # deterministic + no tunnel

    kind, model, cfg = built
    print("== 5. golden forward " + "=" * 43)
    key = jax.random.PRNGKey(seed)
    if kind == "stylegan":
        z = jax.random.normal(key, (1, cfg.latent_size), jnp.float32)
        rgb, feats = jax.jit(lambda v, z: model.apply(
            v, z, rngs={"noise": jax.random.PRNGKey(seed + 1)}))(variables, z)
        outs = {"rgb": rgb, **{f"feat_{f.shape[1]}": f for f in feats}}
    elif kind == "backbone":
        x = jax.random.normal(key, (1, 64, 64, 3), jnp.float32)
        c1, c3, c4 = jax.jit(lambda v, x: model.apply(v, x, False))(
            variables, x)
        outs = {"c1": c1, "c3": c3, "c4": c4}
    elif kind == "decoder":
        feats = [jax.random.normal(jax.random.fold_in(key, i),
                                   (1, 2 ** (i + 2), 2 ** (i + 2), c),
                                   jnp.float32)
                 for i, c in enumerate(cfg.in_channels)]
        logits = jax.jit(lambda v, f: model.apply(v, f, False))(
            variables, feats)
        outs = {"logits": logits}
    else:  # deeplab
        x = jax.random.normal(key, (1, 64, 64, 3), jnp.float32)
        outputs = jax.jit(lambda v, x: model.apply(v, x, False))(variables, x)
        outs = {f"out{i}": o for i, o in enumerate(outputs)}
    golden = {}
    for name, arr in outs.items():
        arr = np.asarray(arr, np.float64)
        golden[name] = [float(arr.mean()), float(arr.std())]
        print(f"  {name:<12} shape={tuple(arr.shape)} "
              f"mean={golden[name][0]:+.6f} std={golden[name][1]:.6f}")
    return golden


def run(path, kind="auto", max_res_log2=None, fixtures_dir=None, seed=0):
    mx = header_dump(path)
    if kind == "auto":
        kind = detect_kind(mx)
    print(f"== 2. kind: {kind} " + "=" * 46)
    variables, built = strict_load(path, mx, kind, max_res_log2)
    n_src = sum(a.size for a in mx.values())
    n_dst = sum(l.size for _, l in _flat_leaves(variables))
    print(f"  strict OK: {len(mx)} source entries -> "
          f"{n_dst}/{n_src} values placed")
    src_name, dst_name = transpose_spot_check(mx, variables)
    golden = golden_forward(variables, built, seed)

    record = {
        "file": basename(path), "kind": kind, "seed": seed,
        "entries": {k: [list(v.shape), str(v.dtype)] for k, v in mx.items()},
        "transpose_check": [src_name, dst_name],
        "golden": golden,
    }
    if fixtures_dir:
        if not isdir(fixtures_dir):
            makedirs(fixtures_dir)
        out = join(fixtures_dir,
                   splitext(basename(path))[0] + ".golden.json")
        with open(out, "w") as fp:
            json.dump(record, fp, indent=1, sort_keys=True)
        print(f"fixture listing written: {out}")
    print("FIRST CONTACT: all stages passed")
    return record


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("file")
    ap.add_argument("--kind", default="auto",
                    choices=("auto", "stylegan", "backbone", "decoder",
                             "deeplab"))
    ap.add_argument("--max-res-log2", type=int, default=None)
    ap.add_argument("--fixtures-dir",
                    default=join(dirname(__file__), "..", "tests", "fixtures"))
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args(argv)
    run(a.file, a.kind, a.max_res_log2, a.fixtures_dir, a.seed)


if __name__ == "__main__":
    main()
