"""Fresh serving process for export artifacts/bundles.

The actual deployment shape: a process that shares NO jax state with the
exporter — fresh backend (plain single-device CPU, no forced device
count), no model code, no flax modules — loads the artifact with only the
loader API and runs it. Generalizes the reference's checkpoint-consumer
contract (`seg_solver.py:331-349`: a consumer process restores the raw
parameter file and must reproduce the producer's predictions) to the
hermetic serving artifact.

Usage: python serve_worker.py {artifact|bundle} <path> <in.npz> <out.npz>

The input npz's keys are fed in sorted order; outputs are written as
out0, out1, ... in program order.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# a serving host runs whatever topology it has — drop the test harness's
# forced 8-device flag so this process genuinely differs from the exporter
os.environ.pop("XLA_FLAGS", None)

import numpy as np


def main():
    kind, path, in_npz, out_npz = sys.argv[1:5]
    import jax

    jax.config.update("jax_platforms", "cpu")  # axon sitecustomize override
    from gan_segmentation_tpu.core.jit_cache import enable_persistent_cache
    enable_persistent_cache()  # share the suite's on-disk compile cache
    assert len(jax.devices()) == 1, jax.devices()

    from gan_segmentation_tpu.core.export import load_artifact, load_bundle

    serve = load_artifact(path) if kind == "artifact" else load_bundle(path)
    data = np.load(in_npz)
    args = [data[k] for k in sorted(data.files)]
    outs = serve(*args)
    if not isinstance(outs, (tuple, list)):
        outs = (outs,)
    np.savez(out_npz, **{f"out{i}": np.asarray(o) for i, o in enumerate(outs)})
    print("serve-ok", flush=True)


if __name__ == "__main__":
    main()
