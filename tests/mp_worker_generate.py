"""Worker process for the REAL two-process `main.py generate` CLI test.

Launched twice by `tests/test_multiprocess.py` (process_id 0 and 1), each
with 4 virtual CPU devices, forming a 2-process jax.distributed cluster
over gloo. Each process runs the ACTUAL user CLI —
``main.py generate --dp 0`` — which must:
- split the global GENERATE_NUM into disjoint contiguous per-process
  slices (`apps/main.py::run_generate`, seed = process_index),
- build a process-LOCAL (4, 1) data mesh for ``--dp 0``
  (`core/mesh.py::is_local_mesh` routes replicate/shard_batch down the
  single-controller path even though process_count == 2),
- write its slice's (img, mask) pairs into the shared dataset dir.

The reference's generation loop is strictly single-host
(`image_generator.py:17,95` — multi-GPU via split_and_load only); this is
the TPU-native multi-host generalization under test.

Usage: python mp_worker_generate.py <port> <process_id> <cfg_file>
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
from gan_segmentation_tpu.core.jit_cache import enable_persistent_cache
enable_persistent_cache()  # share the suite's on-disk compile cache


def main():
    port, pid, cfg_file = sys.argv[1:4]
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from gan_segmentation_tpu.core.distributed import initialize

    active = initialize(f"localhost:{port}", num_processes=2,
                        process_id=int(pid))
    assert active, "jax.distributed did not come up multi-process"
    assert jax.process_count() == 2
    assert jax.local_device_count() == 4

    from gan_segmentation_tpu.apps.main import main as app_main

    app_main(["generate", "--dp", "0", "--config", cfg_file])

    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("generate-done")
    jax.distributed.shutdown()
    print(f"worker {pid} OK", flush=True)


if __name__ == "__main__":
    main()
