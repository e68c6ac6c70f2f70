"""Profiling / tracing (SURVEY §5.1).

The reference only has a 'speedometer' (samples/sec every 4 iters,
`seg_solver.py:436-448`), which the solver/trainer keep. This adds the
TPU-native upgrade: ``trace(logdir)`` wraps a region in a `jax.profiler`
trace viewable in TensorBoard/XProf, and ``Speedometer`` is a reusable
samples/sec/chip meter.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str, enabled: bool = True):
    """jax.profiler trace context; no-op when disabled or unsupported."""
    if not enabled:
        yield
        return
    # Guard only the profiler start/stop — an exception raised by the user's
    # body must propagate, not be swallowed (a swallowed body exception made
    # the generator yield twice, which contextlib masks as a RuntimeError).
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:  # profiler unsupported on some backends (axon tunnel)
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class Speedometer:
    """samples/sec/chip meter (`seg_solver.py:436-448` semantics)."""

    def __init__(self, display_every: int = 4, n_chips: int = 1):
        self.display_every = display_every
        self.n_chips = max(1, n_chips)
        self.reset()

    def reset(self):
        self._tic = time.time()
        self._count = 0

    def update(self, batch_size: int):
        """Returns samples/sec/chip every ``display_every`` calls, else None."""
        self._count += 1
        if self._count % self.display_every == 0:
            dt = time.time() - self._tic
            rate = self.display_every * batch_size / dt / self.n_chips
            self._tic = time.time()
            return rate
        return None
