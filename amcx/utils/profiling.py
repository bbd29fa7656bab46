"""Tracing/profiling utilities (SURVEY §5: the reference has none).

- :func:`annotate` — ``jax.profiler.TraceAnnotation`` context for the
  simulate/regress/reduce phases; shows up in TensorBoard/XProf traces.
- :func:`trace` — dump a device trace to a directory.
- :class:`Throughput` — wall-clock harness reporting **path-steps/sec**
  (the BASELINE metric), correctly amortizing host↔device round trips by
  chaining iterations inside one jitted loop.
- :func:`enable_nan_checks` — turn on ``jax_debug_nans`` (the functional
  replacement for the reference's nonexistent sanitizers; SURVEY §5 race
  detection: the pure `lax.scan` carries eliminate mutation races by
  construction).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import jax

__all__ = ["annotate", "trace", "Throughput", "enable_nan_checks"]


def annotate(name: str):
    """Named region in the device profile."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks(on: bool = True) -> None:
    jax.config.update("jax_debug_nans", on)


@dataclass
class Throughput:
    """Measure path-steps/sec of a pricing callable.

    ``fn(key) -> scalar`` must be jit-compatible; iterations are chained in
    one compiled ``fori_loop`` so per-call host sync (tens of ms through a
    TPU tunnel) doesn't pollute the measurement.
    """

    n_paths: int
    n_steps: int
    iters: int = 10

    def measure(self, fn):
        import jax.numpy as jnp
        from jax import lax

        @jax.jit
        def chained(key, n):
            def body(i, acc):
                return acc + fn(jax.random.fold_in(key, i))

            return lax.fori_loop(0, n, body, jnp.zeros(()))

        float(chained(jax.random.key(0), 1))  # compile + warm up
        t0 = time.time()
        float(chained(jax.random.key(1), self.iters))
        dt = (time.time() - t0) / self.iters
        return {
            "seconds_per_iter": dt,
            "path_steps_per_sec": self.n_paths * self.n_steps / dt,
        }
