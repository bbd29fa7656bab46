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

__all__ = ["annotate", "trace", "Throughput", "enable_nan_checks",
           "device_op_times"]


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


def device_op_times(fn, *args, top: int = 15, tmpdir: str = None):
    """Per-op device time of one execution of ``fn(*args)``.

    Traces a single (post-warmup) run with ``jax.profiler`` and aggregates
    event durations from the device plane via ``jax.profiler.ProfileData``
    — the ground truth for where device time goes (host wall-clock through
    the TPU tunnel carries ~30 ms of sync noise per call). Returns a list
    of ``(op_name, milliseconds)`` sorted descending, truncated to ``top``.

    Works on any backend (the device plane is matched by name; on CPU the
    plane is the host). Typical use::

        rows = device_op_times(jax.jit(price), paths)
        for name, ms in rows: print(f"{ms:8.3f} ms  {name}")
    """
    import glob
    import tempfile

    from jax.profiler import ProfileData

    out = jax.block_until_ready(fn(*args))  # warmup/compile outside the trace
    del out
    d = tmpdir or tempfile.mkdtemp(prefix="amcx_prof_")
    with trace(d):
        jax.block_until_ready(fn(*args))
    files = sorted(glob.glob(f"{d}/**/*.xplane.pb", recursive=True))
    if not files:
        raise RuntimeError(f"no xplane.pb produced under {d}")
    pd = ProfileData.from_file(files[-1])
    agg = {}
    for plane in pd.planes:
        name = plane.name.lower()
        if "tpu" not in name and "gpu" not in name and "cpu" not in name:
            continue
        for line in plane.lines:
            for ev in line.events:
                agg[ev.name] = agg.get(ev.name, 0) + ev.duration_ns
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    return [(n, ns / 1e6) for n, ns in rows]
