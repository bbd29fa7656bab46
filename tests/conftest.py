"""Test environment: hermetic CPU backend with 8 virtual devices.

Sharding tests exercise the multi-chip path on a virtual 8-device CPU mesh
(the standard way to test TPU-pod collectives without a pod — SURVEY §4).
Must run before the first ``import jax`` anywhere in the test session.
"""

import os

# Note: a sitecustomize (PYTHONPATH=/root/.axon_site on the TPU host) may
# force JAX_PLATFORMS to the TPU plugin; the jax.config.update below wins.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the hermetic suite is dominated by CPU XLA
# compiles of scan-of-Pallas-interpret programs that are identical from run
# to run (keyed by HLO hash, so code changes invalidate exactly the affected
# programs). Cuts repeat runs from ~15 min to a few minutes on this 1-core
# host (suite-budget task, VERDICT r2 weak #3).
# AMCX_JAX_CACHE=off disables it (bisection/debug); a path overrides the
# default repo-root .jax_cache.
_cache = os.environ.get("AMCX_JAX_CACHE", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
if _cache != "off":
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices (XLA_FLAGS=--xla_force_host_platform_device_count=8)")
    return devs[:8]


def _n_maps() -> int:
    try:
        with open("/proc/self/maps", "rb") as f:
            return sum(1 for _ in f)
    except OSError:
        return -1


# Every loaded CPU executable holds LLVM-JIT code granules as three anonymous
# mappings (RO/RX/RW); the full suite accumulates ~200 mappings/test and SEGVs
# at vm.max_map_count (65530 default) around test ~310 — XLA crashes (not
# errors) when mmap fails during executable load. jax.clear_caches() releases
# the granules (verified: 2327 → 640 maps), so bound the count well below the
# ceiling. The persistent compilation cache keeps the post-clear recompiles
# cheap (disk read + load, no LLVM).
_MAPS_CLEAR_THRESHOLD = 40_000


@pytest.fixture(autouse=True)
def _bound_map_count(request):
    yield
    n = _n_maps()
    if n > _MAPS_CLEAR_THRESHOLD:
        jax.clear_caches()
    log = os.environ.get("AMCX_MAPS_LOG")
    if log:
        with open(log, "a") as f:
            f.write(f"{n}\t{request.node.nodeid}\n")
