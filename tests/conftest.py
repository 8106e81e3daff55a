"""Test configuration: run on CPU with a virtual 8-device mesh.

Mirrors the reference's GPU-optional test strategy (SURVEY §4): tests
must pass with no accelerator. Multi-chip sharding tests use the
8-device virtual CPU mesh via --xla_force_host_platform_device_count.
Env vars must be set before jax initialises.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The container's sitecustomize force-registers a tunneled TPU plugin and
# pins JAX_PLATFORMS=axon; the config update below overrides it so tests
# run on the local virtual-8-device CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_debug_nans", False)


# ---------------------------------------------------------------------------
# Bounded-compile policy (VERDICT r3 item 10).
#
# The full suite (~430 tests, one process, ~2000 XLA:CPU backend
# compilations) segfaulted inside LLVM compilation around test ~300
# (r3c, twice, same spot; any 3-file subset passes) — accumulated
# backend JIT state, not any single test; see docs/benchmarks.md
# "Known gaps" for the pinned reproducer. r3c mitigated with a
# module-scoped jax.clear_caches() (suite ~30 min). r4 replaces the
# blanket per-module clear with a *budget*: a monitoring listener
# counts backend compiles and caches are dropped only when the count
# since the last clear exceeds TC_COMPILE_BUDGET — far fewer clears
# (and recompiles), same bound on live compiler state.
#
# Set TC_NO_CACHE_CLEAR=1 to disable (segfault-reproduction runs);
# TC_COMPILE_LOG=1 prints the running count after each test.
# ---------------------------------------------------------------------------

from jax._src import monitoring as _monitoring  # noqa: E402

_compiles = {"total": 0, "since_clear": 0, "clears": 0}
_COMPILE_BUDGET = int(os.environ.get("TC_COMPILE_BUDGET", "400"))


def _count_compiles(name, *a, **kw):
    if name == "/jax/core/compile/backend_compile_duration":
        _compiles["total"] += 1
        _compiles["since_clear"] += 1


_monitoring.register_event_duration_secs_listener(_count_compiles)


@pytest.fixture(autouse=True)
def _bounded_compiles(request):
    yield
    if os.environ.get("TC_COMPILE_LOG"):
        print(f" [compiles={_compiles['total']} "
              f"since_clear={_compiles['since_clear']} "
              f"clears={_compiles['clears']}]", flush=True)
    if os.environ.get("TC_NO_CACHE_CLEAR") == "1":
        return
    if _compiles["since_clear"] >= _COMPILE_BUDGET:
        jax.clear_caches()
        _compiles["since_clear"] = 0
        _compiles["clears"] += 1


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def random_cloud(rng):
    """100 uniform points in the unit cube (reference oracle-test fixture)."""
    from threecrate_tpu import PointCloud
    pts = rng.uniform(0, 1, size=(100, 3)).astype(np.float32)
    return PointCloud.from_numpy(pts), pts


def make_sphere_points(n: int = 500, radius: float = 1.0, seed: int = 0):
    """Fibonacci-sphere points with analytic normals (= positions/r).

    Same fixture idea as make_sphere_cloud (registration.rs:1148-1165).
    """
    i = np.arange(n, dtype=np.float64)
    phi = np.arccos(1 - 2 * (i + 0.5) / n)
    golden = np.pi * (1 + 5 ** 0.5)
    theta = golden * i
    pts = np.stack([
        np.cos(theta) * np.sin(phi),
        np.sin(theta) * np.sin(phi),
        np.cos(phi),
    ], axis=-1) * radius
    return pts.astype(np.float32)


def brute_force_knn(points: np.ndarray, queries: np.ndarray, k: int):
    """NumPy oracle mirroring BruteForceSearch (nearest_neighbor.rs:327-387)."""
    d2 = ((queries[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    dist = np.sqrt(np.take_along_axis(d2, idx, axis=1))
    return idx, dist
