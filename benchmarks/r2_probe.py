"""Round-2 perf probe: band-select normals kernel on real TPU at 1M.

Batched TPU measurement script (remote compiles are minutes each and
queue globally — run everything in one process, in the background):

1. full 2-pass window_fast, exact in-kernel selection (round-1 bench
   program — warm in the remote compile cache)
2. full 2-pass, band-bounded radius selection (band=16)
3. full 1-pass, band=16
4. quality at 1M density: 20k-query exact-kNN oracle vs each variant
5. scan-amortized steady-state timing (4 chained clouds, one dispatch)
6. xplane trace of variant 2 → per-op device-time table

Writes findings to stdout (pipe to a log).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def _kitti_like(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    ang = rng.uniform(0, 2 * np.pi, n)
    r = np.abs(rng.normal(0, 25, n)) + 2.0
    ground = np.stack([r * np.cos(ang), r * np.sin(ang),
                       rng.normal(0, 0.05, n)], -1)
    lift = rng.uniform(0, 1, n) < 0.3
    ground[lift, 2] = rng.uniform(0, 4, lift.sum())
    return ground.astype(np.float32)


def analyze_xplane(log_dir: str, top: int = 40) -> None:
    import glob
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(f"{log_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        log("  no xplane files under", log_dir)
        return
    for path in paths:
        sp = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            sp.ParseFromString(f.read())
        for plane in sp.planes:
            if "TPU" not in plane.name and "device" not in plane.name.lower():
                continue
            totals = {}
            for line in plane.lines:
                for ev in line.events:
                    md = plane.event_metadata[ev.metadata_id]
                    name = md.display_name or md.name
                    totals[name] = totals.get(name, 0) + ev.duration_ps
            if not totals:
                continue
            log(f"  plane {plane.name!r}: "
                f"{sum(totals.values())/1e9:.2f} ms total")
            for name, ps in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
                log(f"    {ps/1e9:9.3f} ms  {name[:110]}")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from threecrate_tpu.ops import neighbors
    from threecrate_tpu.ops.normals import _estimate
    from threecrate_tpu.utils.profiling import median_time

    log("backend:", jax.default_backend(), jax.devices())
    n = 1_000_000
    pts_np = _kitti_like(n)
    pts = jnp.asarray(pts_np)
    mask = jnp.ones(n, bool)
    big = jnp.float32(3e38)

    def make_run(passes: int, band: int):
        @jax.jit
        def run_scalar(points, m):
            mn = jnp.min(jnp.where(m[:, None], points, big), 0)
            mx = jnp.max(jnp.where(m[:, None], points, -big), 0)
            vp = (mn + mx) * 0.5 + jnp.array([0.0, 0.0, 1.0]) * \
                jnp.maximum(mx[2] - mn[2], 1.0)
            nrm, curv, valid = _estimate(points, m, 10, False,
                                         jnp.float32(0.0), vp, True,
                                         moments=True, window_passes=passes,
                                         window_band=band)
            return jnp.sum(jnp.abs(nrm)) + jnp.sum(valid)
        return run_scalar

    variants = [("2p_exact", make_run(2, 0)),
                ("2p_band16", make_run(2, 16)),
                ("1p_band16", make_run(1, 16))]
    for name, fn in variants:
        t0 = time.perf_counter()
        float(fn(pts, mask))  # compile+first run
        log(f"[compile+run] {name}: {time.perf_counter()-t0:.1f} s")
        t = median_time(lambda: fn(pts, mask), warmup=1, iters=5,
                        sync_fn=float)
        log(f"[TIME] {name}: {t*1e3:.1f} ms  ({n/t/1e6:.2f} Mpts/s, "
            f"vs_baseline {n/t/1e6/1.1574:.2f})")

    # ---- quality: 20k-query exact oracle at 1M density ----
    log("quality oracle: exact knn of 20k queries vs the 1M cloud")
    rng = np.random.default_rng(7)
    qidx = rng.choice(n, 20_000, replace=False)
    qidx_j = jnp.asarray(qidx, jnp.int32)

    @jax.jit
    def oracle_nbrs(points, m, qi):
        q = points[qi]
        qm = jnp.ones(qi.shape[0], bool)
        res = neighbors.knn(points, m, q, qm, 10)
        return res.indices, res.mask

    t0 = time.perf_counter()
    oi, om = oracle_nbrs(pts, mask, qidx_j)
    oi = np.asarray(oi); om = np.asarray(om)
    log(f"  oracle knn: {time.perf_counter()-t0:.1f} s")
    nbr = pts_np[oi]                      # (Q, k, 3)
    w = om[..., None].astype(np.float64)
    mu = (nbr * w).sum(1) / np.maximum(w.sum(1), 1e-12)
    d = (nbr - mu[:, None, :]) * w
    cov = np.einsum("qki,qkj->qij", d, d)
    evals, evecs = np.linalg.eigh(cov)
    oracle_nrm = evecs[:, :, 0]           # (Q, 3)

    def make_normals(passes: int, band: int):
        @jax.jit
        def run(points, m, qi):
            mn = jnp.min(jnp.where(m[:, None], points, big), 0)
            mx = jnp.max(jnp.where(m[:, None], points, -big), 0)
            vp = (mn + mx) * 0.5 + jnp.array([0.0, 0.0, 1.0]) * \
                jnp.maximum(mx[2] - mn[2], 1.0)
            nrm, curv, valid = _estimate(points, m, 10, False,
                                         jnp.float32(0.0), vp, True,
                                         moments=True, window_passes=passes,
                                         window_band=band)
            return nrm[qi]
        return run

    for name, passes, band in [("2p_exact", 2, 0), ("2p_band16", 2, 16),
                               ("1p_band16", 1, 16)]:
        t0 = time.perf_counter()
        sub = np.asarray(make_normals(passes, band)(pts, mask, qidx_j))
        dt = time.perf_counter() - t0
        cos = np.abs(np.sum(sub * oracle_nrm, -1))
        ang = np.degrees(np.arccos(np.clip(cos, 0, 1)))
        log(f"[QUALITY] {name}: mean {ang.mean():.3f}  p95 "
            f"{np.percentile(ang,95):.3f}  p99 {np.percentile(ang,99):.3f} "
            f" max {ang.max():.2f}  ({dt:.0f} s)")

    # ---- scan-amortized steady-state (4 clouds, one dispatch) ----
    clouds = jnp.stack([jnp.asarray(_kitti_like(n, s)) for s in range(4)])
    run2 = make_run(2, 16)

    @jax.jit
    def run_batch(cs, m):
        def body(acc, c):
            return acc + run2(c, m), 0.0
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), cs)
        return acc

    t0 = time.perf_counter()
    float(run_batch(clouds, mask))
    log(f"[compile+run] scan4_2p_band16: {time.perf_counter()-t0:.1f} s")
    t = median_time(lambda: run_batch(clouds, mask), warmup=1, iters=5,
                    sync_fn=float)
    per = t / 4
    log(f"[TIME] scan4_2p_band16: {t*1e3:.1f} ms total, {per*1e3:.1f} "
        f"ms/cloud ({n/per/1e6:.2f} Mpts/s, vs_baseline "
        f"{n/per/1e6/1.1574:.2f})")

    # ---- trace the 2p band variant ----
    fn = dict(variants)["2p_band16"]
    tdir = "/tmp/tc_trace_r2"
    jax.profiler.start_trace(tdir)
    float(fn(pts, mask))
    jax.profiler.stop_trace()
    log("trace captured:", tdir)
    analyze_xplane(tdir)


if __name__ == "__main__":
    main()
