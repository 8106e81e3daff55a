"""Round-4 TPU batch 3: NDT coarse-phase stride + stage split.

1. NDT 250k: build-only, loop-only (stride 1 vs 4), e2e stride 4
2. NDT 1M refine (r3: 4077 ms) at the auto stride 8
3. NDT recovery parity stride 1 vs 4 (on-device, Rx tilt)

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/r4c_probe.py
"""

from __future__ import annotations

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


def main() -> None:
    import jax
    import jax.numpy as jnp

    from threecrate_tpu.ops import ndt as ndt_mod
    from threecrate_tpu.utils.profiling import median_time

    assert jax.default_backend() != "cpu"
    log("backend:", jax.default_backend())
    init = jnp.eye(4, dtype=jnp.float32)

    for n, strides in ((250_000, (1, 4)), (1_000_000, (1, 8))):
        src = jnp.asarray(_kitti_like(n, 7))
        tgt = src + jnp.asarray(np.array([0.05, -0.03, 0.02],
                                         np.float32))
        m = jnp.ones(n, bool)

        @jax.jit
        def build_only(t_, tm):
            g = ndt_mod.build_gaussians(t_, tm, jnp.float32(2.0), 5)
            return jnp.sum(g.means) + jnp.sum(g.valid)

        tb = median_time(lambda: build_only(tgt, m), warmup=1, iters=3,
                         sync_fn=float)
        log(f"NDT {n} build-only: {tb*1e3:.1f} ms")

        g = jax.jit(ndt_mod.build_gaussians,
                    static_argnames=("min_points",))(
                        tgt, m, jnp.float32(2.0), 5)

        for sub in strides:
            @jax.jit
            def loop_only(s, sm, _sub=sub):
                T, score, it, conv = ndt_mod._ndt_loop(
                    s, sm, g, init, 20, jnp.float32(0.1),
                    jnp.float32(0.0), subsample=_sub)
                return jnp.sum(T) + score

            tl = median_time(lambda: loop_only(src, m), warmup=1,
                             iters=3, sync_fn=float)
            log(f"NDT {n} loop-only 20it sub={sub}: {tl*1e3:.1f} ms "
                f"({tl*1e3/20:.2f} ms/iter)")

        @jax.jit
        def e2e(s, sm, t_, tm, _sub=strides[1]):
            gg = ndt_mod.build_gaussians(t_, tm, jnp.float32(2.0), 5)
            T, score, it, conv = ndt_mod._ndt_loop(
                s, sm, gg, init, 20, jnp.float32(0.1),
                jnp.float32(0.0), subsample=_sub)
            return jnp.sum(T) + score

        te = median_time(lambda: e2e(src, m, tgt, m), warmup=1,
                         iters=3, sync_fn=float)
        log(f"NDT {n} build+20it e2e sub={strides[1]}: {te*1e3:.1f} ms "
            f"(r3 baseline: 947 at 250k / 4077 at 1M)")

    # recovery parity under a tilt (rotational component exercised)
    n = 250_000
    pts = _kitti_like(n, 3)
    ang = 0.02
    rx = np.array([[1, 0, 0],
                   [0, np.cos(ang), -np.sin(ang)],
                   [0, np.sin(ang), np.cos(ang)]], np.float32)
    t_true = np.array([0.05, -0.03, 0.02], np.float32)
    src = jnp.asarray(pts)
    tgt = jnp.asarray(pts @ rx.T + t_true)
    m = jnp.ones(n, bool)
    g = jax.jit(ndt_mod.build_gaussians,
                static_argnames=("min_points",))(
                    tgt, m, jnp.float32(2.0), 5)
    for sub in (1, 4):
        T, score, it, conv = jax.jit(
            ndt_mod._ndt_loop,
            static_argnames=("max_iterations", "subsample",
                             "full_iters"))(
            src, m, g, init, 35, jnp.float32(0.1), jnp.float32(1e-5),
            subsample=sub)
        Tn = np.asarray(T)
        rerr = np.abs(Tn[:3, :3] - rx).max()
        terr = np.abs(Tn[:3, 3] - t_true).max()
        log(f"NDT recovery sub={sub}: Rerr={rerr:.2e} terr={terr:.2e} "
            f"it={int(it)} score={float(score):.1f}")

    log("DONE")


if __name__ == "__main__":
    main()
