"""Harness smoke tests: bench CLI rows, graft entry, profiling utils —
benchmarks must keep working or perf numbers silently rot (SURVEY §4
'benchmarks as tests of honesty')."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


class TestDatasetBenchCli:
    def test_synthetic_rows(self, tmp_path):
        csv = tmp_path / "rows.csv"
        out = subprocess.run(
            [sys.executable, str(REPO / "benchmarks" / "dataset_bench.py"),
             "--synthetic", "3000", "--tasks", "voxel,normals,icp",
             "--iterations", "1", "--warmup", "1", "--csv", str(csv)],
            capture_output=True, text=True, timeout=300,
            env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
                 "PYTHONPATH": str(REPO)})
        assert out.returncode == 0, out.stderr
        rows = csv.read_text().strip().splitlines()
        assert rows[0].startswith("library,dataset,task")
        assert len(rows) == 4
        for row in rows[1:]:
            parts = row.split(",")
            assert parts[0] == "threecrate_tpu"
            assert float(parts[4]) > 0


class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        import jax
        sys.path.insert(0, str(REPO))
        import __graft_entry__ as g
        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        t = np.asarray(out[0])
        assert t.shape == (4, 4)
        assert np.isfinite(t).all()
        # the pair differs by a small translation; ICP must recover it
        np.testing.assert_allclose(t[:3, 3], [0.03, -0.01, 0.02], atol=0.02)

    def test_dryrun_multichip(self):
        import jax
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        sys.path.insert(0, str(REPO))
        import __graft_entry__ as g
        g.dryrun_multichip(8)


class TestProfiling:
    def test_median_time_and_sync(self):
        import jax.numpy as jnp
        from threecrate_tpu.utils.profiling import Timer, median_time, sync
        x = jnp.ones((128, 128))
        t = median_time(lambda: x * 2, warmup=1, iters=2)
        assert t >= 0
        assert sync(x) == 128 * 128
        timer = Timer()
        with timer.section("a"):
            pass
        assert "a" in timer.report()
