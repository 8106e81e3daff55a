"""CI shard runner: split the suite into N balanced groups of files.

Usage: python tests/run_shard.py <shard> <n_shards>

The grouping is explicit (hand-balanced by measured module runtimes)
rather than hash-based, so a slow module never lands next to another
slow one. Any test file NOT named below is automatically appended to
the lightest shard — new test modules are never silently skipped —
and the script fails if a named file no longer exists.
"""

import subprocess
import sys
from pathlib import Path

TESTS = Path(__file__).parent

# hand-balanced by local runtimes (suite ~30 min total, 4 shards ≈ 8 min)
GROUPS = [
    [  # registration + heavy kernels
        "test_registration.py", "test_kernels.py", "test_models.py",
    ],
    [  # reconstruction + meshes
        "test_reconstruction.py", "test_simplification.py",
        "test_mesh_ops.py", "test_mesh_attributes.py", "test_viz.py",
    ],
    [  # features / normals / neighbors / filters
        "test_features.py", "test_normals.py", "test_neighbors.py",
        "test_filtering.py", "test_segmentation.py", "test_segmented.py",
    ],
    [  # tsdf + parallel + io + surface
        "test_tsdf_raycast.py", "test_tsdf_sparse.py",
        "test_frame_to_model.py", "test_parallel.py", "test_harness.py",
        "test_io.py", "test_io_extra.py", "test_api.py", "test_compat.py",
        "test_core.py", "test_stubs.py",
    ],
]


def shard_files(shard: int, n_shards: int):
    if n_shards != len(GROUPS):
        raise SystemExit(
            f"workflow asks for {n_shards} shards but {len(GROUPS)} "
            "groups are defined — update tests/run_shard.py")
    named = {f for g in GROUPS for f in g}
    missing = [f for f in named if not (TESTS / f).exists()]
    if missing:
        raise SystemExit(f"shard map names missing files: {missing}")
    groups = [list(g) for g in GROUPS]
    extras = sorted(p.name for p in TESTS.glob("test_*.py")
                    if p.name not in named)
    # new files ride the last (lightest-margin) shard
    groups[-1].extend(extras)
    return groups[shard - 1]


def main():
    shard, n_shards = int(sys.argv[1]), int(sys.argv[2])
    files = shard_files(shard, n_shards)
    print(f"shard {shard}/{n_shards}: {files}", flush=True)
    cmd = [sys.executable, "-m", "pytest", "-q"] + \
        [str(TESTS / f) for f in files]
    raise SystemExit(subprocess.call(cmd))


if __name__ == "__main__":
    main()
