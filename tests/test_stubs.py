"""The checked-in typed stub must match the runtime public surface.

Counterpart of the reference's hand-maintained threecrate.pyi
(threecrate-python/threecrate.pyi): here the stub is generated
(tools/gen_stub.py) and this test keeps it honest.
"""

import ast
import os

import threecrate_tpu as tc

STUB = os.path.join(os.path.dirname(tc.__file__), "__init__.pyi")


def _stub_names():
    with open(STUB) as f:
        tree = ast.parse(f.read())
    names = set()
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            names.add(node.name)
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target,
                                                            ast.Name):
            names.add(node.target.id)
    return names


def test_py_typed_marker_exists():
    assert os.path.exists(
        os.path.join(os.path.dirname(tc.__file__), "py.typed"))


def test_stub_parses_and_is_nonempty():
    with open(STUB) as f:
        tree = ast.parse(f.read())
    assert len(tree.body) > 100


def test_every_public_export_is_in_the_stub():
    stub = _stub_names()
    missing = [n for n in tc.api.__all__ if n not in stub]
    assert not missing, f"api exports missing from __init__.pyi: {missing}"
    for n in ("PointCloud", "TriangleMesh", "Transform",
              "OrganizedPointCloud", "CameraIntrinsics", "__version__"):
        assert n in stub


def test_stub_names_exist_at_runtime():
    dead = [n for n in _stub_names()
            if not n.startswith("__") and not hasattr(tc, n)]
    # annotation-closure classes (e.g. AlphaMode) are importable from
    # their defining module even when not re-exported at top level
    import importlib
    really_dead = []
    for n in dead:
        found = False
        for mod in ("threecrate_tpu.reconstruction.alpha_shape",):
            try:
                if hasattr(importlib.import_module(mod), n):
                    found = True
                    break
            except ImportError:
                pass
        if not found:
            really_dead.append(n)
    # closure classes live somewhere in the package — accept any that
    # appear in loaded threecrate_tpu modules
    import sys
    for n in list(really_dead):
        for m in list(sys.modules.values()):
            if m and getattr(m, "__name__", "").startswith("threecrate_tpu") \
                    and hasattr(m, n):
                really_dead.remove(n)
                break
    assert not really_dead, f"stub names with no runtime object: {really_dead}"
