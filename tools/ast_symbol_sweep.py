"""Reproducible symbol-level parity sweep vs the reference package.

AST-walks every module under ``/root/reference/chambers`` (read-only; no
reference code is imported or executed), collects each public top-level
symbol (function, class, or assignment whose name does not start with an
underscore), and checks that an attribute of the same name is importable
somewhere under ``chambers_tpu``. Documented renames and accepted
Keras-graph-specific omissions are listed explicitly below so the sweep's
claims are auditable.

This is the committed, re-runnable version of the coverage sweep cited in
VERDICT.md (round-3 advisor finding: the 74/74 assertion had no artifact).
Run::

    python tools/ast_symbol_sweep.py           # human report, exit 1 on gaps
    python tools/ast_symbol_sweep.py --json    # machine-readable line

It is also executed by ``tests/test_api_surface.py::test_ast_symbol_sweep``
so the suite fails if the reference surface and this package ever drift.
"""

import argparse
import ast
import importlib
import json
import os
import pkgutil
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_ROOT = Path("/root/reference/chambers")
PACKAGE = "chambers_tpu"

# Reference symbols whose capability exists under a different (documented)
# name; the sweep checks the right-hand name instead. Each rename is
# documented at the definition site it points to.
RENAMES = {
    # TF's gather_nd packing helper; capability lives on as take_along_rows
    # (chambers_tpu/utils/tensor.py docstring explains the rename).
    "arg_to_gather_nd": "take_along_rows",
}

# Accepted omissions: symbols that only make sense against the Keras
# functional-graph machinery the reference is built on. Documented in
# COVERAGE.md; anything appearing here must stay justified.
ACCEPTED_OMISSIONS = {
    # Rewrites keras.Input lists into InputLayer nodes — meaningless for
    # Flax modules (COVERAGE.md §2.7).
    "inputs_to_input_layer",
}


def reference_public_symbols():
    """Yield (module_relpath, symbol_name) for every public top-level
    binding in the reference package, via AST only."""
    for path in sorted(REFERENCE_ROOT.rglob("*.py")):
        rel = path.relative_to(REFERENCE_ROOT)
        tree = ast.parse(path.read_text(), filename=str(path))
        for node in tree.body:
            names = []
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                names = [node.name]
            elif isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name):
                        names.append(t.id)
            elif isinstance(node, ast.AnnAssign):
                if isinstance(node.target, ast.Name):
                    names.append(node.target.id)
            for name in names:
                if not name.startswith("_") and name != "keras_preprocessing":
                    yield str(rel), name


def build_local_index():
    """Import every chambers_tpu module and index its public attributes."""
    index = {}
    pkg = importlib.import_module(PACKAGE)
    modules = [PACKAGE]
    for info in pkgutil.walk_packages(pkg.__path__, prefix=PACKAGE + "."):
        # _native holds the C++ build tree, not importable python
        if "._native" in info.name:
            continue
        modules.append(info.name)
    for mod_name in modules:
        try:
            mod = importlib.import_module(mod_name)
        except Exception as exc:  # pragma: no cover - import rot is a gap
            print(f"warning: could not import {mod_name}: {exc}",
                  file=sys.stderr)
            continue
        for attr in dir(mod):
            if not attr.startswith("_"):
                index.setdefault(attr, mod_name)
    return index


def sweep():
    index = build_local_index()
    symbols = sorted(set(reference_public_symbols()))
    missing, covered, omitted = [], [], []
    for rel, name in symbols:
        target = RENAMES.get(name, name)
        if name in ACCEPTED_OMISSIONS:
            omitted.append((rel, name))
        elif target in index:
            covered.append((rel, name, index[target]))
        else:
            missing.append((rel, name))
    return covered, omitted, missing


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--json", action="store_true",
                        help="print one machine-readable JSON line")
    args = parser.parse_args(argv)

    covered, omitted, missing = sweep()
    if args.json:
        print(json.dumps({
            "reference_public_symbols": len(covered) + len(omitted)
                                        + len(missing),
            "covered": len(covered),
            "accepted_omissions": sorted(n for _, n in omitted),
            "missing": [f"{rel}:{name}" for rel, name in missing],
        }))
    else:
        print(f"reference public symbols: "
              f"{len(covered) + len(omitted) + len(missing)}")
        print(f"covered: {len(covered)}")
        for rel, name in omitted:
            print(f"accepted omission: {rel}:{name}")
        for rel, name in missing:
            print(f"MISSING: {rel}:{name}")
    return 1 if missing else 0


if __name__ == "__main__":
    sys.exit(main())
