#!/usr/bin/env bash
# CI gate (the reference's .bazelrc configs / CI role, SURVEY §2.8).
#
# Hermetic: everything runs on the virtual 8-device CPU mesh in f64 —
# no TPU tunnel required.  Stages:
#   1. lint           (tools/lint.py — syntax, docstrings, precision policy)
#   2. native build   (g++ compile of the pub/sub transport)
#   3. unit tests     (pytest tests/ — conftest pins CPU + 8 virtual devices)
#   4. entry check    (__graft_entry__.entry compiles single-device;
#                      dryrun_multichip shards the flagship on 8 devices)
#
# Usage: bash tools/ci.sh [pytest-args...]
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== lint =="
python tools/lint.py

echo "== native build =="
python setup.py --quiet build_native

echo "== unit tests =="
XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -m pytest tests/ -q "$@"

echo "== graft entry =="
JAX_PLATFORMS=cpu python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
fn, args = g.entry()
out = fn(*args)
print("entry OK:", jax.tree_util.tree_map(lambda x: getattr(x, "shape", x), out))
EOF
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

echo "CI: all stages green"
