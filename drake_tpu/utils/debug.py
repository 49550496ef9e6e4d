"""Dynamic analysis: NaN guards and value-validity checks.

Reference role (SURVEY §5 sanitizers/dynamic analysis): Drake runs ASan/
TSan/UBSan/Valgrind suites in CI and scatters DRAKE_ASSERT through hot
paths.  The JAX equivalents are numeric, not memory, hazards — this module
packages them:

  - ``nan_guard()``: enable jax_debug_nans for a scope (FloatingPointError
    at the op that produced the first NaN, with its traceback — the
    "sanitizer" for silent NaN poisoning in f32 solver lanes).
  - ``checkify_nans(fn)``: a checkify-instrumented version of ``fn`` that
    returns (error, out) and stays jit/vmap-compatible — the deployable
    in-graph check (debug_nans is debug-only; it disables fusion).
  - ``assert_all_finite(tree)``: eager validation of a pytree (test/guard
    tier, the DRAKE_ASSERT role).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


@contextmanager
def nan_guard(enable: bool = True):
    """Scope with jax_debug_nans toggled (restores the prior setting)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", bool(enable))
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checkify_nans(fn: Callable, div: bool = True) -> Callable:
    """Instrumented fn returning (error, out); error.get() is None when
    clean.  Composable with jit/vmap (checkify threads the error state)."""
    from jax.experimental import checkify

    errors = checkify.float_checks if div else checkify.nan_checks
    return checkify.checkify(fn, errors=errors)


def assert_all_finite(tree: Any, name: str = "value") -> None:
    """Raise FloatingPointError if any leaf contains NaN/Inf (eager)."""
    bad = []

    def visit(path, leaf):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            n_bad = int((~np.isfinite(arr)).sum())
            bad.append(f"{name}{jax.tree_util.keystr(path)}: "
                       f"{n_bad}/{arr.size} non-finite")

    jax.tree_util.tree_map_with_path(visit, tree)
    if bad:
        raise FloatingPointError("; ".join(bad))


def where_finite(x: jnp.ndarray, fallback: jnp.ndarray) -> jnp.ndarray:
    """Branch-free per-lane NaN containment: keep x where finite, else the
    fallback — the pattern the SAP/iLQR batched solvers use so one bad f32
    lane can't poison its scenario."""
    ok = jnp.all(jnp.isfinite(x))
    return jnp.where(ok, x, fallback)
