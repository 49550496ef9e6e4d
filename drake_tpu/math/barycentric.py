"""BarycentricMesh — simplex (Coxeter–Freudenthal–Kuhn) interpolation.

Re-derivation of math/barycentric.h (the mesh behind the reference's
DynamicProgramming value iteration): a rectangular grid whose cells are
triangulated so any query point is a convex combination of at most
**input_size + 1** mesh points (vs 2^n for multilinear) — the property that
keeps value-iteration updates sparse in high dimension.

Scheme (math/barycentric.cc EvalBarycentricWeights): per-dimension cell
fractions are sorted descending; walking from the cell's low corner and
incrementing one sorted dimension at a time visits the n+1 simplex
vertices, with weights (1 − f₍₁₎, f₍₁₎ − f₍₂₎, …, f₍ₙ₎).  Everything is
static-shape JAX: ``eval`` of a batch of points is one vmap.

Flat mesh-point indexing follows the reference's stride convention
(barycentric.cc: dimension 0 varies FASTEST, stride 1), so mesh-value
arrays laid out for the reference interpolate identically here.
Singleton (size-1) grids are accepted and skipped, as in the reference.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class BarycentricMesh:
    def __init__(self, grids: Sequence):
        self.grids = [jnp.asarray(g) for g in grids]
        if any(g.ndim != 1 or g.shape[0] < 1 for g in self.grids):
            raise ValueError("each grid needs >= 1 sorted coordinates")
        self.sizes = tuple(int(g.shape[0]) for g in self.grids)

    # -- mesh structure (barycentric.h accessors) -------------------------

    @property
    def input_size(self) -> int:
        return len(self.grids)

    @property
    def num_mesh_points(self) -> int:
        return int(np.prod(self.sizes))

    @property
    def num_interpolants(self) -> int:
        return self.input_size + 1

    def get_mesh_point(self, index: int) -> jnp.ndarray:
        """Mesh point by flat index (dim 0 fastest — reference stride)."""
        coords = []
        for size, g in zip(self.sizes, self.grids):
            coords.append(g[index % size])
            index //= size
        return jnp.stack(coords)

    def all_mesh_points(self) -> jnp.ndarray:
        """(num_mesh_points, input_size) — get_all_mesh_points role.

        Row i is ``get_mesh_point(i)`` (dim 0 varies fastest).
        """
        mesh = jnp.meshgrid(*self.grids, indexing="ij")
        # Reversing axes before the C-order flatten makes dim 0 fastest.
        return jnp.stack(
            [jnp.transpose(m).reshape(-1) for m in mesh], axis=-1
        )

    # -- interpolation ----------------------------------------------------

    def eval_barycentric_weights(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(indices (n+1,), weights (n+1,)) of the containing simplex."""
        x = jnp.asarray(x)
        n = self.input_size
        i0, fracs = [], []
        for d, g in enumerate(self.grids):
            ng = self.sizes[d]
            if ng == 1:  # singleton dim: pinned, zero fraction (reference)
                i0.append(jnp.zeros((), jnp.int32))
                fracs.append(jnp.zeros((), x.dtype))
                continue
            xd = jnp.clip(x[d], g[0], g[-1])
            i = jnp.clip(jnp.searchsorted(g, xd, side="right") - 1, 0, ng - 2)
            eps = jnp.asarray(jnp.finfo(g.dtype).tiny, g.dtype)
            f = jnp.clip(
                (xd - g[i]) / jnp.maximum(g[i + 1] - g[i], eps), 0.0, 1.0
            )
            i0.append(i)
            fracs.append(f)
        i0 = jnp.stack(i0)
        fracs = jnp.stack(fracs)

        order = jnp.argsort(-fracs)  # descending fractions
        f_sorted = fracs[order]
        weights = jnp.concatenate(
            [1.0 - f_sorted[:1], f_sorted[:-1] - f_sorted[1:], f_sorted[-1:]]
        )
        # Vertex k increments the k largest-fraction dimensions.
        pos = jnp.argsort(order)  # rank of each dimension
        mask = pos[None, :] < jnp.arange(n + 1)[:, None]  # (n+1, n)
        idx_nd = i0[None, :] + mask.astype(i0.dtype)
        # Clamp per-dim (singleton dims never advance; the clamped vertex
        # carries exactly-zero weight by construction).
        sizes = jnp.asarray(self.sizes, i0.dtype)
        idx_nd = jnp.minimum(idx_nd, sizes[None, :] - 1)
        # Reference stride convention: dim 0 fastest (stride 1).
        flat = jnp.zeros((n + 1,), i0.dtype)
        mult = 1
        for d in range(n):
            flat = flat + idx_nd[:, d] * mult
            mult *= self.sizes[d]
        return flat, weights

    def eval(self, values, x):
        """Interpolate ``values`` (num_mesh_points,) or (..., P) at x
        (Eval role; trailing mesh axis)."""
        idx, w = self.eval_barycentric_weights(x)
        values = jnp.asarray(values)
        return jnp.sum(values[..., idx] * w, axis=-1)

    def mesh_values_from(self, fn: Callable) -> jnp.ndarray:
        """Sample fn at every mesh point (MeshValuesFrom role)."""
        return jax.vmap(fn)(self.all_mesh_points())
