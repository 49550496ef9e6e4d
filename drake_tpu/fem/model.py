"""FEM deformable model: corotated tet elements, lumped mass, energies.

Re-derivation of the reference's FEM stack (fem/fem_model.h,
corotated_model.h, linear_constitutive_model.h) in the TPU shape: the model
is a frozen pytree of static arrays; every energy/force is one vmap over
elements feeding segment-sums — no per-element virtual dispatch, no
assembled sparse stiffness (the implicit solver is matrix-free, Hessians
appear only as jvp's).

Constitutive model: fixed corotated — same energy family the MPM solver
uses (mpm/solver.py fixed_corotated_stress), so FEM and MPM deformables
share material semantics:

    Psi(F) = mu ||F - R||_F^2 + lam/2 (J - 1)^2,   R = polar(F).

The polar rotation is computed by the same branch-free Newton iteration
(the Sifakis-SVD replacement) and is differentiated THROUGH, so jax.grad
of the total energy is the exact first Piola-Kirchhoff force and jax.jvp
of that gradient is the exact element Hessian action (no corotated-
linearization approximation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.mpm.solver import _det3, _polar_rotation
from drake_tpu.utils.struct import pytree_dataclass


@pytree_dataclass
class FemModel:
    """Static FEM model data (a pytree; all leaves jnp arrays)."""

    rest_x: jnp.ndarray  # (N, 3) rest vertex positions
    tets: jnp.ndarray  # (M, 4) int32
    Dm_inv: jnp.ndarray  # (M, 3, 3) inverse rest shape matrices
    volume: jnp.ndarray  # (M,) rest volumes
    mass: jnp.ndarray  # (N,) lumped vertex masses
    mu: jnp.ndarray  # () Lame mu
    lam: jnp.ndarray  # () Lame lambda
    dirichlet: jnp.ndarray  # (N,) 1.0 = free, 0.0 = pinned


def make_model(
    verts: np.ndarray,
    tets: np.ndarray,
    density: float = 1000.0,
    youngs_modulus: float = 1e5,
    poisson_ratio: float = 0.4,
    dirichlet_mask=None,
    dtype=jnp.float32,
) -> FemModel:
    """Build the model from a (host-side) tet mesh."""
    from drake_tpu.fem import mesh as meshmod

    tets = meshmod.fix_orientation(np.asarray(verts), np.asarray(tets))
    vol = meshmod.signed_volumes(np.asarray(verts), tets)
    d1 = verts[tets[:, 1]] - verts[tets[:, 0]]
    d2 = verts[tets[:, 2]] - verts[tets[:, 0]]
    d3 = verts[tets[:, 3]] - verts[tets[:, 0]]
    Dm = np.stack([d1, d2, d3], axis=2)  # columns = edge vectors
    Dm_inv = np.linalg.inv(Dm)

    mass = np.zeros(len(verts))
    np.add.at(mass, tets.ravel(), np.repeat(density * vol / 4.0, 4))

    E, nu = youngs_modulus, poisson_ratio
    mu = E / (2.0 * (1.0 + nu))
    lam = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
    free = (
        np.ones(len(verts))
        if dirichlet_mask is None
        else 1.0 - np.asarray(dirichlet_mask, dtype=float)
    )
    return FemModel(
        rest_x=jnp.asarray(verts, dtype),
        tets=jnp.asarray(tets, jnp.int32),
        Dm_inv=jnp.asarray(Dm_inv, dtype),
        volume=jnp.asarray(vol, dtype),
        mass=jnp.asarray(mass, dtype),
        mu=jnp.asarray(mu, dtype),
        lam=jnp.asarray(lam, dtype),
        dirichlet=jnp.asarray(free, dtype),
    )


def deformation_gradients(model: FemModel, x) -> jnp.ndarray:
    """F (M, 3, 3) per element at vertex positions x (N, 3)."""
    v = x[model.tets]  # (M, 4, 3)
    Ds = jnp.stack(
        [v[:, 1] - v[:, 0], v[:, 2] - v[:, 0], v[:, 3] - v[:, 0]], axis=2
    )
    return Ds @ model.Dm_inv


def elastic_energy(model: FemModel, x) -> jnp.ndarray:
    """Total corotated strain energy (scalar)."""
    F = deformation_gradients(model, x)
    R = _polar_rotation(F)
    J = _det3(F)
    dev = F - R
    psi = model.mu * jnp.sum(dev * dev, axis=(1, 2)) + 0.5 * model.lam * (
        J - 1.0
    ) ** 2
    return jnp.sum(model.volume * psi)


def elastic_forces(model: FemModel, x) -> jnp.ndarray:
    """Nodal internal forces -dE/dx (N, 3)."""
    return -jax.grad(lambda xx: elastic_energy(model, xx))(x)
