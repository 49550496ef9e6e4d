"""Implicit FEM time stepping: incremental potential + Newton-PCG.

The reference integrates deformables with an implicit Newmark scheme and a
Newton solver over an assembled sparse tangent (fem/fem_solver.h,
acceleration_newmark_scheme.h, with a direct/Schur solve in
deformable_driver.cc).  The TPU shape is different on purpose:

  - Backward Euler as an INCREMENTAL POTENTIAL (variational implicit Euler):
        x' = argmin  1/(2 h^2) ||x' - x_hat||_M^2 + E_elastic(x') + E_contact(x')
    with x_hat = x + h v + h^2 g.  Minimization guarantees stability without
    tuning; the optimality condition is exactly backward Euler.
  - Newton with MATRIX-FREE Hessian actions (jax.jvp of the gradient) and
    Jacobi-preconditioned CG: no sparse assembly, no supernodal factor —
    segment-sum force evaluations are what the VPU is good at, and every
    iteration is a fixed-shape fused XLA loop (vmaps over a batch of
    deformables).
  - Ground (halfspace) contact enters the SAME potential as a smooth
    quadratic penalty with implicit velocity damping — so the step stays a
    well-defined minimization and jax.grad differentiates through it.  Rigid
    two-way coupling reuses the MPM per-particle contact path
    (mpm/coupling.py) on nodal velocities; see contact/coupled_plant.py.

Gradients: the step is a fixed-iteration unrolled solver, so jax.grad
through it is exact (checked against finite differences in
tests/test_fem.py).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from drake_tpu.fem.model import FemModel, elastic_energy


@dataclasses.dataclass(frozen=True)
class FemSolverOptions:
    newton_iters: int = 6
    cg_iters: int = 25
    # Vectorized backtracking: energy is evaluated on this alpha grid at
    # once and the best decreasing step taken (same pattern as SAP's
    # vectorized line search).
    alphas: tuple = (1.0, 0.5, 0.25, 0.1, 0.03)
    # Ground contact penalty (normal stiffness per unit area-mass) and
    # implicit tangential damping coefficient.
    contact_stiffness: float = 1e6
    contact_friction_damping: float = 1e2


class FemState(NamedTuple):
    x: jnp.ndarray  # (N, 3) positions
    v: jnp.ndarray  # (N, 3) velocities


def make_state(model: FemModel) -> FemState:
    return FemState(x=model.rest_x, v=jnp.zeros_like(model.rest_x))


def _ground_energy(model, x, x_prev, h, opts, ground_z):
    """Smooth penalty for z < ground_z with implicit tangential damping.

    Normal: 1/2 k m_i max(0, -(z - ground_z))^2 — quadratic, C^1.
    Friction proxy: while penetrating, a quadratic penalty on tangential
    motion relative to the previous position (implicit Coulomb-like damping
    that the minimization resolves together with elasticity).
    """
    pen = jnp.maximum(ground_z - x[:, 2], 0.0)
    e_n = 0.5 * opts.contact_stiffness * jnp.sum(model.mass * pen * pen)
    active = (pen > 0).astype(x.dtype)
    dt_tan = (x[:, :2] - x_prev[:, :2]) / h
    e_t = (
        0.5
        * opts.contact_friction_damping
        * jnp.sum(model.mass * active * jnp.sum(dt_tan * dt_tan, axis=1))
        * h
    )
    return e_n + e_t


def implicit_step(
    model: FemModel,
    state: FemState,
    h: float,
    gravity=(0.0, 0.0, -9.81),
    external_force: Optional[jnp.ndarray] = None,  # (N, 3) nodal
    ground_z: Optional[float] = None,
    options: FemSolverOptions = FemSolverOptions(),
) -> FemState:
    """One backward-Euler step of size h.  jit/vmap/grad friendly."""
    opts = options
    x0, v0 = state.x, state.v
    dtype = x0.dtype
    m = model.mass[:, None]
    g = jnp.asarray(gravity, dtype)
    f_ext = jnp.zeros_like(x0) if external_force is None else external_force
    x_hat = x0 + h * v0 + (h * h) * (g[None, :] + f_ext / m)
    free = model.dirichlet[:, None]

    def objective(x):
        inertia = 0.5 / (h * h) * jnp.sum(m * (x - x_hat) ** 2)
        e = inertia + elastic_energy(model, x)
        if ground_z is not None:
            e = e + _ground_energy(model, x, x0, h, opts, ground_z)
        return e

    grad_f = jax.grad(objective)

    def pcg(x, b):
        """Jacobi-preconditioned CG on H(x) p = b, H action via jvp."""

        def hvp(p):
            return free * jax.jvp(grad_f, (x,), (p,))[1]

        # Jacobi preconditioner: the inertia diagonal dominates at small h.
        diag = m / (h * h)
        Minv = 1.0 / diag

        def body(carry, _):
            p, r, z, d, rz = carry
            Hd = hvp(d)
            denom = jnp.sum(d * Hd)
            alpha = rz / jnp.where(jnp.abs(denom) > 1e-30, denom, 1.0)
            p = p + alpha * d
            r = r - alpha * Hd
            z = Minv * r
            rz_new = jnp.sum(r * z)
            beta = rz_new / jnp.where(jnp.abs(rz) > 1e-30, rz, 1.0)
            d = z + beta * d
            return (p, r, z, d, rz_new), ()

        r0 = b
        z0 = Minv * r0
        carry = (jnp.zeros_like(b), r0, z0, z0, jnp.sum(r0 * z0))
        (p, _, _, _, _), _ = jax.lax.scan(
            body, carry, None, length=opts.cg_iters
        )
        return p

    def newton_iter(x, _):
        gr = free * grad_f(x)
        p = pcg(x, -gr)
        alphas = jnp.asarray(opts.alphas, dtype)
        evals = jax.vmap(lambda a: objective(x + a * free * p))(alphas)
        e0 = objective(x)
        best = jnp.argmin(evals)
        improved = evals[best] < e0
        a = jnp.where(improved, alphas[best], 0.0)
        return x + a * free * p, ()

    x, _ = jax.lax.scan(newton_iter, x_hat * free + x0 * (1 - free), None,
                        length=opts.newton_iters)
    v = (x - x0) / h * free
    return FemState(x=x, v=v)
