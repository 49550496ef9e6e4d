"""MPM <-> rigid-body two-way coupling, fully on-device.

Re-derivation of the fork's coupling path (reference: deformable_driver.h:
221-270 CalcAbstractStates substep loop; CalcMpmContactPairs :120-196 runs
SDF queries ON CPU against SceneGraph and round-trips particle state
GPU->CPU->GPU each query — SURVEY.md §3.3 flags both device boundaries).
The TPU design evaluates the rigid geometries' *analytic* SDFs directly on
device (drake_tpu.geometry.shapes), so the whole coupled substep fuses into
one XLA program:

  substep: [MPM P2G -> grid update -> G2P] -> particle-rigid contact
           (penalty normal + regularized Coulomb vs rigid surface velocity)
           -> particle velocity correction + accumulated rigid impulses

Accumulated impulses divide by the rigid step h and enter the SAP step as
external spatial forces — the reference's one-way-lagged ("async") two-way
coupling (FinalizeExternalContactForces deformable_driver.h:210-218,
AddAppliedExternalSpatialForces multibody_plant.cc:2385-2407), which the
companion paper (arXiv:2503.05046) shows is stable for interactive rates.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from drake_tpu.geometry import shapes as sh
from drake_tpu.mpm import solver as mpm


@dataclasses.dataclass(frozen=True)
class MpmContactParams:
    """Mirror of MpmConfigParams' contact block (cpu_mpm_model.h:17-26)."""

    stiffness: float = 1e5  # normal penalty [N/m per unit mass-point]
    damping: float = 10.0  # normal rate damping
    friction: float = 0.5
    slip_velocity: float = 1e-3  # regularization of Coulomb friction


class RigidGeom(NamedTuple):
    """A rigid collision geometry the MPM particles can touch.

    Static shape + per-step pose and spatial velocity (world frame, about the
    body origin p_WB).  body_index < 0 marks an anchored geometry (world).
    """

    shape: object
    body_index: int
    R_WG: jnp.ndarray  # (3, 3)
    p_WG: jnp.ndarray  # (3,)
    p_WB: jnp.ndarray  # (3,) body origin (for torque accumulation)
    V_WB: jnp.ndarray  # (6,) [w; v] spatial velocity of the body


def _particle_sdf(geom: RigidGeom, x):
    """phi and outward normal (into the particles) for particle positions x."""
    if isinstance(geom.shape, sh.HalfSpace):
        return sh.halfspace_sdf_point(geom.R_WG, geom.p_WG, x)
    if isinstance(geom.shape, sh.Sphere):
        d = x - geom.p_WG
        dist = jnp.linalg.norm(d, axis=-1)
        n = d / jnp.maximum(dist[..., None], 1e-9)
        return dist - geom.shape.radius, n
    if isinstance(geom.shape, sh.Box):
        return sh.box_sdf_point(geom.R_WG, geom.p_WG, geom.shape.size, x)
    if isinstance(geom.shape, sh.Capsule):
        a, b = sh.capsule_segment_points(geom.R_WG, geom.p_WG, geom.shape.length)
        c = sh.closest_point_on_segment(a, b, x)
        d = x - c
        dist = jnp.linalg.norm(d, axis=-1)
        n = d / jnp.maximum(dist[..., None], 1e-9)
        return dist - geom.shape.radius, n
    if isinstance(geom.shape, sh.Ellipsoid):
        return sh.ellipsoid_sdf_point(
            geom.R_WG, geom.p_WG, geom.shape.radii, x
        )
    if isinstance(geom.shape, sh.Cylinder):
        return sh.cylinder_sdf_point(
            geom.R_WG, geom.p_WG, geom.shape.radius, geom.shape.length, x
        )
    if isinstance(geom.shape, sh.MeshSdf):
        # Baked voxel-grid SDF: MPM particles contact rigid MESH terrain
        # on-device (the fork queries SceneGraph's FCL meshes on the CPU
        # per substep — deformable_driver.h:120-196; here the grid sample
        # stays inside the fused substep).
        return sh.mesh_sdf_point(
            geom.R_WG, geom.p_WG, geom.shape, x
        )
    raise NotImplementedError(type(geom.shape).__name__)


def particle_rigid_contact(
    params: MpmContactParams,
    state: mpm.MpmState,
    geoms: Sequence[RigidGeom],
    dt: float,
):
    """Contact velocity correction + per-geometry rigid spatial impulses.

    Per particle in penetration (phi < 0) against each rigid geometry:
      f_n = (k * (-phi) - d * vn_rel) * n     (clamped >= 0)
      f_t = -mu * |f_n| * vt_rel / max(|vt_rel|, eps)
    applied to the particle; the negative accumulates on the rigid body as a
    spatial impulse about its origin (contact_particle_to_grid_kernel /
    apply_contact_impulse_to_rigid_bodies roles, cuda_mpm_kernels.cuh:1043,
    1617).
    Returns (new particle velocities, impulses (n_geoms, 6) [tau; f]).
    """
    v = state.v
    impulses = []
    for geom in geoms:
        phi, n = _particle_sdf(geom, state.x)
        # Rigid surface velocity at each particle.
        w, vo = geom.V_WB[:3], geom.V_WB[3:]
        v_rigid = vo + jnp.cross(
            jnp.broadcast_to(w, state.x.shape), state.x - geom.p_WB
        )
        v_rel = v - v_rigid
        vn = jnp.sum(v_rel * n, axis=-1)
        vt = v_rel - vn[..., None] * n
        active = phi < 0.0
        fn_mag = jnp.where(
            active,
            jnp.maximum(params.stiffness * (-phi) - params.damping * vn, 0.0),
            0.0,
        )
        vt_norm = jnp.linalg.norm(vt, axis=-1)
        ft = (
            -params.friction
            * fn_mag[..., None]
            * vt
            / jnp.maximum(vt_norm, params.slip_velocity)[..., None]
        )
        f = fn_mag[..., None] * n + ft  # per unit particle mass-scaled below
        # Force scaled by particle mass (penalty per-mass keeps stiffness
        # scale-free like the reference's mass-weighted grid penalty).
        f = f * state.mass[..., None]
        v = v + dt * f / state.mass[..., None]
        # Reaction on the rigid body: impulse -f*dt at particle positions.
        imp_lin = -dt * jnp.sum(f, axis=0)
        imp_tau = -dt * jnp.sum(
            jnp.cross(state.x - geom.p_WB, f), axis=0
        )
        impulses.append(jnp.concatenate([imp_tau, imp_lin]))
    return v, jnp.stack(impulses) if impulses else jnp.zeros((0, 6), v.dtype)


def coupled_substep(
    config: mpm.MpmConfig,
    contact: MpmContactParams,
    state: mpm.MpmState,
    geoms: Sequence[RigidGeom],
):
    """One MPM substep with rigid contact: returns (state, rigid impulses)."""
    grid = mpm.particle_to_grid(config, state)
    grid_vel = mpm.update_grid(config, grid)
    state = mpm.grid_to_particle(config, state, grid_vel)
    v_new, impulses = particle_rigid_contact(contact, state, geoms, config.dt)
    return state.replace(v=v_new), impulses


def simulate_coupled(
    config: mpm.MpmConfig,
    contact: MpmContactParams,
    state: mpm.MpmState,
    geoms: Sequence[RigidGeom],
    num_substeps: int,
):
    """Scan the coupled substeps; impulses accumulate over the rigid step.

    The caller divides the returned impulse sum by the rigid time step to get
    the external spatial forces for the SAP step
    (FinalizeExternalContactForces role).
    """

    def body(carry, _):
        s, acc = carry
        s, imp = coupled_substep(config, contact, s, geoms)
        return (s, acc + imp), None

    n_geoms = len(geoms)
    acc0 = jnp.zeros((n_geoms, 6), state.v.dtype)
    (state, acc), _ = jax.lax.scan(
        body, (state, acc0), None, length=num_substeps
    )
    return state, acc
