"""Codimensional (cloth) MLS-MPM — the fork's flagship deformable.

Re-derivation of the reference's cloth pipeline (reference: gpu_mpm/
cuda_mpm_kernels.cuh:184 calc_fem_state_and_force — per-face QR-based
tangent deformation, fixed-corotated in-plane energy + anisotropic
normal/shear penalties after Jiang et al. 2017; math_tools.cuh:90
compute_dphi_dF, :148 project_strain; settings.h:71-126 material constants)
with two TPU-native design changes:

  1. Total-Lagrangian faces: the cloth keeps its triangle mesh; per-face
     deformation F = d_world Dm^{-1} (3x2) is recomputed from vertex
     positions each substep (the reference instead integrates a per-face F
     with the affine field).  Elastic vertex forces come from jax.grad of
     the total energy — replacing the 56-line hand chain rule of
     compute_dphi_dF with autodiff, exact by construction.
  2. Particles = mesh vertices + face centroids (same as the reference's
     vertex+centroid scheme, cuda_mpm_model.cu), transferred through the
     standard MLS-MPM grid, which provides collision/self-collision
     response; elastic forces enter P2G as explicit vertex impulses.

Material: in-plane fixed corotated (2D) + quadratic normal-compression
penalty; strain limiting handled by the grid CFL at the reference's substep
sizes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.mpm import solver as mpm
from drake_tpu.utils.struct import pytree_dataclass


@dataclasses.dataclass(frozen=True)
class ClothConfig:
    """Cloth material constants (settings.h:71-126 values as defaults)."""

    youngs_modulus: float = 4e5
    poisson_ratio: float = 0.3
    density: float = 2000.0  # per area-thickness volume
    thickness: float = 1e-3
    normal_stiffness: float = 1e3  # K: normal-compression penalty

    @property
    def lame_2d(self):
        E, nu = self.youngs_modulus, self.poisson_ratio
        mu = E / (2 * (1 + nu))
        lam = E * nu / ((1 + nu) * (1 - nu))  # plane stress
        return mu, lam


@pytree_dataclass
class ClothState:
    """Vertex + face-centroid particle state plus face rest data."""

    x: jnp.ndarray  # (nv, 3) vertex positions
    v: jnp.ndarray  # (nv, 3) vertex velocities
    C: jnp.ndarray  # (nv, 3, 3) APIC affine field
    mass: jnp.ndarray  # (nv,)
    faces: jnp.ndarray  # (nf, 3) int32 vertex indices (static topology)
    Dm_inv: jnp.ndarray  # (nf, 2, 2) rest tangent-matrix inverse
    area: jnp.ndarray  # (nf,) rest areas


def make_grid_cloth(
    config: ClothConfig,
    nx: int,
    ny: int,
    origin=(0.3, 0.3, 0.7),
    size=(0.4, 0.4),
    dtype=jnp.float32,
    orientation: str = "xy",
) -> ClothState:
    """A regular nx x ny cloth patch (the RegisterMpmCloth sample maker)."""
    xs = np.linspace(0, size[0], nx)
    ys = np.linspace(0, size[1], ny)
    if orientation == "xy":
        pts = np.stack(
            [
                np.repeat(xs, ny) + origin[0],
                np.tile(ys, nx) + origin[1],
                np.full(nx * ny, origin[2]),
            ],
            axis=1,
        )
    else:  # "xz" vertical drape
        pts = np.stack(
            [
                np.repeat(xs, ny) + origin[0],
                np.full(nx * ny, origin[1]),
                np.tile(ys, nx) + origin[2],
            ],
            axis=1,
        )
    faces = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a = i * ny + j
            b = (i + 1) * ny + j
            c = i * ny + j + 1
            d = (i + 1) * ny + j + 1
            faces.append([a, b, c])
            faces.append([b, d, c])
    faces = np.asarray(faces, np.int32)
    return make_cloth_from_mesh(config, pts, faces, dtype)


def make_cloth_from_mesh(
    config: ClothConfig, pts, faces, dtype=jnp.float32
) -> ClothState:
    """Register an arbitrary triangle mesh as a cloth (RegisterMpmCloth,
    deformable_model.h:68 — the reference takes raw verts/faces too).

    Computes the rest tangent basis, rest areas and lumped vertex masses.
    """
    pts = np.asarray(pts, np.float64)
    faces = np.asarray(faces, np.int32)

    # Rest tangent basis per face (2D in the face plane).
    p = pts[faces]
    d1 = p[:, 1] - p[:, 0]
    d2 = p[:, 2] - p[:, 0]
    e1 = d1 / np.linalg.norm(d1, axis=1, keepdims=True)
    n = np.cross(d1, d2)
    area = 0.5 * np.linalg.norm(n, axis=1)
    n = n / np.linalg.norm(n, axis=1, keepdims=True)
    e2 = np.cross(n, e1)
    Dm = np.stack(
        [
            np.stack([np.sum(d1 * e1, 1), np.sum(d2 * e1, 1)], axis=1),
            np.stack([np.sum(d1 * e2, 1), np.sum(d2 * e2, 1)], axis=1),
        ],
        axis=1,
    )  # (nf, 2, 2)
    Dm_inv = np.linalg.inv(Dm)

    # Lumped vertex masses from face areas.
    m_face = config.density * config.thickness * area
    mass = np.zeros(len(pts))
    for k in range(3):
        np.add.at(mass, faces[:, k], m_face / 3.0)

    nv = len(pts)
    return ClothState(
        x=jnp.asarray(pts, dtype),
        v=jnp.zeros((nv, 3), dtype),
        C=jnp.zeros((nv, 3, 3), dtype),
        mass=jnp.asarray(mass, dtype),
        faces=jnp.asarray(faces),
        Dm_inv=jnp.asarray(Dm_inv, dtype),
        area=jnp.asarray(area, dtype),
    )


def merge_cloths(*cloths: ClothState) -> ClothState:
    """Concatenate cloth patches into one state (face indices re-offset).

    The reference registers each cloth separately (deformable_model.h:68
    RegisterMpmCloth, called once per cloth in mpm_three_clothes.cc) and the
    grid handles their mutual contact; here the same effect comes from one
    merged particle set sharing the background grid.
    """
    offsets = np.cumsum([0] + [c.x.shape[0] for c in cloths[:-1]])
    return ClothState(
        x=jnp.concatenate([c.x for c in cloths]),
        v=jnp.concatenate([c.v for c in cloths]),
        C=jnp.concatenate([c.C for c in cloths]),
        mass=jnp.concatenate([c.mass for c in cloths]),
        faces=jnp.concatenate(
            [c.faces + int(o) for c, o in zip(cloths, offsets)]
        ),
        Dm_inv=jnp.concatenate([c.Dm_inv for c in cloths]),
        area=jnp.concatenate([c.area for c in cloths]),
    )


def face_deformation(x, faces, Dm_inv):
    """F (nf, 3, 2): world tangent matrix times rest inverse."""
    p = x[faces]  # (nf, 3, 3)
    ds = jnp.stack([p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]], axis=2)  # (nf,3,2)
    return ds @ Dm_inv


def _qr_3x2(F):
    """Thin QR of (nf, 3, 2) by Gram-Schmidt: returns (Q (nf,3,2), R (nf,2,2))."""
    d1 = F[..., 0]
    d2 = F[..., 1]
    r11 = jnp.linalg.norm(d1, axis=-1)
    q1 = d1 / jnp.maximum(r11, 1e-12)[..., None]
    r12 = jnp.sum(q1 * d2, axis=-1)
    u2 = d2 - r12[..., None] * q1
    r22 = jnp.linalg.norm(u2, axis=-1)
    q2 = u2 / jnp.maximum(r22, 1e-12)[..., None]
    Q = jnp.stack([q1, q2], axis=-1)
    zero = jnp.zeros_like(r11)
    R = jnp.stack(
        [
            jnp.stack([r11, r12], axis=-1),
            jnp.stack([zero, r22], axis=-1),
        ],
        axis=-2,
    )
    return Q, R


def elastic_energy(config: ClothConfig, x, faces, Dm_inv, area):
    """Total in-plane elastic energy (fixed corotated on the 2x2 R factor).

    psi(R) = mu ||R - R_rot||^2 + lam/2 (det R - 1)^2  evaluated via the QR
    of F: for the in-plane 2x2 part the corotated energy reduces to
    mu sum (sigma_i - 1)^2 with sigma from R (plane-stress Lame).
    """
    mu, lam = config.lame_2d
    F = face_deformation(x, faces, Dm_inv)
    _, R = _qr_3x2(F)
    # 2x2 polar-based invariants from R (right factor has same singular
    # values as F).
    # SVD of 2x2 done in closed form for stability.
    a, b = R[..., 0, 0], R[..., 0, 1]
    d = R[..., 1, 1]
    # Corotated 2D energy via invariants only:  sum (s_i - 1)^2
    # = ||F||^2 - 2(s1 + s2) + 2  with  s1 + s2 = sqrt(||F||^2 + 2 det)
    # (det >= 0 by QR).  The (s1 - s2) split is deliberately avoided: its
    # sqrt has an infinite gradient at the rest state.
    t1 = a * a + b * b + d * d
    det = a * d
    s_sum = jnp.sqrt(jnp.maximum(t1 + 2 * det, 1e-12))
    psi = mu * (t1 - 2.0 * s_sum + 2.0) + 0.5 * lam * (det - 1.0) ** 2
    vol = area * config.thickness
    return jnp.sum(psi * vol)


def vertex_forces(config: ClothConfig, state: ClothState):
    """Elastic vertex forces -dE/dx (the compute_dphi_dF role, via autodiff)."""
    return -jax.grad(
        lambda xx: elastic_energy(
            config, xx, state.faces, state.Dm_inv, state.area
        )
    )(state.x)


def _to_mpm_state(grid_config: mpm.MpmConfig, cloth: ClothState, f_ext):
    """Pack cloth vertices (with force-kick applied) as MPM particles."""
    dt = grid_config.dt
    v_kicked = cloth.v + dt * f_ext / cloth.mass[:, None]
    n = cloth.x.shape[0]
    dtype = cloth.x.dtype
    return mpm.MpmState(
        x=cloth.x,
        v=v_kicked,
        F=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (n, 3, 3)),
        C=cloth.C,
        volume=jnp.zeros((n,), dtype),  # no volumetric stress for cloth
        mass=cloth.mass,
    )


def cloth_substep(
    grid_config: mpm.MpmConfig,
    cloth_config: ClothConfig,
    state: ClothState,
    rigid_geoms=(),
    contact_params=None,
    contact_model: str = "penalty",
) -> Tuple[ClothState, jnp.ndarray]:
    """One cloth MPM substep: FEM kick -> P2G -> grid -> G2P -> advect.

    Returns (state, rigid impulse accumulator (n_geoms, 6)).
    Mirrors the reference's substep loop (deformable_driver.h:240-260) with
    the CPU contact query replaced by on-device SDFs
    (drake_tpu.mpm.coupling).

    contact_model="implicit" routes rigid contact through the grid-level
    contact Newton (mpm/grid_contact.py, UpdateContact role) INSIDE the
    grid stage — stiction-capable and stable at stiff k*dt, the solver the
    fork's cloth demos (bagging, tshirt) run; "penalty" applies the
    explicit per-particle model after G2P.
    """
    f_el = vertex_forces(cloth_config, state)
    p = _to_mpm_state(grid_config, state, f_el)

    if rigid_geoms and contact_model == "implicit":
        from drake_tpu.mpm import grid_contact as gcmod

        gc_params = gcmod.GridContactParams(
            **(
                dict(
                    stiffness=contact_params.stiffness,
                    damping=contact_params.damping,
                    friction=contact_params.friction,
                    slip_velocity=contact_params.slip_velocity,
                )
                if contact_params is not None
                else {}
            )
        )
        grid = mpm.particle_to_grid(grid_config, p)
        grid_vel = mpm.update_grid(grid_config, grid)
        sol = gcmod.solve_grid_contact(
            grid_config, gc_params, p, grid.mass, grid_vel, rigid_geoms
        )
        p = mpm.grid_to_particle(grid_config, p, sol.grid_vel)
        new_state = state.replace(x=p.x, v=p.v, C=p.C)
        return new_state, sol.impulses

    grid = mpm.particle_to_grid(grid_config, p)
    grid_vel = mpm.update_grid(grid_config, grid)
    p = mpm.grid_to_particle(grid_config, p, grid_vel)

    if rigid_geoms:
        from drake_tpu.mpm import coupling as cpl

        v_new, impulses = cpl.particle_rigid_contact(
            contact_params or cpl.MpmContactParams(),
            p,
            rigid_geoms,
            grid_config.dt,
        )
        p = p.replace(v=v_new)
    else:
        impulses = jnp.zeros((0, 6), state.x.dtype)

    new_state = state.replace(x=p.x, v=p.v, C=p.C)
    return new_state, impulses


def simulate_cloth(
    grid_config, cloth_config, state, num_substeps: int,
    rigid_geoms=(), contact_params=None, contact_model: str = "penalty",
):
    def body(carry, _):
        s, acc = carry
        s, imp = cloth_substep(
            grid_config, cloth_config, s, rigid_geoms, contact_params,
            contact_model=contact_model,
        )
        acc = acc + imp if imp.shape == acc.shape else acc
        return (s, acc), None

    acc0 = jnp.zeros((max(len(rigid_geoms), 0), 6), state.x.dtype)
    (state, acc), _ = jax.lax.scan(
        body, (state, acc0), None, length=num_substeps
    )
    return state, acc
