"""Collision scene: geometries on bodies, static pair lists, on-device queries.

SceneGraph analog (reference: geometry/scene_graph.h, geometry/query_object.h)
with the TPU design constraints: the set of collision pairs and the number of
contact points per pair are STATIC (decided at scene-build time on the host);
queries return fixed-size arrays with a validity mask.  This replaces the
reference's dynamic broad phase — fine at robot scale, and it is what lets
the whole contact problem live inside one jitted step.

Point-contact generation per pair type (contacts per pair):
  sphere-halfspace: 1      sphere-sphere: 1       sphere-box: 1
  capsule-halfspace: 2     capsule-sphere: 1      box-halfspace: 8 (corners)
  capsule-capsule: 1

Each contact reports: phi (signed distance), contact point p_W, unit normal
n_W pointing from geometry B into geometry A, and the body indices — enough
to build the contact Jacobian against the multibody tree.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.geometry import scene_graph
from drake_tpu.geometry import shapes as sh
from drake_tpu.multibody import kinematics as kin
from drake_tpu.multibody.model import MultibodyModel, MultibodyParams


@dataclasses.dataclass(frozen=True)
class CollisionGeometry:
    """A shape rigidly attached to a body (body -1 = world/anchored)."""

    name: str
    body: int
    shape: object
    R_BG: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(3)
    )
    p_BG: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3)
    )
    # Contact material (SAP point-contact parameters; Drake's
    # geometry/proximity_properties.h stiffness/dissipation/friction).
    stiffness: float = 1e6
    dissipation: float = 0.1  # SAP relaxation time tau_d [s]
    # Hydroelastic contact (the reference's compliant-surface pipeline,
    # query_object.h:385 ComputeContactSurfaces): when set, supported pairs
    # generate a QUADRATURE PATCH of weighted contact points over the
    # contact cap instead of a single point — the TPU-static replacement
    # for marching contact-surface meshes.  The value is the hydroelastic
    # modulus E (Pa); per-point stiffness = E * A_i / R (pressure p = E
    # phi-hat integrated over the sample's area).  Patch extents give
    # rolling resistance and torsional friction that point contact cannot.
    hydroelastic_modulus: Optional[float] = None
    hydro_rings: int = 1  # quadrature rings (points = 1 + 6 + 12 + ...)
    # Patch radius for GENERIC SDF carriers (Cylinder/Ellipsoid/MeshSdf):
    # the tangent-disk extent of the SDF-projected quadrature patch.
    # None -> 0.7 x the shape's foundation depth (the sphere-cap default).
    hydro_patch_radius: Optional[float] = None
    friction: float = 1.0
    # Role bitmask (scene_graph.PROXIMITY | ILLUSTRATION | PERCEPTION) —
    # the geometry_roles.h assignment: only proximity-role geometries
    # enter collision candidate pairs; visualizers/cameras select by the
    # other roles (scene_graph.geometries_with_role).
    roles: int = scene_graph.ALL_ROLES


class ContactData(NamedTuple):
    """Fixed-size batch of potential point contacts."""

    phi: jnp.ndarray  # (nc,)
    p_W: jnp.ndarray  # (nc, 3) contact point (midpoint of witnesses)
    n_W: jnp.ndarray  # (nc, 3) unit normal, from B into A
    body_a: Tuple[int, ...]  # static body index per contact
    body_b: Tuple[int, ...]
    stiffness: jnp.ndarray  # (nc,) combined stiffness
    dissipation: jnp.ndarray  # (nc,)
    friction: jnp.ndarray  # (nc,)


def _combine_materials(ga: CollisionGeometry, gb: CollisionGeometry):
    """Combined point-contact parameters (Drake's series-spring combination
    k = ka*kb/(ka+kb); friction/dissipation averaged as in
    multibody/plant/coulomb_friction.h CalcContactFrictionFromSurfaceProperties)."""
    k = ga.stiffness * gb.stiffness / (ga.stiffness + gb.stiffness)
    mu = 2.0 * ga.friction * gb.friction / (ga.friction + gb.friction)
    d = ga.dissipation + gb.dissipation
    return k, d, mu


@dataclasses.dataclass(frozen=True)
class CollisionScene:
    """Static description of all geometries and candidate pairs."""

    geometries: Tuple[CollisionGeometry, ...]
    pairs: Tuple[Tuple[int, int], ...]  # indices into geometries

    @staticmethod
    def build(
        geometries: Sequence[CollisionGeometry],
        exclude_same_body: bool = True,
        exclude: Sequence[Tuple[str, str]] = (),
        model: Optional[MultibodyModel] = None,
        filter_manager: Optional["scene_graph.CollisionFilterManager"] = None,
    ) -> "CollisionScene":
        """Enumerate candidate pairs (static broad phase).

        When ``model`` is given, pairs on parent-child adjacent bodies are
        filtered out — the ApplyDefaultCollisionFilters role
        (multibody_plant.cc:1228).  ``filter_manager`` applies user
        CollisionFilterDeclarations (collision_filter_manager.h), and
        geometries without the proximity role never enter pairs
        (geometry_state.h role gating)."""
        pairs = []
        excl = {frozenset(e) for e in exclude}

        def adjacent(ba: int, bb: int) -> bool:
            if model is None or ba < 0 or bb < 0:
                return False
            return model.parent[ba] == bb or model.parent[bb] == ba

        for i, j in itertools.combinations(range(len(geometries)), 2):
            gi, gj = geometries[i], geometries[j]
            if not (scene_graph.has_role(gi, scene_graph.PROXIMITY)
                    and scene_graph.has_role(gj, scene_graph.PROXIMITY)):
                continue
            if exclude_same_body and gi.body == gj.body:
                continue
            if adjacent(gi.body, gj.body):
                continue
            if frozenset((gi.name, gj.name)) in excl:
                continue
            if filter_manager is not None and filter_manager.is_filtered(
                    gi.name, gj.name):
                continue
            if isinstance(gi.shape, sh.HalfSpace) and isinstance(
                gj.shape, sh.HalfSpace
            ):
                continue
            pairs.append((i, j))
        return CollisionScene(geometries=tuple(geometries), pairs=tuple(pairs))

    @property
    def num_contacts(self) -> int:
        return sum(_contacts_per_pair(self.geometries[i], self.geometries[j])
                   for i, j in self.pairs)

    def query(
        self,
        model: MultibodyModel,
        params: MultibodyParams,
        q,
        broad_phase: bool = True,
        broad_phase_margin: float = 0.1,
    ) -> ContactData:
        """Compute all candidate contacts at configuration q (on device).

        ``broad_phase``: gate MESH-involving narrow phases behind an AABB
        overlap test (``lax.cond`` — the vertex/face FLOPs are genuinely
        skipped for separated pairs, the reference's BVH-culling role,
        geometry/proximity/bvh.h).  Culled pairs report phi =
        +broad_phase_margin (inactive for any SAP/penalty consumer).
        Analytic pairs are too cheap to gate.
        """
        R_WB, p_WB = kin.forward_kinematics(model, params, q)
        dtype = q.dtype

        def geom_pose(g: CollisionGeometry):
            R_BG = jnp.asarray(g.R_BG, dtype)
            p_BG = jnp.asarray(g.p_BG, dtype)
            if g.body < 0:
                return R_BG, p_BG
            R = R_WB[g.body] @ R_BG
            p = p_WB[g.body] + R_WB[g.body] @ p_BG
            return R, p

        aabbs = {}
        if broad_phase:
            from drake_tpu.geometry import mesh_contact as mc

            for k, g in enumerate(self.geometries):
                Rg, pg = geom_pose(g)
                aabbs[k] = mc.shape_aabb(g.shape, Rg, pg, dtype)

        phis, pws, nws = [], [], []
        body_a, body_b = [], []
        ks, ds, mus = [], [], []
        for i, j in self.pairs:
            ga, gb = self.geometries[i], self.geometries[j]
            Ra, pa = geom_pose(ga)
            Rb, pb = geom_pose(gb)
            gate = broad_phase and (
                isinstance(ga.shape, sh.Mesh) or isinstance(gb.shape, sh.Mesh)
            )
            if gate:
                from drake_tpu.geometry import mesh_contact as mc

                ok = mc.aabb_overlap(
                    *aabbs[i], *aabbs[j], margin=broad_phase_margin
                )
                m = _contacts_per_pair(ga, gb)

                def compute(_):
                    entries = _pair_contacts(ga, Ra, pa, gb, Rb, pb, dtype)
                    return (
                        jnp.stack([e[0] for e in entries]),
                        jnp.stack([e[1] for e in entries]),
                        jnp.stack([e[2] for e in entries]),
                        # Hydro rows carry a per-point area weight in
                        # slot 3 — it must survive the cond (dropping it
                        # silently turns patch quadrature into full-
                        # stiffness point rows).
                        jnp.stack(
                            [
                                jnp.asarray(
                                    e[3] if len(e) == 4 else 1.0, dtype
                                )
                                for e in entries
                            ]
                        ),
                    )

                def culled(_):
                    return (
                        jnp.full((m,), broad_phase_margin, dtype),
                        jnp.zeros((m, 3), dtype),
                        jnp.tile(
                            jnp.asarray([0.0, 0.0, 1.0], dtype)[None], (m, 1)
                        ),
                        jnp.ones((m,), dtype),
                    )

                phi_g, p_g, n_g, ks_g = jax.lax.cond(ok, compute, culled, 0)
                contacts = [
                    (phi_g[k2], p_g[k2], n_g[k2], ks_g[k2])
                    for k2 in range(m)
                ]
            else:
                contacts = _pair_contacts(ga, Ra, pa, gb, Rb, pb, dtype)
            k, d, mu = _combine_materials(ga, gb)
            hp = _hydro_pair(ga, gb)
            if hp is not None:
                # Per-point stiffness is the (combined) modulus scaled by
                # the quadrature k_scale = A_i / length.
                k = _hydro_modulus(*hp)
            for entry in contacts:
                phi, p_W, n_W = entry[:3]
                k_scale = entry[3] if len(entry) == 4 else 1.0
                phis.append(phi)
                pws.append(p_W)
                nws.append(n_W)
                body_a.append(ga.body)
                body_b.append(gb.body)
                ks.append(k * k_scale)
                ds.append(d)
                mus.append(mu)

        if not phis:  # geometry-free scene (e.g. joint-limits-only plants)
            return ContactData(
                phi=jnp.zeros((0,), dtype),
                p_W=jnp.zeros((0, 3), dtype),
                n_W=jnp.zeros((0, 3), dtype),
                body_a=(),
                body_b=(),
                stiffness=jnp.zeros((0,), dtype),
                dissipation=jnp.zeros((0,), dtype),
                friction=jnp.zeros((0,), dtype),
            )
        return ContactData(
            phi=jnp.stack(phis),
            p_W=jnp.stack(pws),
            n_W=jnp.stack(nws),
            body_a=tuple(body_a),
            body_b=tuple(body_b),
            # k entries can be traced (pose-dependent quadrature weights,
            # e.g. the capsule end-cap clip) — stack, don't np.array.
            stiffness=jnp.stack([jnp.asarray(k, dtype) for k in ks]),
            dissipation=jnp.asarray(np.array(ds), dtype),
            friction=jnp.asarray(np.array(mus), dtype),
        )


def _contacts_per_pair(ga: CollisionGeometry, gb: CollisionGeometry) -> int:
    a, b = ga.shape, gb.shape
    kinds = (type(a).__name__, type(b).__name__)
    table = {
        frozenset(("Sphere", "HalfSpace")): 1,
        frozenset(("Sphere",)): 1,
        frozenset(("Sphere", "Box")): 1,
        frozenset(("Capsule", "HalfSpace")): 2,
        frozenset(("Capsule", "Sphere")): 1,
        frozenset(("Capsule",)): 1,
        frozenset(("Box", "HalfSpace")): 8,
        frozenset(("Box",)): 8,
        frozenset(("Capsule", "Box")): 3,
        frozenset(("Sphere", "Cylinder")): 1,
        frozenset(("Capsule", "Cylinder")): 2,
        frozenset(("Box", "Cylinder")): 8,
        frozenset(("Cylinder", "HalfSpace")): 6,
        frozenset(("Cylinder",)): 12,
        frozenset(("Sphere", "Ellipsoid")): 1,
        frozenset(("Capsule", "Ellipsoid")): 2,
        frozenset(("Box", "Ellipsoid")): 8,
        frozenset(("Ellipsoid", "HalfSpace")): 1,
    }
    if _hydro_pair(ga, gb) is not None:
        # Hydro takes precedence (matches _pair_contacts dispatch order).
        g_soft, _ = _hydro_pair(ga, gb)
        return _hydro_count(g_soft)
    a_sdf, b_sdf = isinstance(a, sh.MeshSdf), isinstance(b, sh.MeshSdf)
    if isinstance(a, sh.Mesh) and isinstance(b, sh.Mesh):
        if a_sdf or b_sdf:
            # Vertex-vs-grid per available grid direction (non-convex OK).
            n = 0
            if a_sdf:
                n += min(8, b.num_vertices)
            if b_sdf:
                n += min(8, a.num_vertices)
            return n
        # Vertex-vs-hull both ways (K deepest each direction) + K
        # edge-edge (SAT cross-axis) rows.
        return min(4, a.num_vertices) + min(4, b.num_vertices) + 4
    if a_sdf or b_sdf:
        ms = a if a_sdf else b
        other = b if a_sdf else a
        if isinstance(other, sh.Sphere):
            return 1  # exact center-vs-grid
        if isinstance(other, sh.Box):
            return 8 + min(4, ms.num_vertices)
        if isinstance(other, sh.Capsule):
            return 3 + min(4, ms.num_vertices)
        return min(8, ms.num_vertices)  # HalfSpace: sampled verts
    if isinstance(a, sh.Mesh) or isinstance(b, sh.Mesh):
        # Mesh vs SDF shape: top-K deepest sampled vertices.
        mesh = a if isinstance(a, sh.Mesh) else b
        return min(8, mesh.num_vertices)
    return table[frozenset(kinds)]


def _hydro_pair(ga, gb):
    """(g_soft, g_other) if this pair renders a hydroelastic patch.

    General quadrature-patch support (the stand-in for the reference's
    marching contact-surface meshes, geometry/proximity/
    mesh_intersection.h + field_intersection.h): the patch lives on the
    SOFTER compliant geometry (Sphere, Box, or Capsule) and integrates the
    elastic-foundation pressure against ANY SDF shape (HalfSpace, Sphere,
    Box, Capsule).  Both-compliant pairs use the series-combined modulus
    (_hydro_modulus)."""

    def soft(g):
        # Any SDF shape can CARRY the patch: Sphere/Box/Capsule take the
        # shape-specialized quadratures; Cylinder/Ellipsoid/MeshSdf take
        # the generic SDF-projected patch (reference role:
        # geometry/proximity/field_intersection.h — tessellated pressure
        # fields exist for every shape; here every SDF shape projects a
        # quadrature patch instead).
        return g.hydroelastic_modulus is not None and isinstance(
            g.shape,
            (sh.Sphere, sh.Box, sh.Capsule, sh.Cylinder, sh.Ellipsoid,
             sh.MeshSdf),
        )

    def sdf_ok(g):
        return isinstance(
            g.shape,
            (sh.HalfSpace, sh.Sphere, sh.Box, sh.Capsule, sh.Cylinder,
             sh.Ellipsoid, sh.MeshSdf),
        )

    ok_a = soft(ga) and sdf_ok(gb)
    ok_b = soft(gb) and sdf_ok(ga)
    if ok_a and ok_b:
        return (
            (ga, gb)
            if ga.hydroelastic_modulus <= gb.hydroelastic_modulus
            else (gb, ga)
        )
    if ok_a:
        return ga, gb
    if ok_b:
        return gb, ga
    return None


def _other_sdf(g_other, R_o, p_o, x):
    """phi + outward normal of the rigid/other side at point(s) x."""
    s = g_other.shape
    if isinstance(s, sh.HalfSpace):
        phi, n = sh.halfspace_sdf_point(R_o, p_o, x)
        return phi, jnp.broadcast_to(n, jnp.shape(x))
    if isinstance(s, sh.Sphere):
        return sh.sphere_sdf_point(R_o, p_o, s.radius, x)
    if isinstance(s, sh.Box):
        return sh.box_sdf_point(R_o, p_o, s.size, x)
    if isinstance(s, sh.MeshSdf):
        return sh.mesh_sdf_point(R_o, p_o, s, x)
    if isinstance(s, sh.Cylinder):
        return sh.cylinder_sdf_point(R_o, p_o, s.radius, s.length, x)
    if isinstance(s, sh.Ellipsoid):
        return sh.ellipsoid_sdf_point(R_o, p_o, s.radii, x)
    return sh.capsule_sdf_point(R_o, p_o, s.radius, s.length, x)


def _hydro_modulus(g_soft, g_other) -> float:
    """Combined modulus: series combination when both are compliant (the
    reference's compliant-compliant pressure-field equilibrium)."""
    Ea = g_soft.hydroelastic_modulus
    Eb = g_other.hydroelastic_modulus
    if Eb is None:
        return Ea
    return Ea * Eb / (Ea + Eb)


def _hydro_patch(g_soft, R_s, p_s, g_other, R_o, p_o, dtype):
    """Quadrature patch on the soft geometry's surface vs the other's SDF.

    Returns [(phi, p_W, n_W, k_scale)]: per-point stiffness is the
    combined modulus times k_scale = A_i / h_depth, so the pair integrates
    the elastic-foundation pressure p = E * depth / h_depth over the patch
    (the reference's hydroelastic pressure-field semantics — quadrature
    instead of marching contact-surface meshes).  h_depth: sphere/capsule
    radius, box half-extent along the face normal.  Normals come from the
    other side's SDF (pointing from the other INTO the soft geometry).

    Sphere and capsule patches are DIRECTION-AWARE: points concentrate in
    a pi/4 cap/band facing the other geometry (direction = the other's SDF
    normal at the soft center), which keeps the narrow contact strip well
    sampled; box patches are full face grids (pose-independent)."""
    import math

    s = g_soft.shape
    rings = g_soft.hydro_rings
    samples = []  # (x_W, k_scale)

    def cap_samples(center, r, n_dir, cap_rings):
        """Direction-aware spherical-cap quadrature: hex rings with exact
        band areas over a pi/4 half-angle cap (covers d <= 0.3 R)."""
        F = contact_frame(n_dir)
        t1, t2 = F[:, 0], F[:, 1]
        alpha_max = math.pi / 4
        denom = cap_rings + 0.5
        edges = [alpha_max * (j + 0.5) / denom for j in range(cap_rings + 1)]
        A0 = 2 * math.pi * r * r * (1 - math.cos(edges[0]))
        out = [(center - r * n_dir, A0 / r)]
        for jr in range(1, cap_rings + 1):
            alpha = alpha_max * jr / denom
            band = 2 * math.pi * r * r * (
                math.cos(edges[jr - 1]) - math.cos(edges[jr])
            )
            npts = 6 * jr
            for m in range(npts):
                beta = 2 * math.pi * m / npts
                dv = (
                    -n_dir * math.cos(alpha)
                    + (t1 * math.cos(beta) + t2 * math.sin(beta))
                    * math.sin(alpha)
                )
                out.append((center + r * dv, band / npts / r))
        return out

    if isinstance(s, sh.Sphere):
        _, n_dir = _other_sdf(g_other, R_o, p_o, p_s)
        samples += cap_samples(p_s, s.radius, n_dir, rings)

    elif isinstance(s, sh.Box):
        half = [sz / 2.0 for sz in s.size]
        n = rings + 1
        for axis in range(3):
            i, j = (axis + 1) % 3, (axis + 2) % 3
            A_cell = (2 * half[i]) * (2 * half[j]) / (n * n)
            for sgn in (-1.0, 1.0):
                for mi in range(n):
                    for mj in range(n):
                        loc = [0.0, 0.0, 0.0]
                        loc[axis] = sgn * half[axis]
                        loc[i] = -half[i] + (mi + 0.5) * 2 * half[i] / n
                        loc[j] = -half[j] + (mj + 0.5) * 2 * half[j] / n
                        x = p_s + R_s @ jnp.asarray(loc, dtype)
                        samples.append((x, A_cell / half[axis]))

    elif isinstance(s, sh.Capsule):
        # Direction-aware band on the cylinder + end caps.
        r, L = s.radius, s.length
        _, n_dir = _other_sdf(g_other, R_o, p_o, p_s)
        axis_W = R_s[:, 2]
        # Circumferential "down" direction: n_dir with the axis component
        # removed (a capsule's cylinder can only contact sideways).
        side = -n_dir + axis_W * jnp.dot(axis_W, n_dir)
        side = side / jnp.maximum(jnp.linalg.norm(side), 1e-9)
        t_perp = jnp.cross(axis_W, side)
        phi_max = math.pi / 4
        n_ax = rings + 2
        n_circ = 2 * rings + 1
        dphi = 2 * phi_max / n_circ
        A_cell = (L / n_ax) * (r * dphi)
        for ia in range(n_ax):
            z = -L / 2 + (ia + 0.5) * L / n_ax
            for ic in range(n_circ):
                phi_c = -phi_max + (ic + 0.5) * dphi
                dv = side * math.cos(phi_c) + t_perp * math.sin(phi_c)
                samples.append((p_s + axis_W * z + r * dv, A_cell / r))
        # End caps: the sphere cap quadrature at each end, direction-aware,
        # CLIPPED to the axis-outward hemisphere (the cylinder band already
        # covers the inward half; without the clip a lying capsule double-
        # counts half of each cap).  Boundary points get half weight.
        cap_rings = max(1, rings // 2)
        tol = 0.05 * r
        for endsgn in (-1.0, 1.0):
            e = p_s + endsgn * axis_W * (L / 2)
            for x, k_scale in cap_samples(e, r, n_dir, cap_rings):
                comp = jnp.dot(x - e, endsgn * axis_W)
                w_clip = jnp.where(
                    comp > tol, 1.0, jnp.where(comp < -tol, 0.0, 0.5)
                )
                samples.append((x, k_scale * w_clip))

    else:
        # GENERIC SDF carrier (Cylinder / Ellipsoid / MeshSdf): an
        # SDF-projected tangent-disk quadrature.  Seed = the other body's
        # origin projected onto the soft surface by Newton steps on the
        # soft SDF (x <- x - phi grad phi); a polar grid on the tangent
        # plane at the seed is then re-projected onto the surface the same
        # way, with flat-disk band areas as weights.  This is what unlocks
        # hydro patches on PARSED MESHES (reference:
        # geometry/proximity/field_intersection.h computes tessellated
        # pressure-field intersections for every shape; the quadrature
        # patch is the TPU-static stand-in).
        h_depth = _hydro_depth(g_soft)
        rho = (
            g_soft.hydro_patch_radius
            if g_soft.hydro_patch_radius is not None
            else 0.7 * h_depth
        )

        def soft_sdf(x):
            return _other_sdf(g_soft, R_s, p_s, x)

        def project(x, steps=3):
            for _ in range(steps):
                phi, nrm = soft_sdf(x)
                x = x - phi[..., None] * nrm if phi.ndim else x - phi * nrm
            return x

        seed = project(p_o, steps=5)
        _, m_n = soft_sdf(seed)
        F = contact_frame(m_n)
        t1, t2 = F[:, 0], F[:, 1]
        denom = rings + 0.5
        # Center sample: disk of radius rho*0.5/denom.
        A0 = math.pi * (rho * 0.5 / denom) ** 2
        samples.append((seed, A0 / h_depth))
        for jr in range(1, rings + 1):
            r_j = rho * jr / denom
            r_lo = rho * (jr - 0.5) / denom
            r_hi = rho * (jr + 0.5) / denom if jr < rings else rho
            band = math.pi * (r_hi**2 - r_lo**2)
            npts = 6 * jr
            for mi in range(npts):
                beta = 2 * math.pi * mi / npts
                x0 = seed + r_j * (
                    t1 * math.cos(beta) + t2 * math.sin(beta)
                )
                samples.append((project(x0), band / npts / h_depth))

    out = []
    for x, k_scale in samples:
        phi, n_W = _other_sdf(g_other, R_o, p_o, x)
        out.append((phi, x, n_W, k_scale))
    return out


def _hydro_depth(g_soft) -> float:
    """Foundation depth of a generic SDF carrier: the (approximate) max
    interior distance — sphere radius analogue for the elastic-foundation
    pressure p = E * phi / h_depth."""
    s = g_soft.shape
    if isinstance(s, sh.Sphere):
        return float(s.radius)
    if isinstance(s, sh.Cylinder):
        return float(min(s.radius, s.length / 2.0))
    if isinstance(s, sh.Ellipsoid):
        return float(min(s.radii))
    if isinstance(s, sh.MeshSdf):
        return float(-np.min(np.asarray(s.grid)))
    if isinstance(s, sh.Capsule):
        return float(s.radius)
    if isinstance(s, sh.Box):
        return float(min(s.size) / 2.0)
    raise ValueError(f"no hydro foundation depth for {type(s).__name__}")


def _hydro_count(g_soft) -> int:
    """Static contact count of a hydro patch (must match _hydro_patch)."""
    r = g_soft.hydro_rings
    if isinstance(g_soft.shape, sh.Box):
        return 6 * (r + 1) ** 2
    if isinstance(g_soft.shape, sh.Capsule):
        rc = max(1, r // 2)
        return (r + 2) * (2 * r + 1) + 2 * (1 + 3 * rc * (rc + 1))
    return 1 + 3 * r * (r + 1)


def _spread_deepest(phi, pts, K: int):
    """Indices of K deep contact vertices with SPATIAL SPREAD.

    Pure top-K-by-depth can put every manifold point on one face edge
    (box-stack chatter on decimated meshes); this takes the deepest vertex,
    then greedily adds the candidate maximizing (depth + spread) from a
    4K-deep candidate pool — a farthest-point-style manifold, the role of
    the reference's contact-surface polygon centroids.  Static shapes,
    fixed trip count."""
    Kc = min(4 * K, phi.shape[0])
    negd, cand = jax.lax.top_k(-phi, Kc)  # candidate pool, deepest first
    depth = negd  # = -phi, larger is deeper
    p_c = pts[cand]  # (Kc, 3)
    # Scale so depth and distance compete on comparable units.
    span = jnp.maximum(
        jnp.max(jnp.linalg.norm(p_c - p_c[0], axis=1)), 1e-6
    )
    picked = jnp.zeros((K,), jnp.int32)
    mind = jnp.full((Kc,), jnp.inf, phi.dtype)
    taken = jnp.zeros((Kc,), bool)

    def body(carry, k):
        picked, mind, taken = carry
        d2new = jnp.linalg.norm(p_c - p_c[picked[jnp.maximum(k - 1, 0)]],
                                axis=1)
        mind = jnp.where(k > 0, jnp.minimum(mind, d2new), mind)
        score = depth + 0.5 * jnp.where(k > 0, mind, 0.0) / span * (
            jnp.max(depth) - jnp.min(depth) + 1e-6
        ) + jnp.where(k > 0, mind, 0.0)
        score = jnp.where(taken, -jnp.inf, score)
        j = jnp.argmax(score)
        picked = picked.at[k].set(j.astype(jnp.int32))
        taken = taken.at[j].set(True)
        return (picked, mind, taken), None

    (picked, _, _), _ = jax.lax.scan(
        body, (picked, mind, taken), jnp.arange(K)
    )
    return cand[picked]


def _cylinder_rim_points(R_WG, p_WG, radius, length, toward_W):
    """6 rim sample points (3 per cap, at the support direction and ±120°
    around the axis) biased toward ``toward_W``.  Lying: the 0° pair is
    the deepest line contact; standing: the bottom-rim triple is an
    equal-depth tripod (stable support polygon)."""
    axis = R_WG[:, 2]
    d = toward_W - jnp.dot(toward_W, axis) * axis
    nd = jnp.linalg.norm(d)
    u = jnp.where(nd > 1e-9, d / jnp.maximum(nd, 1e-9), R_WG[:, 0])
    v = jnp.cross(axis, u)
    pts = []
    for s in (-0.5, 0.5):
        c = p_WG + s * length * axis
        for th in (0.0, 2.0944, -2.0944):  # 0, +-120 deg
            pts.append(c + radius * (jnp.cos(th) * u + jnp.sin(th) * v))
    return jnp.stack(pts)


def _pair_contacts(ga, Ra, pa, gb, Rb, pb, dtype):
    """Returns a list of (phi, p_W, n_W[, k_scale]) with n_W pointing from
    B into A; optional k_scale multiplies the pair's combined stiffness."""
    a, b = ga.shape, gb.shape

    hp = _hydro_pair(ga, gb)
    if hp is not None:
        g_soft, g_other = hp
        soft_first = g_soft is ga
        R_s, p_s = (Ra, pa) if soft_first else (Rb, pb)
        R_o, p_o = (Rb, pb) if soft_first else (Ra, pa)
        out = _hydro_patch(g_soft, R_s, p_s, g_other, R_o, p_o, dtype)
        if not soft_first:
            # Patch normals point from the other geometry INTO the soft
            # one; the ContactData convention is from B into A.
            out = [(phi, p, -n, w) for (phi, p, n, w) in out]
        return out
    # Normalize the order so each handler sees a canonical (A, B).
    if (isinstance(b, sh.Mesh) and not isinstance(a, sh.Mesh)) or (
        not isinstance(a, sh.Mesh)
        and (
            isinstance(a, sh.HalfSpace)
            or (
                isinstance(a, sh.Box)
                and isinstance(b, (sh.Sphere, sh.Capsule))
            )
            or (isinstance(a, sh.Sphere) and isinstance(b, sh.Capsule))
            or (
                isinstance(a, sh.Cylinder)
                and isinstance(b, (sh.Sphere, sh.Capsule, sh.Box))
            )
            or (
                isinstance(a, sh.Ellipsoid)
                and isinstance(b, (sh.Sphere, sh.Capsule, sh.Box))
            )
        )
    ):
        # Swap so the 'larger/static' shape is B; flip resulting normals.
        out = _pair_contacts(gb, Rb, pb, ga, Ra, pa, dtype)
        return [(phi, p, -n) for phi, p, n in out]

    if isinstance(a, sh.Box) and isinstance(b, sh.Box):
        from drake_tpu.geometry import box_collision as bc

        phi, p_W, n_W = bc.box_box_contacts(
            Ra, pa, a.size, Rb, pb, b.size
        )
        return [(phi[k], p_W[k], n_W[k]) for k in range(8)]

    if isinstance(a, sh.Capsule) and isinstance(b, sh.Box):
        from drake_tpu.geometry import box_collision as bc

        phi, p_W, n_W = bc.capsule_box_contacts(
            Ra, pa, a.radius, a.length, Rb, pb, b.size
        )
        return [(phi[k], p_W[k], n_W[k]) for k in range(3)]

    if isinstance(a, sh.Sphere) and isinstance(b, sh.HalfSpace):
        phi_c, n_W = sh.halfspace_sdf_point(Rb, pb, pa)
        phi = phi_c - a.radius
        p_W = pa - n_W * (a.radius + 0.5 * phi)
        return [(phi, p_W, n_W)]

    if isinstance(a, sh.Sphere) and isinstance(b, sh.Ellipsoid):
        phi_c, n_W = sh.ellipsoid_sdf_point(Rb, pb, b.radii, pa)
        phi = phi_c - a.radius
        p_W = pa - n_W * (a.radius + 0.5 * phi)
        return [(phi, p_W, n_W)]

    if isinstance(a, sh.Capsule) and isinstance(b, sh.Ellipsoid):
        e1, e2 = sh.capsule_segment_points(Ra, pa, a.length)
        out = []
        for e in (e1, e2):
            phi_c, n_W = sh.ellipsoid_sdf_point(Rb, pb, b.radii, e)
            phi = phi_c - a.radius
            out.append((phi, e - n_W * (a.radius + 0.5 * phi), n_W))
        return out

    if isinstance(a, sh.Box) and isinstance(b, sh.Ellipsoid):
        corners = sh.box_corners(Ra, pa, a.size)
        phi, n_W = sh.ellipsoid_sdf_point(Rb, pb, b.radii, corners)
        return [(phi[k], corners[k], n_W[k]) for k in range(8)]

    if isinstance(a, sh.Ellipsoid) and isinstance(b, sh.HalfSpace):
        # Exact support point against the plane (point contact, as the
        # reference's ellipsoid-halfspace witness).
        n_hs = Rb[:, 2]
        p_sup = sh.ellipsoid_support_point(Ra, pa, a.radii, -n_hs)
        phi, n_W = sh.halfspace_sdf_point(Rb, pb, p_sup)
        return [(phi, p_sup, n_W)]

    if isinstance(a, sh.Sphere) and isinstance(b, sh.Cylinder):
        phi_c, n_W = sh.cylinder_sdf_point(Rb, pb, b.radius, b.length, pa)
        phi = phi_c - a.radius
        p_W = pa - n_W * (a.radius + 0.5 * phi)
        return [(phi, p_W, n_W)]

    if isinstance(a, sh.Capsule) and isinstance(b, sh.Cylinder):
        e1, e2 = sh.capsule_segment_points(Ra, pa, a.length)
        out = []
        for e in (e1, e2):
            phi_c, n_W = sh.cylinder_sdf_point(
                Rb, pb, b.radius, b.length, e
            )
            phi = phi_c - a.radius
            out.append((phi, e - n_W * (a.radius + 0.5 * phi), n_W))
        return out

    if isinstance(a, sh.Box) and isinstance(b, sh.Cylinder):
        # Box corners vs the cylinder SDF (curved-face-vs-box-face pairs
        # resolve through the corners; adequate for resting/stacking).
        corners = sh.box_corners(Ra, pa, a.size)
        phi, n_W = sh.cylinder_sdf_point(Rb, pb, b.radius, b.length, corners)
        return [(phi[k], corners[k], n_W[k]) for k in range(8)]

    if isinstance(a, sh.Cylinder) and isinstance(b, sh.HalfSpace):
        n_hs = Rb[:, 2]
        rims = _cylinder_rim_points(Ra, pa, a.radius, a.length, -n_hs)
        phi, n_W = sh.halfspace_sdf_point(Rb, pb, rims)
        n_W = jnp.broadcast_to(n_W, rims.shape)
        return [(phi[k], rims[k], n_W[k]) for k in range(rims.shape[0])]

    if isinstance(a, sh.Cylinder) and isinstance(b, sh.Cylinder):
        # Rim samples of each against the other's SDF, both directions.
        rims_a = _cylinder_rim_points(Ra, pa, a.radius, a.length, pb - pa)
        phi_a, n_a = sh.cylinder_sdf_point(Rb, pb, b.radius, b.length, rims_a)
        out = [(phi_a[k], rims_a[k], n_a[k]) for k in range(rims_a.shape[0])]
        rims_b = _cylinder_rim_points(Rb, pb, b.radius, b.length, pa - pb)
        phi_b, n_b = sh.cylinder_sdf_point(Ra, pa, a.radius, a.length, rims_b)
        out += [(phi_b[k], rims_b[k], -n_b[k]) for k in range(rims_b.shape[0])]
        return out

    if isinstance(a, sh.Sphere) and isinstance(b, sh.Sphere):
        d = pa - pb
        dist = jnp.linalg.norm(d)
        n_W = d / jnp.maximum(dist, 1e-9)
        phi = dist - a.radius - b.radius
        p_W = pb + n_W * (b.radius + 0.5 * phi)
        return [(phi, p_W, n_W)]

    if isinstance(a, sh.Sphere) and isinstance(b, sh.Box):
        phi_c, n_W = sh.box_sdf_point(Rb, pb, b.size, pa)
        phi = phi_c - a.radius
        p_W = pa - n_W * (a.radius + 0.5 * phi)
        return [(phi, p_W, n_W)]

    if isinstance(a, sh.Capsule) and isinstance(b, sh.HalfSpace):
        e1, e2 = sh.capsule_segment_points(Ra, pa, a.length)
        out = []
        for e in (e1, e2):
            phi_c, n_W = sh.halfspace_sdf_point(Rb, pb, e)
            phi = phi_c - a.radius
            p_W = e - n_W * (a.radius + 0.5 * phi)
            out.append((phi, p_W, n_W))
        return out

    if isinstance(a, sh.Capsule) and isinstance(b, sh.Sphere):
        e1, e2 = sh.capsule_segment_points(Ra, pa, a.length)
        c = sh.closest_point_on_segment(e1, e2, pb)
        d = c - pb
        dist = jnp.linalg.norm(d)
        n_W = d / jnp.maximum(dist, 1e-9)
        phi = dist - a.radius - b.radius
        p_W = pb + n_W * (b.radius + 0.5 * phi)
        return [(phi, p_W, n_W)]

    if isinstance(a, sh.Capsule) and isinstance(b, sh.Capsule):
        a1, a2 = sh.capsule_segment_points(Ra, pa, a.length)
        b1, b2 = sh.capsule_segment_points(Rb, pb, b.length)
        # Closest points between segments (iterative projection, 3 sweeps —
        # exact for non-parallel segments, stable for parallel ones).
        ca = 0.5 * (a1 + a2)
        for _ in range(3):
            cb = sh.closest_point_on_segment(b1, b2, ca)
            ca = sh.closest_point_on_segment(a1, a2, cb)
        d = ca - cb
        dist = jnp.linalg.norm(d)
        n_W = d / jnp.maximum(dist, 1e-9)
        phi = dist - a.radius - b.radius
        p_W = cb + n_W * (b.radius + 0.5 * phi)
        return [(phi, p_W, n_W)]

    if isinstance(a, sh.Box) and isinstance(b, sh.HalfSpace):
        corners = sh.box_corners(Ra, pa, a.size)
        out = []
        for k in range(8):
            phi, n_W = sh.halfspace_sdf_point(Rb, pb, corners[k])
            out.append((phi, corners[k], n_W))
        return out

    if isinstance(a, sh.Mesh):
        # Mesh vs SDF shape: signed distance of every sampled vertex to B,
        # keep the K deepest (differentiable: top_k gathers).  The role of
        # the reference's FCL mesh narrow phase for the supported shape set.
        a_sdf = isinstance(a, sh.MeshSdf)

        def grid_contacts(ms, R_m, p_m, pts_W, K):
            """K deepest of pts_W against ms's SDF grid.  Grid normals
            point OUT of the mesh (from the mesh into the sampled shape);
            returned with that orientation — callers flip per convention."""
            phi, n_W = sh.mesh_sdf_point(R_m, p_m, ms, pts_W)
            idx = _spread_deepest(phi, pts_W, K)
            return [(phi[idx[k]], pts_W[idx[k]], n_W[idx[k]]) for k in range(K)]

        if isinstance(b, sh.Mesh):
            b_sdf = isinstance(b, sh.MeshSdf)
            if a_sdf or b_sdf:
                # Vertex-vs-grid (handles NON-convex meshes — the hull
                # path below would fill cavities).
                out = []
                if a_sdf:
                    vb_W = jnp.asarray(b.vertices, dtype) @ Rb.T + pb
                    # Grid normal points from A into B; convention needs
                    # from B into A.
                    out += [
                        (phi, p, -n)
                        for phi, p, n in grid_contacts(
                            a, Ra, pa, vb_W, min(8, b.num_vertices)
                        )
                    ]
                if b_sdf:
                    va_W = jnp.asarray(a.vertices, dtype) @ Ra.T + pa
                    out += grid_contacts(
                        b, Rb, pb, va_W, min(8, a.num_vertices)
                    )
                return out
            # Mesh-mesh: vertex-vs-convex-hull manifold, both directions,
            # PLUS the edge-edge (SAT cross-axis) class for crossed-edge
            # configurations no vertex row can see (geometry/
            # mesh_contact.py; the FCL GJK/EPA role for convex meshes —
            # non-convex meshes contact by their hulls).
            from drake_tpu.geometry import mesh_contact as mc

            out = mc.mesh_mesh_contacts(a, Ra, pa, b, Rb, pb, dtype)
            out += mc.edge_edge_contacts(a, Ra, pa, b, Rb, pb, dtype)
            return out

        verts_W = (
            jnp.asarray(a.vertices, dtype) @ Ra.T + pa
        )  # (n, 3)
        if a_sdf and isinstance(b, sh.Sphere):
            # Exact: sphere center vs the grid (independent of the mesh's
            # sample-vertex density).
            phi_c, n_g = sh.mesh_sdf_point(Ra, pa, a, pb[None])
            phi = phi_c[0] - b.radius
            n_W = -n_g[0]  # from B (sphere) into A (mesh)
            p_W = pb + n_g[0] * (b.radius + 0.5 * phi)
            return [(phi, p_W, n_W)]
        if a_sdf and isinstance(b, sh.Box):
            corners = sh.box_corners(Rb, pb, b.size)  # (8, 3)
            out = [
                (phi, p, -n)
                for phi, p, n in grid_contacts(a, Ra, pa, corners, 8)
            ]
            phi_v, n_v = sh.box_sdf_point(Rb, pb, b.size, verts_W)
            K = min(4, a.num_vertices)
            idx = _spread_deepest(phi_v, verts_W, K)
            out += [
                (phi_v[idx[k]], verts_W[idx[k]], n_v[idx[k]])
                for k in range(K)
            ]
            return out
        if a_sdf and isinstance(b, sh.Capsule):
            e1, e2 = sh.capsule_segment_points(Rb, pb, b.length)
            axis_pts = jnp.stack([e1, 0.5 * (e1 + e2), e2])
            phi_ax, n_ax = sh.mesh_sdf_point(Ra, pa, a, axis_pts)
            out = [
                (
                    phi_ax[k] - b.radius,
                    axis_pts[k] + n_ax[k] * (b.radius + 0.5 * (phi_ax[k] - b.radius)),
                    -n_ax[k],
                )
                for k in range(3)
            ]
            phi_v, n_v = sh.capsule_sdf_point(
                Rb, pb, b.radius, b.length, verts_W
            )
            K = min(4, a.num_vertices)
            idx = _spread_deepest(phi_v, verts_W, K)
            out += [
                (phi_v[idx[k]], verts_W[idx[k]], n_v[idx[k]])
                for k in range(K)
            ]
            return out
        if isinstance(b, sh.HalfSpace):
            phi, n_W = sh.halfspace_sdf_point(Rb, pb, verts_W)
        elif isinstance(b, sh.Box):
            phi, n_W = sh.box_sdf_point(Rb, pb, b.size, verts_W)
        elif isinstance(b, sh.Sphere):
            phi, n_W = sh.sphere_sdf_point(Rb, pb, b.radius, verts_W)
        elif isinstance(b, sh.Capsule):
            phi, n_W = sh.capsule_sdf_point(
                Rb, pb, b.radius, b.length, verts_W
            )
        elif isinstance(b, sh.Cylinder):
            phi, n_W = sh.cylinder_sdf_point(
                Rb, pb, b.radius, b.length, verts_W
            )
        elif isinstance(b, sh.Ellipsoid):
            phi, n_W = sh.ellipsoid_sdf_point(Rb, pb, b.radii, verts_W)
        else:
            raise NotImplementedError(
                f"no mesh contact vs {type(b).__name__}"
            )
        if n_W.ndim == 1:  # constant-normal shapes (halfspace)
            n_W = jnp.broadcast_to(n_W, verts_W.shape)
        K = min(8, a.num_vertices)
        idx = _spread_deepest(phi, verts_W, K)
        return [(phi[idx[k]], verts_W[idx[k]], n_W[idx[k]]) for k in range(K)]

    raise NotImplementedError(
        f"no contact handler for {type(a).__name__}-{type(b).__name__}"
    )


def contact_frame(n_W):
    """Orthonormal contact frame columns [t1, t2, n] from unit normal."""
    # Robust tangent construction (pick the axis least aligned with n).
    ref = jnp.where(
        jnp.abs(n_W[..., 0:1]) < 0.9,
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], n_W.dtype), n_W.shape),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], n_W.dtype), n_W.shape),
    )
    t1 = jnp.cross(n_W, ref)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(n_W, t1)
    return jnp.stack([t1, t2, n_W], axis=-1)  # (..., 3, 3)
