"""Box-box and capsule-box narrow phase: SAT + branch-free contact manifolds.

Reference role: the FCL-based convex narrow phase behind QueryObject
(reference geometry/proximity/distance_to_shape_callback.h and the
box-box manifold machinery FCL provides to ComputePointPairPenetration,
geometry/query_object.h:303).  The reference clips the incident face
against the reference face sequentially (Sutherland-Hodgman); on TPU a
data-dependent-length clip loop is hostile, so the manifold is built
branch-free instead:

  1. SAT over the 15 candidate axes (3 + 3 face normals, 9 edge crosses)
     picks the max-separation axis, with the standard small bias towards
     face axes for manifold stability.
  2. Face case: ALL 24 candidate vertices of the clipped polygon are
     enumerated at once with validity masks — 4 incident-face corners
     (valid if inside the reference rectangle), 4 reference-rectangle
     corners (valid if inside the incident quad), and 16 edge-edge
     crossings — and the 8 deepest valid ones are kept via top_k.
     (The exact clipped polygon's vertex set is a subset of these 24.)
  3. Edge case: one contact at the closest points of the two witness
     edges.

Everything is fixed-shape, jit/vmap-safe, and differentiable (the SAT
axis choice and candidate masks switch by jnp.where; phi/point/normal are
smooth almost everywhere, like the reference's manifold).

Conventions match scene.py: phi < 0 in penetration; returned normals
point from box B into box A; invalid manifold slots report phi = +1 m
with a valid unit normal so downstream SAP constraints stay NaN-free and
force-free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_FACE_BIAS = 0.99  # relative preference for face axes over edge axes (ODE's
# fudge factor role): edge separation must beat the best face separation by
# >1% of itself to be chosen.
_EPS = 1e-9


def _axes_separations(Ra, ha, Rb, hb, t_W):
    """Separations on the 15 SAT axes.

    Returns (sep_a (3,), sep_b (3,), sep_e (3, 3), axes_e (3, 3, 3)) where
    sep < 0 means overlap on that axis; axes_e[i, j] is the normalized world
    cross(Ra_i, Rb_j) oriented from A towards B, with parallel-edge pairs
    marked separated-by-infinity.
    """
    R = Ra.T @ Rb  # box-B axes in A frame
    absR = jnp.abs(R) + 1e-6
    t_a = Ra.T @ t_W  # B center in A frame

    sep_a = jnp.abs(t_a) - (ha + absR @ hb)
    t_b = R.T @ t_a
    sep_b = jnp.abs(t_b) - (hb + absR.T @ ha)

    # Edge axes: cross(e_i, R[:, j]) in A frame.
    eye = jnp.eye(3, dtype=Ra.dtype)
    axes = jnp.cross(eye[:, None, :], R.T[None, :, :])  # (i, j, 3) in A frame
    norm = jnp.linalg.norm(axes, axis=-1)
    ok = norm > 1e-6
    axes_n = axes / jnp.maximum(norm, 1e-6)[..., None]
    proj_a = jnp.einsum("ijk,k->ij", jnp.abs(axes_n), ha)
    proj_b = jnp.einsum("ijk,kl->ijl", axes_n, R)
    proj_b = jnp.einsum("ijl,l->ij", jnp.abs(proj_b), hb)
    dist = jnp.einsum("ijk,k->ij", axes_n, t_a)
    sep_e = jnp.abs(dist) - (proj_a + proj_b)
    # Degenerate axes (parallel edge pairs) are EXCLUDED from the
    # max-separation choice — their separation is already covered by the
    # face axes (standard SAT practice).
    sep_e = jnp.where(ok, sep_e, -jnp.inf)
    # Orient each axis from A towards B and move to world frame.
    axes_n = axes_n * jnp.sign(dist)[..., None]
    axes_W = jnp.einsum("ab,ijb->ija", Ra, axes_n)
    return sep_a, sep_b, sep_e, axes_W


def _face_manifold(R_ref, p_ref, h_ref, R_inc, p_inc, h_inc, ax):
    """8-slot manifold with the reference face on box 'ref', axis index ax.

    Face sign is inferred from the incident box's center side.  Returns
    (phi (8,), p_W (8, 3), n_W (8, 3), valid (8,)) with n_W = the OUTWARD
    world normal of the reference face (caller orients per A/B convention).
    """
    dtype = p_ref.dtype
    t = R_ref.T @ (p_inc - p_ref)  # inc center in ref frame
    s = jnp.sign(jnp.take(t, ax)) + jnp.where(jnp.take(t, ax) == 0, 1.0, 0.0)

    # Face frame: rows (u, v, w) of P map ref-box coords -> face coords,
    # with +w the outward face normal.  Built by gathering rows of I.
    eye = jnp.eye(3, dtype=dtype)
    u_i, v_i = (ax + 1) % 3, (ax + 2) % 3
    P = jnp.stack([eye[u_i], eye[v_i], s * eye[ax]])
    hu = jnp.take(h_ref, u_i)
    hv = jnp.take(h_ref, v_i)
    hw = jnp.take(h_ref, ax)

    M = P @ (R_ref.T @ R_inc)  # inc axes in face frame, (3, 3)
    t_f = P @ t

    # Incident face: the inc axis most anti-parallel to +w.
    j = jnp.argmax(jnp.abs(M[2]))
    m = M[:, j]  # (3,) incident-face axis in face frame
    s2 = -jnp.sign(m[2]) + jnp.where(m[2] == 0, 1.0, 0.0)
    hj = jnp.take(h_inc, j)
    j1, j2 = (j + 1) % 3, (j + 2) % 3
    e1 = M[:, j1] * jnp.take(h_inc, j1)
    e2 = M[:, j2] * jnp.take(h_inc, j2)
    fc = t_f + s2 * hj * m  # incident face center, face frame

    # Incident quad ring (4, 3): fc +- e1 +- e2 in ring order.
    ring = jnp.asarray(
        [[1.0, 1.0], [1.0, -1.0], [-1.0, -1.0], [-1.0, 1.0]], dtype
    )
    quad = fc[None, :] + ring[:, 0:1] * e1[None, :] + ring[:, 1:2] * e2[None, :]
    quad_uv = quad[:, :2]  # (4, 2)

    # Incident-face plane w(u, v):  n_f . (x - fc) = 0 with n_f = s2 * m.
    m_w = jnp.where(jnp.abs(m[2]) < 1e-6, 1.0, m[2])

    def w_of_uv(uv):
        return fc[2] - (m[0] * (uv[..., 0] - fc[0]) + m[1] * (uv[..., 1] - fc[1])) / m_w

    # ---- candidate set (24) ------------------------------------------------
    # (a) incident corners inside the reference rect.
    in_rect = jnp.logical_and(
        jnp.abs(quad_uv[:, 0]) <= hu + _EPS, jnp.abs(quad_uv[:, 1]) <= hv + _EPS
    )
    cand_a_uv = quad_uv
    cand_a_ok = in_rect

    # (b) reference rect corners inside the incident quad (2D convex test).
    rect = jnp.stack(
        [
            jnp.stack([hu, hv]),
            jnp.stack([hu, -hv]),
            jnp.stack([-hu, -hv]),
            jnp.stack([-hu, hv]),
        ]
    )  # (4, 2)
    edge = jnp.roll(quad_uv, -1, axis=0) - quad_uv  # (4, 2) ring edges
    rel = rect[:, None, :] - quad_uv[None, :, :]  # (4 rect, 4 edge, 2)
    cross = edge[None, :, 0] * rel[..., 1] - edge[None, :, 1] * rel[..., 0]
    in_quad = jnp.logical_or(
        jnp.all(cross >= -_EPS, axis=1), jnp.all(cross <= _EPS, axis=1)
    )
    # Degenerate (edge-on) incident quads have near-zero area: reject.
    area2 = jnp.abs(
        jnp.cross(quad_uv[1] - quad_uv[0], quad_uv[3] - quad_uv[0])
    )
    cand_b_uv = rect
    cand_b_ok = jnp.logical_and(in_quad, area2 > 1e-8)

    # (c) 16 quad-edge x rect-edge crossings.
    #     rect edges: u = +-hu (v in [-hv, hv]), v = +-hv.
    q0 = quad_uv  # (4, 2) edge starts
    d = edge  # (4, 2) edge vectors
    lines_n = jnp.asarray(
        [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.0, 1.0]], dtype
    )  # (4, 2) rect line normals
    lines_c = jnp.stack([hu, -hu, hv, -hv])  # offsets: n . x = c
    den = jnp.einsum("lk,ek->le", lines_n, d)  # (4 lines, 4 edges)
    num = lines_c[:, None] - jnp.einsum("lk,ek->le", lines_n, q0)
    tt = num / jnp.where(jnp.abs(den) < 1e-9, 1.0, den)
    pt = q0[None, :, :] + tt[..., None] * d[None, :, :]  # (4, 4, 2)
    on_seg = jnp.logical_and(tt >= -_EPS, tt <= 1.0 + _EPS)
    on_seg = jnp.logical_and(on_seg, jnp.abs(den) >= 1e-9)
    # Crossing must lie within the rect edge's span (the other coordinate).
    other = jnp.asarray([1, 1, 0, 0])  # coordinate to bound per line
    bound = jnp.stack([hv, hv, hu, hu])
    val = jnp.take_along_axis(pt, other[:, None, None].repeat(4, 1), axis=2)[
        ..., 0
    ]
    on_span = jnp.abs(val) <= bound[:, None] + _EPS
    cand_c_uv = pt.reshape(16, 2)
    cand_c_ok = jnp.logical_and(on_seg, on_span).reshape(16)

    uv = jnp.concatenate([cand_a_uv, cand_b_uv, cand_c_uv], axis=0)  # (24, 2)
    ok = jnp.concatenate([cand_a_ok, cand_b_ok, cand_c_ok], axis=0)  # (24,)

    w = w_of_uv(uv)  # incident surface height at each candidate
    phi = w - hw  # separation along the face normal (negative = penetrating)

    # Keep the 8 deepest valid candidates.
    score = jnp.where(ok, -phi, -jnp.inf)
    _, idx = jax.lax.top_k(score, 8)
    phi8 = jnp.take(phi, idx)
    uv8 = jnp.take(uv, idx, axis=0)
    ok8 = jnp.take(ok, idx)

    # Contact point: midway between the two witness surfaces.
    pt_face = jnp.concatenate([uv8, (hw + 0.5 * phi8)[:, None]], axis=1)
    p_G = pt_face @ P  # P^T x, batched
    p_W = p_ref[None, :] + p_G @ R_ref.T
    n_W = (R_ref @ (s * eye[ax]))[None, :].repeat(8, axis=0)

    phi8 = jnp.where(ok8, phi8, 1.0)
    p_W = jnp.where(ok8[:, None], p_W, p_ref[None, :])
    return phi8, p_W, n_W, ok8


def _edge_contact(Ra, pa, ha, Rb, pb, hb, axis_W):
    """Closest points of the two witness edges for SAT edge axis (i, j).

    axis_W points from A towards B.  The witness edge on A is the one whose
    support along +axis is maximal; on B along -axis.  Returns
    (phi, p_W, n_W(from A to B)).
    """
    sup_a = jnp.sign(Ra.T @ axis_W)
    sup_b = -jnp.sign(Rb.T @ axis_W)
    # Edge direction = the axis k with the smallest |alignment| (the edge
    # involved in the cross product is perpendicular to the SAT axis).
    align_a = jnp.abs(Ra.T @ axis_W)
    align_b = jnp.abs(Rb.T @ axis_W)
    ia = jnp.argmin(align_a)
    ib = jnp.argmin(align_b)
    eye = jnp.eye(3, dtype=pa.dtype)
    mask_a = eye[ia]
    mask_b = eye[ib]
    # Corner at the support signs, zeroing the edge-direction coordinate.
    ca = pa + Ra @ (sup_a * ha * (1.0 - mask_a))
    cb = pb + Rb @ (sup_b * hb * (1.0 - mask_b))
    da = Ra @ mask_a
    db = Rb @ mask_b
    la = jnp.sum(ha * mask_a)
    lb = jnp.sum(hb * mask_b)

    # Closest points between segments ca +- la*da, cb +- lb*db.
    r = ca - cb
    a_dd = 1.0
    b_dd = 1.0
    ab = da @ db
    det = a_dd * b_dd - ab * ab
    sa = (-(r @ da) * b_dd + (r @ db) * ab) / jnp.where(det < 1e-9, 1.0, det)
    sa = jnp.clip(sa, -la, la)
    sb = jnp.clip((r @ db) + sa * ab, -lb, lb)
    sa = jnp.clip(-(r @ da) + sb * ab, -la, la)
    qa = ca + sa * da
    qb = cb + sb * db
    d = qb - qa
    dist = jnp.linalg.norm(d)
    # Normal from A towards B: the SAT axis (stable when dist ~ 0).
    n = jnp.where(dist > 1e-6, d / jnp.maximum(dist, 1e-6), axis_W)
    phi = dist * jnp.sign(n @ axis_W)
    # Penetrating edges: witness separation is along -axis.
    p_W = 0.5 * (qa + qb)
    return phi, p_W, n


def box_box_contacts(Ra, pa, size_a, Rb, pb, size_b):
    """Full box-box manifold: (phi (8,), p_W (8, 3), n_W (8, 3)).

    n_W points from B into A (scene.py convention).  Separated boxes report
    the single closest-feature gap in slot 0 and phi = +1 in inactive slots.
    """
    dtype = pa.dtype
    ha = jnp.asarray(size_a, dtype) / 2.0
    hb = jnp.asarray(size_b, dtype) / 2.0
    sep_a, sep_b, sep_e, axes_e = _axes_separations(Ra, ha, Rb, hb, pb - pa)

    best_face_a = jnp.argmax(sep_a)
    best_face_b = jnp.argmax(sep_b)
    fa = jnp.take(sep_a, best_face_a)
    fb = jnp.take(sep_b, best_face_b)
    # SAT picks the axis of MAXIMUM separation (least overlap).
    flat_e = sep_e.reshape(9)
    best_e = jnp.argmax(flat_e)
    fe = jnp.take(flat_e, best_e)
    axis_e = axes_e.reshape(9, 3)[best_e]

    face_sep = jnp.maximum(fa, fb)
    # Prefer face manifolds: the edge axis must beat the best face axis by
    # >1% of its magnitude (the ODE fudge-factor role) to be chosen.
    use_edge = fe > face_sep + (1.0 - _FACE_BIAS) * jnp.abs(face_sep) + 1e-5
    use_face = jnp.logical_not(use_edge)
    use_a = fa >= fb

    phiA, pA, nA, okA = _face_manifold(Ra, pa, ha, Rb, pb, hb, best_face_a)
    phiB, pB, nB, okB = _face_manifold(Rb, pb, hb, Ra, pa, ha, best_face_b)
    # Face-on-A: reference face outward normal points A->B; convention wants
    # B into A, so flip.  Face-on-B: outward normal already points B->A.
    nA = -nA

    phi_e, p_e, n_e = _edge_contact(Ra, pa, ha, Rb, pb, hb, axis_e)
    phiE = jnp.full((8,), 1.0, dtype).at[0].set(phi_e)
    pE = jnp.tile(pa[None], (8, 1)).at[0].set(p_e)
    nE = jnp.tile((-n_e)[None], (8, 1))  # from B into A

    phiF = jnp.where(use_a, phiA, phiB)
    pF = jnp.where(use_a, pA, pB)
    nF = jnp.where(use_a, nA, nB)
    okF = jnp.where(use_a, okA, okB)
    # Degenerate face manifold (no valid candidates — deep skewed poses):
    # fall back to the edge witness so at least one contact exists.
    any_face = jnp.any(okF)
    use_face = jnp.logical_and(use_face, any_face)

    phi = jnp.where(use_face, phiF, phiE)
    p_W = jnp.where(use_face, pF, pE)
    n_W = jnp.where(use_face, nF, nE)
    return phi, p_W, n_W


def capsule_box_contacts(Rc, pc, radius, length, Rb, pb, size):
    """Capsule (A) vs box (B): 3 contacts — both endpoints + the deep point.

    Returns (phi (3,), p_W (3, 3), n_W (3, 3)) with n_W from box into
    capsule.  The third contact is the closest segment-box pair found by
    alternating projection (exact for non-degenerate poses; 8 sweeps).
    """
    from drake_tpu.geometry import shapes as sh

    e1, e2 = sh.capsule_segment_points(Rc, pc, length)
    half = jnp.asarray(size, pc.dtype) / 2.0

    def closest_in_box(p_W):
        p_G = Rb.T @ (p_W - pb)
        return pb + Rb @ jnp.clip(p_G, -half, half)

    # Alternating projection from the segment midpoint.
    c = 0.5 * (e1 + e2)
    for _ in range(8):
        q = closest_in_box(c)
        c = sh.closest_point_on_segment(e1, e2, q)

    phis, ps, ns = [], [], []
    for pt in (e1, e2, c):
        phi_c, n_W = sh.box_sdf_point(Rb, pb, size, pt)
        phi = phi_c - radius
        p_W = pt - n_W * (radius + 0.5 * phi)
        phis.append(phi)
        ps.append(p_W)
        ns.append(n_W)
    return jnp.stack(phis), jnp.stack(ps), jnp.stack(ns)
