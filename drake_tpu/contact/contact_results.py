"""ContactResults reporting — the ContactResultsToLcmSystem role.

The reference converts the plant's per-step contact results into
``lcmt_contact_results_for_viz`` (point pairs AND hydroelastic contact
surfaces) and publishes them for visualizers
(multibody/plant/contact_results_to_lcm.h ContactResultsToLcmSystem;
consumed by meshcat's contact visualizer and the LCM viewer).

Here the same role is host-side viz plumbing over the typed-message layer:
``build_contact_results`` folds one SAP step's ``ContactData`` + impulse
solution into the typed message, splitting the scene's static slot layout
into point-pair entries and hydroelastic patch surfaces (quadrature-point
reporting — the patch IS a quadrature set, matching this framework's
hydroelastic design, geometry/scene.py ``_hydro_patch``), and
``ContactResultsPublisher`` sends it on a typed channel.

Conventions follow the reference message docs exactly: the point-pair
``contact_force`` is the force applied to body 2 (``f_Bc_W``,
multibody/plant/point_pair_contact_info.h:39) while the hydroelastic
surface ``force_C_W``/``moment_C_W`` is the spatial force on body 1
(``F_Ac_W``, contact_results_to_lcm.cc:221-224).  Internally ``n_W``
points from body B (=geometry 2) into body A and ``contact_forces_W``
returns the force ON BODY A; impulses ``gamma`` are in contact frames
with columns [t1 t2 n] (contact/sap.py) and divide by the step ``h`` to
become forces.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from drake_tpu.geometry.scene import (
    CollisionScene,
    ContactData,
    _contacts_per_pair,
    _hydro_pair,
    contact_frame,
)
from drake_tpu.io import messages as msg


@dataclasses.dataclass(frozen=True)
class PairSlots:
    """Static slot range of one candidate pair in the ContactData arrays."""

    geom_a: int
    geom_b: int
    start: int
    count: int
    hydro: bool


def slot_layout(scene: CollisionScene) -> List[PairSlots]:
    """The static pair -> contact-slot mapping (query() concatenation order)."""
    out, start = [], 0
    for i, j in scene.pairs:
        ga, gb = scene.geometries[i], scene.geometries[j]
        m = _contacts_per_pair(ga, gb)
        out.append(
            PairSlots(i, j, start, m, _hydro_pair(ga, gb) is not None)
        )
        start += m
    return out


def _body_name(model, body: int) -> str:
    if body < 0:
        return "world"
    return model.body_names[body]


def contact_forces_W(
    contact: ContactData, gamma: np.ndarray, h: float
) -> np.ndarray:
    """(nc, 3) world-frame forces on body A from contact-frame impulses."""
    frames = np.asarray(contact_frame(contact.n_W))  # (nc, 3, 3) [t1 t2 n]
    f_c = np.asarray(gamma) / h
    return np.einsum("cij,cj->ci", frames, f_c)


def build_contact_results(
    model,
    scene: CollisionScene,
    contact: ContactData,
    gamma: np.ndarray,
    h: float,
    t: float = 0.0,
    min_force: float = 1e-10,
    vc: Optional[np.ndarray] = None,
) -> msg.lcmt_contact_results_for_viz:
    """One step's contact solution as the typed viz message.

    ``gamma``: (nc, 3) SAP impulses (SapSolution.gamma).  Point-contact
    pairs become point_pair entries (active slots only: |f| > min_force);
    hydroelastic pairs become one contact-surface message each, with the
    quadrature points as both the per-point data and the reported
    "vertices" (pressure = per-point normal force; poly_data is empty —
    the patch is a weighted point set, not a polygon mesh).  ``vc``:
    optional (nc, 3) contact-frame velocities [vt1 vt2 vn] for the
    slip-velocity field of the quadrature data.
    """
    utime = int(t * 1e6)
    phi = np.asarray(contact.phi)
    p_W = np.asarray(contact.p_W)
    n_W = np.asarray(contact.n_W)
    f_W = contact_forces_W(contact, gamma, h)
    frames = np.asarray(contact_frame(contact.n_W))

    point_pairs: List[msg.lcmt_point_pair_contact_info_for_viz] = []
    surfaces: List[msg.lcmt_hydroelastic_contact_surface_for_viz] = []

    for ps in slot_layout(scene):
        ga = scene.geometries[ps.geom_a]
        gb = scene.geometries[ps.geom_b]
        sl = slice(ps.start, ps.start + ps.count)
        fmag = np.linalg.norm(f_W[sl], axis=1)
        active = fmag > min_force
        if not np.any(active):
            continue
        name_a = _body_name(model, ga.body)
        name_b = _body_name(model, gb.body)
        if not ps.hydro:
            for k in np.nonzero(active)[0]:
                i = ps.start + int(k)
                point_pairs.append(
                    msg.lcmt_point_pair_contact_info_for_viz(
                        timestamp=utime,
                        body1_name=name_a,
                        body2_name=name_b,
                        contact_point=p_W[i],
                        contact_force=-f_W[i],  # f_Bc_W: force on body 2
                        normal=n_W[i],
                    )
                )
            continue

        # Hydroelastic patch: aggregate the quadrature set.
        pts = p_W[sl][active]
        fs = f_W[sl][active]
        fn = np.abs(np.einsum("cj,cj->c", fs, n_W[sl][active]))
        w = fn / max(fn.sum(), min_force)
        centroid = (w[:, None] * pts).sum(axis=0)
        force_C = fs.sum(axis=0)
        moment_C = np.cross(pts - centroid, fs).sum(axis=0)
        if vc is not None:
            vt = np.asarray(vc)[sl][active][:, :2]  # (na, 2) tangent comps
            slip_W = np.einsum(
                "cij,cj->ci", frames[sl][active][:, :, :2], vt
            )
        else:
            slip_W = np.zeros_like(pts)
        qdata = [
            msg.lcmt_hydroelastic_quadrature_per_point_data_for_viz(
                p_WQ=pts[k], vt_BqAq_W=slip_W[k], traction_Aq_W=fs[k]
            )
            for k in range(pts.shape[0])
        ]
        surfaces.append(
            msg.lcmt_hydroelastic_contact_surface_for_viz(
                geometry1_name=ga.name,
                body1_name=name_a,
                model1_name="",
                body1_unique=True,
                collision_count1=1,
                geometry2_name=gb.name,
                body2_name=name_b,
                model2_name="",
                body2_unique=True,
                collision_count2=1,
                centroid_W=centroid,
                force_C_W=force_C,
                moment_C_W=moment_C,
                quadrature_point_data=qdata,
                p_WV=[msg.lcmt_point(*map(float, pt)) for pt in pts],
                pressure=fn,
                poly_data=np.zeros(0, np.int32),
            )
        )

    return msg.lcmt_contact_results_for_viz(
        timestamp=utime,
        point_pair_contact_info=point_pairs,
        hydroelastic_contacts=surfaces,
    )


class ContactResultsPublisher:
    """Publish per-step contact results on a typed channel.

    The ContactResultsToLcmSystem + LcmPublisherSystem pairing:

        node = PubSub("memq://")
        pub = ContactResultsPublisher(node, model, scene)
        ...
        q1, v1, sol, contact = plant.step_with_forces(...)
        pub.publish(t, contact, sol.gamma, h)
    """

    def __init__(
        self, node, model, scene: CollisionScene,
        channel: str = "CONTACT_RESULTS",
    ):
        self.model = model
        self.scene = scene
        self.typed = msg.TypedPublisher(
            node, channel, msg.lcmt_contact_results_for_viz
        )

    def publish(self, t, contact, gamma, h, vc=None):
        self.typed.publish(
            build_contact_results(
                self.model, self.scene, contact, np.asarray(gamma), h,
                t=float(t), vc=vc,
            )
        )
