"""Coupled rigid(SAP) + MPM world stepping — the fork's flagship pipeline.

Re-derivation of the full coupling loop (reference, SURVEY.md §3.3):
MultibodyPlant::CalcAbstractStep → DeformableDriver::CalcAbstractStates runs
the MPM substeps against rigid geometry, accumulates contact impulses, and
the next rigid step applies them as external spatial forces
(FinalizeExternalContactForces deformable_driver.h:210-218 →
AddAppliedExternalSpatialForces multibody_plant.cc:2385-2407) — the
one-way-lagged "async" two-way coupling of arXiv:2503.05046.

The TPU version is one pure function over a (rigid state, particle state)
pytree: rigid SDFs are evaluated on device inside the MPM substeps (no
GPU→CPU round trip), and the whole coupled step jits/vmaps/scans.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from drake_tpu.contact import plant as cplant
from drake_tpu.contact import sap
from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionScene
from drake_tpu.mpm import coupling as cpl
from drake_tpu.mpm import solver as mpm
from drake_tpu.multibody import kinematics as kin
from drake_tpu.multibody.model import MultibodyModel, MultibodyParams


class CoupledState(NamedTuple):
    """The world state pytree: rigid x = [q; v] plus MPM particles."""

    rigid: jnp.ndarray
    particles: mpm.MpmState


@dataclasses.dataclass(frozen=True)
class CoupledWorld:
    """Static description: rigid model + scene, MPM config, and which rigid
    collision geometries the particles touch."""

    model: MultibodyModel
    scene: CollisionScene
    mpm_config: mpm.MpmConfig
    contact_params: cpl.MpmContactParams
    coupled_geometries: Tuple[int, ...]  # indices into scene.geometries
    substeps_per_step: int
    time_step: float
    sap_params: sap.SapParameters = sap.SapParameters()
    # MPM-side contact model: "penalty" = explicit per-particle penalty
    # (mpm/coupling.py); "implicit" = the fork's grid-level contact Newton
    # (mpm/grid_contact.py, UpdateContact role) — stable at stiff k*dt and
    # holds stiction.  "auto" (default) picks by the penalty's OWN
    # stability bound (grid_contact.py docstring: explicit stable only for
    # dt < ~2/sqrt(k_eff)): implicit when dt*sqrt(stiffness) >= 1.0 (half
    # the bound, safety 2x), penalty otherwise.  With "implicit",
    # `grid_contact_params` configures the solve and
    # `contact_query_frequency` runs it every that-many substeps
    # (MpmConfigParams::contact_query_frequency role, cpu_mpm_model.h:17-26).
    contact_model: str = "auto"
    grid_contact_params: Optional[object] = None
    contact_query_frequency: int = 1
    # With "implicit": host the substeps + contact Newton on the tile-slab
    # pipeline (mpm/tiles_contact.py) — one sort per rigid step, factorized
    # MXU transfers in the Newton (the TPU fast path).  False falls back to
    # the dense-grid solve (mpm/grid_contact.py); both paths agree to f32
    # roundoff (tests/test_tiles_contact.py).
    tiled: bool = True
    # Set to couple a codimensional cloth instead of volumetric particles:
    # CoupledState.particles is then a mpm.cloth.ClothState and every
    # substep applies the cloth's elastic vertex forces before P2G (the
    # fork's CalcFemStateAndForce step in the substep loop, SURVEY §3.3;
    # used by the bagging/folding demos where the cloth carries rigid
    # bodies).
    cloth_config: Optional[object] = None

    def rigid_geoms(self, params: MultibodyParams, q, v):
        """Current-pose RigidGeom descriptors for the coupled geometries."""
        R_WB, p_WB = kin.forward_kinematics(self.model, params, q)
        V_W = kin.world_velocities(self.model, params, q, v)
        out = []
        for gi in self.coupled_geometries:
            g = self.scene.geometries[gi]
            dtype = q.dtype
            R_BG = jnp.asarray(g.R_BG, dtype)
            p_BG = jnp.asarray(g.p_BG, dtype)
            if g.body < 0:
                R_WG, p_WG = R_BG, p_BG
                p_WBo = jnp.zeros(3, dtype)
                V = jnp.zeros(6, dtype)
            else:
                R_WG = R_WB[g.body] @ R_BG
                p_WG = p_WB[g.body] + R_WB[g.body] @ p_BG
                p_WBo = p_WB[g.body]
                V = V_W[g.body]
            out.append(
                cpl.RigidGeom(
                    shape=g.shape, body_index=g.body,
                    R_WG=R_WG, p_WG=p_WG, p_WB=p_WBo, V_WB=V,
                )
            )
        return out

    def step(
        self,
        params: MultibodyParams,
        state: CoupledState,
        tau_applied,
    ) -> CoupledState:
        """One coupled step of `time_step` seconds.

        Order mirrors the reference: (1) MPM substeps against the CURRENT
        rigid poses, accumulating impulses; (2) rigid SAP step with the
        accumulated impulses / h applied as external spatial forces.
        """
        model = self.model
        nq = model.num_positions
        q, v = state.rigid[:nq], state.rigid[nq:]
        h = self.time_step

        geoms = self.rigid_geoms(params, q, v)
        contact_model = self.contact_model
        if contact_model == "auto":
            # Penalty is stability-limited to dt < ~2/sqrt(k_eff)
            # (mpm/grid_contact.py docstring); switch to the implicit grid
            # Newton at half that bound.
            import math

            stiff = (
                self.mpm_config.dt
                * math.sqrt(self.contact_params.stiffness)
                >= 1.0
            )
            contact_model = "implicit" if stiff else "penalty"
        if self.cloth_config is not None:
            from drake_tpu.mpm import cloth as clothmod

            def body(carry, _):
                s, acc = carry
                s, imp = clothmod.cloth_substep(
                    self.mpm_config, self.cloth_config, s, geoms,
                    self.contact_params,
                    contact_model=contact_model,
                )
                return (s, acc + imp), None

            acc0 = jnp.zeros((len(geoms), 6), q.dtype)
            (particles, impulses), _ = jax.lax.scan(
                body, (state.particles, acc0), None,
                length=self.substeps_per_step,
            )
        elif contact_model == "implicit" and self.tiled:
            from drake_tpu.mpm import grid_contact as gcmod
            from drake_tpu.mpm import tiles
            from drake_tpu.mpm import tiles_contact as tcmod

            gc_params = (
                self.grid_contact_params
                if self.grid_contact_params is not None
                else gcmod.GridContactParams(
                    stiffness=self.contact_params.stiffness,
                    damping=self.contact_params.damping,
                    friction=self.contact_params.friction,
                    slip_velocity=self.contact_params.slip_velocity,
                )
            )
            freq = max(1, self.contact_query_frequency)
            ss0 = tiles.sort_to_tiles(self.mpm_config, state.particles)

            def with_contact(ss):
                return tcmod.resident_substep_contact(
                    self.mpm_config, gc_params, ss, geoms
                )

            def without_contact(ss):
                return (
                    tiles.resident_substep(self.mpm_config, ss),
                    jnp.zeros((len(geoms), 6), q.dtype),
                )

            def body(carry, k):
                ss, acc = carry
                if freq == 1:
                    ss, imp = with_contact(ss)
                else:
                    ss, imp = jax.lax.cond(
                        k % freq == 0, with_contact, without_contact, ss
                    )
                return (ss, acc + imp), None

            acc0 = jnp.zeros((len(geoms), 6), q.dtype)
            (ssf, impulses), _ = jax.lax.scan(
                body, (ss0, acc0), jnp.arange(self.substeps_per_step)
            )
            particles = tiles.tiles_to_state(ssf, state.particles)
        elif contact_model == "implicit":
            from drake_tpu.mpm import grid_contact as gcmod

            gc_params = (
                self.grid_contact_params
                if self.grid_contact_params is not None
                else gcmod.GridContactParams(
                    stiffness=self.contact_params.stiffness,
                    damping=self.contact_params.damping,
                    friction=self.contact_params.friction,
                    slip_velocity=self.contact_params.slip_velocity,
                )
            )
            freq = max(1, self.contact_query_frequency)

            def body(carry, k):
                s, acc = carry
                grid = mpm.particle_to_grid(self.mpm_config, s)
                grid_vel = mpm.update_grid(self.mpm_config, grid)

                def with_contact(gv):
                    sol = gcmod.solve_grid_contact(
                        self.mpm_config, gc_params, s, grid.mass, gv, geoms
                    )
                    return sol.grid_vel, sol.impulses

                def without_contact(gv):
                    return gv, jnp.zeros((len(geoms), 6), gv.dtype)

                if freq == 1:
                    gv_new, imp = with_contact(grid_vel)
                else:
                    gv_new, imp = jax.lax.cond(
                        k % freq == 0, with_contact, without_contact, grid_vel
                    )
                s = mpm.grid_to_particle(self.mpm_config, s, gv_new)
                s = s.replace(dropped=jnp.asarray(grid.dropped, jnp.int32))
                return (s, acc + imp), None

            acc0 = jnp.zeros((len(geoms), 6), q.dtype)
            (particles, impulses), _ = jax.lax.scan(
                body, (state.particles, acc0),
                jnp.arange(self.substeps_per_step),
            )
        else:
            particles, impulses = cpl.simulate_coupled(
                self.mpm_config,
                self.contact_params,
                state.particles,
                geoms,
                self.substeps_per_step,
            )

        # Impulse accumulators -> external spatial forces on rigid bodies.
        nb = model.num_bodies
        fext = jnp.zeros((nb, 6), q.dtype)
        for k, gi in enumerate(self.coupled_geometries):
            body = self.scene.geometries[gi].body
            if body >= 0:
                fext = fext.at[body].add(impulses[k] / h)

        data, _ = sap.assemble(
            model, params, self.scene, q, v, tau_applied, h,
            self.sap_params, external_forces_W=fext,
        )
        sol = sap.solve_sap(data, data.v_star, self.sap_params)
        q_next = cplant.advance_positions(model, params, q, sol.v, h)
        return CoupledState(
            rigid=jnp.concatenate([q_next, sol.v]), particles=particles
        )

    def simulate(self, params, state: CoupledState, num_steps: int, tau=None):
        """Scan `num_steps` coupled steps (zero actuation by default)."""
        nv = self.model.num_velocities
        if tau is None:
            tau = jnp.zeros(nv, state.rigid.dtype)

        def body(s, _):
            return self.step(params, s, tau), None

        out, _ = jax.lax.scan(body, state, None, length=num_steps)
        return out
