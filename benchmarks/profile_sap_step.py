"""Decompose one batched SAP contact step: assembly vs solve vs integrate.

Each stage is iterated K times inside ONE jitted lax.scan with a single host
readback — the tunneled TPU has ~25-50 ms readback latency that otherwise
swamps per-stage timings (and the MPC consumes these stages sequentially
inside one program, so scan-time is the number that matters).

Also prints HLO entry-computation op counts (the dispatch-cost driver at
robot scale) per stage.

Run:  python benchmarks/profile_sap_step.py [--cpu] [--batch N] [--iters K]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--batch", type=int, default=256)
parser.add_argument("--iters", type=int, default=20)
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from iiwa_push_mpc import build_world

from drake_tpu.contact import sap
from drake_tpu.contact import plant as cplant
from drake_tpu.models import iiwa
from drake_tpu.multibody import dynamics as dyn
from drake_tpu.multibody import kinematics as kin


def entry_ops(fn, *a):
    """# instructions in the HLO entry computation (dispatch-cost proxy)."""
    try:
        txt = jax.jit(fn).lower(*a).compile().as_text()
        in_entry = False
        n = 0
        for line in txt.splitlines():
            if line.startswith("ENTRY "):
                in_entry = True
                continue
            if in_entry:
                if line.startswith("}"):
                    break
                s = line.strip()
                if "=" in s:
                    n += 1
        return n
    except Exception as e:  # pragma: no cover
        return f"?{type(e).__name__}"


def main():
    dtype = jnp.float32
    model, params, scene, side = build_world(dtype)
    nq, nv = model.num_positions, model.num_velocities
    h = 0.04
    K = args.iters

    q_arm = iiwa.home_position(dtype)
    q0 = jnp.concatenate(
        [q_arm, jnp.asarray([1, 0, 0, 0, 0.62, 0.0, side / 2], dtype)]
    )
    v0 = jnp.zeros(nv, dtype)

    B = args.batch
    key = jax.random.PRNGKey(0)
    qs = jnp.tile(q0[None], (B, 1)) + 0.01 * jax.random.normal(
        key, (B, nq), dtype
    )
    vs = jnp.tile(v0[None], (B, 1))
    taus = jnp.tile(jnp.zeros(nv, dtype)[None], (B, 1))

    print(f"backend={jax.default_backend()}  batch={B}  iters/stage={K}")

    def scan_time(label, per_iter_fn, n_ops_fn=None):
        """per_iter_fn: (q-like carry) -> scalar-ish; scanned K times."""

        @jax.jit
        def run(qs_):
            def body(c, _):
                out = per_iter_fn(qs_ + 1e-6 * c)
                # Fold output into a scalar carry so iterations chain.
                s = jax.tree_util.tree_reduce(
                    lambda a, x: a + jnp.sum(jnp.asarray(x, dtype)),
                    out, jnp.asarray(0.0, dtype),
                )
                return c + 1e-12 * s, None

            c, _ = jax.lax.scan(body, jnp.asarray(0.0, dtype), None, length=K)
            return c

        float(run(qs))  # compile + warm
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            float(run(qs))
        dt = (time.perf_counter() - t0) / reps / K
        ops = entry_ops(per_iter_fn, qs) if n_ops_fn is None else n_ops_fn
        print(f"  {label:<44s} {dt*1e3:9.2f} ms/iter   [{ops} entry ops]")

    def fk(qs_):
        return jax.vmap(lambda q: kin.forward_kinematics(model, params, q))(qs_)

    def mass(qs_):
        return jax.vmap(lambda q: dyn.mass_matrix(model, params, q))(qs_)

    def bias(qs_):
        return jax.vmap(lambda q: dyn.bias_forces(model, params, q, q[:nv]))(qs_)

    def query(qs_):
        return jax.vmap(lambda q: scene.query(model, params, q)[:3])(qs_)

    def cjac(qs_):
        def one(q):
            contact = scene.query(model, params, q)
            from drake_tpu.geometry.scene import contact_frame

            frames = contact_frame(contact.n_W)
            fl = [frames[c] for c in range(contact.phi.shape[0])]
            return sap.make_contact_jacobian(model, params, q, contact, fl)

        return jax.vmap(one)(qs_)

    def assemble(qs_):
        def one(q):
            data, _ = sap.assemble(
                model, params, scene, q, jnp.zeros(nv, dtype),
                jnp.zeros(nv, dtype), h,
            )
            return data.A, data.v_star, data.J

        return jax.vmap(one)(qs_)

    def full(qs_):
        def one(q):
            data, _ = sap.assemble(
                model, params, scene, q, jnp.zeros(nv, dtype),
                jnp.zeros(nv, dtype), h,
            )
            sol = sap.solve_sap(data, data.v_star)
            qn = cplant.advance_positions(model, params, q, sol.v, h)
            return qn, sol.v

        return jax.vmap(one)(qs_)

    scan_time("forward kinematics", fk)
    scan_time("mass matrix (CRBA)", mass)
    scan_time("bias forces (RNEA)", bias)
    scan_time("scene query (incl. FK)", query)
    scan_time("contact jacobian (incl. query)", cjac)
    scan_time("assemble (SapData)", assemble)
    scan_time("full step (assemble+solve+integrate)", full)


if __name__ == "__main__":
    main()
