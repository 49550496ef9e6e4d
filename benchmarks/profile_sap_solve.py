"""Micro-profile the SAP Newton solve internals on TPU.

Times each candidate hot spot over a 20-iteration jitted scan (single host
readback; see profile_sap_step.py for why).

Run:  python benchmarks/profile_sap_solve.py [--cpu] [--batch N]
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
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from iiwa_push_mpc import build_world

from drake_tpu.contact import sap
from drake_tpu.models import iiwa


def scan_time(label, per_iter_fn, x0, K=20, reps=3):
    @jax.jit
    def run(x):
        def body(c, _):
            out = per_iter_fn(x, c)
            s = jax.tree_util.tree_reduce(
                lambda a, y: a + jnp.sum(jnp.asarray(y, jnp.float32)),
                out,
                jnp.asarray(0.0, jnp.float32),
            )
            return c + 1e-12 * s, None

        c, _ = jax.lax.scan(
            body, jnp.asarray(0.0, jnp.float32), None, length=K
        )
        return c

    float(run(x0))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(run(x0))
    dt = (time.perf_counter() - t0) / reps / K
    print(f"  {label:<52s} {dt*1e3:9.3f} ms/iter")


def main():
    dtype = jnp.float32
    model, params, scene, side = build_world(dtype)
    nq, nv = model.num_positions, model.num_velocities
    h = 0.04
    B = args.batch

    q_arm = iiwa.home_position(dtype)
    q0 = jnp.concatenate(
        [q_arm, jnp.asarray([1, 0, 0, 0, 0.62, 0.0, side / 2], dtype)]
    )
    key = jax.random.PRNGKey(0)
    qs = jnp.tile(q0[None], (B, 1)) + 0.01 * jax.random.normal(
        key, (B, nq), dtype
    )

    # Pre-assemble a batch of SapData (outside the timed region).
    @jax.jit
    def assemble_all(qs_):
        def one(q):
            data, _ = sap.assemble(
                model, params, scene, q, jnp.zeros(nv, dtype),
                jnp.zeros(nv, dtype), h,
            )
            return data

        return jax.vmap(one)(qs_)

    datas = assemble_all(qs)
    datas = jax.tree_util.tree_map(jax.device_put, datas)
    H0 = datas.A  # (B, nv, nv) SPD proxy for factorization timing
    g0 = datas.v_star

    print(f"backend={jax.default_backend()}  batch={B}  nv={nv}  "
          f"nc={datas.R.shape[1]}")

    scan_time(
        "cho_factor + cho_solve (B,13,13)",
        lambda x, c: jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(x + c * 1e-9), g0
        ),
        H0,
    )
    scan_time(
        "jnp.linalg.solve (B,13,13)",
        lambda x, c: jnp.linalg.solve(x + c * 1e-9, g0[..., None])[..., 0],
        H0,
    )
    scan_time(
        "jnp.linalg.cholesky + triangular_solve x2",
        lambda x, c: jax.lax.linalg.triangular_solve(
            jnp.linalg.cholesky(x + c * 1e-9),
            g0[..., None], left_side=True, lower=True,
        ),
        H0,
    )

    def full_solve(d, c):
        sol = jax.vmap(lambda dd: sap.solve_sap(dd, dd.v_star))(
            jax.tree_util.tree_map(lambda a: a, d)
        )
        return sol.v

    scan_time("full sap solve (while_loop)", full_solve, datas)

    # grad+hess only.
    def gh(d, c):
        def one(dd):
            def gamma_of_vc(vc, R, vhat, mu):
                return sap._project_gamma((vhat - vc) / R, R, mu)

            v = dd.v_star + c * 1e-9
            vc = jnp.einsum("cij,j->ci", dd.J, v)
            gammas = jax.vmap(gamma_of_vc)(vc, dd.R, dd.vhat, dd.mu)
            Gs = -jax.vmap(jax.jacfwd(gamma_of_vc))(vc, dd.R, dd.vhat, dd.mu)
            grad = dd.A @ (v - dd.v_star) - jnp.einsum(
                "cij,ci->j", dd.J, gammas
            )
            H = dd.A + jnp.einsum(
                "cik,ckl,clj->ij", jnp.swapaxes(dd.J, 1, 2), Gs, dd.J
            )
            return grad, H

        return jax.vmap(one)(d)

    scan_time("grad + hessian assembly", gh, datas)


if __name__ == "__main__":
    main()
