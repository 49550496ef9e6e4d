"""Graph->forest topology with automatic loop cutting.

Reference: multibody/topology/graph.h + forest.h (LinkJointGraph::
BuildForest); loop modeling discipline from examples/multibody/four_bar
(cut joint -> SapBallConstraint).
"""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.contact import plant as cplant
from drake_tpu.geometry.scene import CollisionScene
from drake_tpu.multibody import topology as topo

F64 = jnp.float64


def _four_bar_graph():
    """The four-bar of test_four_bar, expressed as a graph WITH its loop."""
    g = topo.LinkGraph()
    rod = lambda L: np.diag([L**2 / 12, L**2 / 12, 1e-3])
    g.add_link("crank", mass=1.0, com=(0, 0, -0.5), inertia_com=rod(1.0))
    g.add_link("coupler", mass=1.0, com=(1.0, 0, 0), inertia_com=rod(2.0))
    g.add_link("rocker", mass=1.0, com=(0, 0, 0.5), inertia_com=rod(1.0))
    g.add_joint("ground_crank", parent=topo.WORLD, child="crank",
                axis=(0, 1, 0))
    g.add_joint("crank_coupler", parent="crank", child="coupler",
                axis=(0, 1, 0), p_PJ=(0, 0, -1.0))
    g.add_joint("coupler_rocker", parent="coupler", child="rocker",
                axis=(0, 1, 0), p_PJ=(2.0, 0, 0))
    # The loop: rocker tip pinned back to ground at (2, 0, 0).
    g.add_joint("rocker_ground", parent="rocker", child=topo.WORLD,
                axis=(0, 1, 0), p_PJ=(0, 0, 1.0), p_CJ=(2.0, 0, 0))
    return g


class TestSpanningForest:
    def test_forest_decomposition(self):
        g = _four_bar_graph()
        forest = g.spanning_forest()
        # BFS from world: 3 tree joints, exactly one cut joint.  Both
        # world-adjacent joints are tree edges (shortest-hop forest, the
        # reference BuildForest behavior), so the cut lands mid-chain.
        assert len(forest.tree_edges) == 3
        names = {j.name for j, _ in forest.tree_edges}
        assert {"ground_crank", "rocker_ground"} <= names
        assert len(forest.loop_joints) == 1
        assert forest.loop_joints[0].name not in names
        # rocker_ground is traversed world->rocker: reversed.
        rev = {j.name: fwd for j, fwd in forest.tree_edges}
        assert rev["ground_crank"] and not rev["rocker_ground"]

    def test_disconnected_raises(self):
        g = topo.LinkGraph()
        g.add_link("orphan", mass=1.0)
        try:
            g.spanning_forest()
            assert False, "expected ValueError"
        except ValueError as e:
            assert "orphan" in str(e)

    def test_cut_joint_becomes_ball_constraint(self):
        model, params, balls, welds = _four_bar_graph().build(F64)
        assert model.num_positions == 3 and not welds
        assert len(balls) == 1
        ia, pa, ib, pb = balls[0]
        # The cut joint connects two tree bodies (coupler<->rocker here).
        assert {ia, ib} == {model.body_index("coupler"),
                            model.body_index("rocker")}
        # At q=0 the mechanism is assembled: residual is zero.
        r = topo.loop_residual(model, params, balls, jnp.zeros(3, F64))
        assert float(jnp.linalg.norm(r)) < 1e-12


class TestAssembleAndSimulate:
    def test_assemble_projects_onto_loop_manifold(self):
        model, params, balls, _ = _four_bar_graph().build(F64)
        q_guess = jnp.asarray([1.0, 0.9, 0.1], F64)
        q0, err = topo.assemble(model, params, balls, q_guess)
        assert err < 1e-8
        # Gauss-Newton projects to a NEARBY manifold point, not back to 0.
        assert abs(float(q0[0])) > 0.3

    def test_dynamics_keeps_loop_closed(self):
        model, params, balls, _ = _four_bar_graph().build(F64)
        dsys = cplant.make_discrete_system(
            model, params, CollisionScene.build([]), 2e-3,
            ball_constraints=balls,
        )
        x = jnp.zeros(6, F64)
        u = jnp.asarray([3.0, 0.0, 0.0], F64)
        step = jax.jit(lambda xx: dsys.g(params, xx, u))
        for _ in range(300):
            x = step(x)
        assert np.isfinite(np.asarray(x)).all()
        r = topo.loop_residual(model, params, balls, x[:3])
        assert float(jnp.linalg.norm(r)) < 2e-3
        assert abs(float(x[0])) > 0.05  # it moved
