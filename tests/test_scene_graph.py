"""Geometry roles + CollisionFilterManager (scene_graph.py).

Mirrors the reference's geometry/test/collision_filter_manager_test.cc and
geometry_state role gating: role-restricted geometries leave/enter the
candidate-pair set, declarations compose sequentially, GeometrySets
resolve by name and by body.
"""

import numpy as np
import pytest

from drake_tpu.geometry import scene_graph as sg
from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene


def _geoms():
    return [
        CollisionGeometry("ground", -1, sh.HalfSpace()),
        CollisionGeometry("ball_a", 0, sh.Sphere(0.1)),
        CollisionGeometry("ball_b", 1, sh.Sphere(0.1)),
        CollisionGeometry("ball_c", 2, sh.Sphere(0.1)),
    ]


def _pair_names(scene):
    return {
        frozenset((scene.geometries[i].name, scene.geometries[j].name))
        for i, j in scene.pairs
    }


def test_default_all_pairs():
    scene = CollisionScene.build(_geoms())
    assert len(scene.pairs) == 6  # C(4,2) minus no halfspace-halfspace


def test_visual_only_geometry_excluded_from_proximity():
    geoms = _geoms()
    # A visual-only mesh shell on body 0 (illustration+perception, NO
    # proximity) must not create candidate pairs.
    geoms.append(CollisionGeometry(
        "shell", 0, sh.Sphere(0.12),
        roles=sg.ILLUSTRATION | sg.PERCEPTION))
    scene = CollisionScene.build(geoms)
    names = _pair_names(scene)
    assert not any("shell" in fs for fs in names)
    assert len(scene.pairs) == 6


def test_role_mask_helpers():
    assert sg.role_mask("proximity") == sg.PROXIMITY
    assert sg.role_mask(["illustration", "perception"]) == (
        sg.ILLUSTRATION | sg.PERCEPTION)
    assert sg.role_mask(None) == sg.ALL_ROLES
    g = CollisionGeometry("x", 0, sh.Sphere(1.0), roles=sg.PROXIMITY)
    assert sg.has_role(g, sg.PROXIMITY)
    assert not sg.has_role(g, sg.PERCEPTION)
    idx = sg.geometries_with_role(
        [g, CollisionGeometry("y", 1, sh.Sphere(1.0))], sg.PERCEPTION)
    assert idx == [1]


def test_exclude_between_by_name():
    geoms = _geoms()
    fm = sg.CollisionFilterManager(geoms)
    fm.apply(sg.CollisionFilterDeclaration().exclude_between(
        sg.GeometrySet.of(names=["ground"]),
        sg.GeometrySet.of(names=["ball_a", "ball_b"])))
    scene = CollisionScene.build(geoms, filter_manager=fm)
    names = _pair_names(scene)
    assert frozenset(("ground", "ball_a")) not in names
    assert frozenset(("ground", "ball_b")) not in names
    assert frozenset(("ground", "ball_c")) in names
    assert len(scene.pairs) == 4


def test_exclude_within_by_body():
    geoms = _geoms()
    fm = sg.CollisionFilterManager(geoms)
    # Filter all pairs among bodies 0,1,2 (e.g. a welded subassembly).
    fm.apply(sg.CollisionFilterDeclaration().exclude_within(
        sg.GeometrySet.of(bodies=[0, 1, 2])))
    scene = CollisionScene.build(geoms, filter_manager=fm)
    names = _pair_names(scene)
    assert names == {
        frozenset(("ground", "ball_a")),
        frozenset(("ground", "ball_b")),
        frozenset(("ground", "ball_c")),
    }


def test_allow_reverses_exclude():
    geoms = _geoms()
    fm = sg.CollisionFilterManager(geoms)
    everything = sg.GeometrySet.of(bodies=[0, 1, 2], names=["ground"])
    fm.apply(sg.CollisionFilterDeclaration()
             .exclude_within(everything)
             .allow_between(sg.GeometrySet.of(names=["ball_a"]),
                            sg.GeometrySet.of(names=["ball_b"])))
    scene = CollisionScene.build(geoms, filter_manager=fm)
    assert _pair_names(scene) == {frozenset(("ball_a", "ball_b"))}


def test_unknown_name_raises():
    geoms = _geoms()
    fm = sg.CollisionFilterManager(geoms)
    with pytest.raises(ValueError, match="not registered"):
        fm.apply(sg.CollisionFilterDeclaration().exclude_within(
            sg.GeometrySet.of(names=["nope"])))


def test_filtered_scene_still_queries():
    # The filtered scene's contact query runs end-to-end (pair pruning is
    # consistent with num_contacts / ContactData shapes).
    from drake_tpu.multibody.model import ModelBuilder

    import jax.numpy as jnp

    builder = ModelBuilder()
    b0 = builder.add_body(
        "ball_body", parent=None, joint_type="floating", mass=1.0,
        inertia_com=0.01 * np.eye(3))
    model, params = builder.build(jnp.float64)
    geoms = [
        CollisionGeometry("ground", -1, sh.HalfSpace()),
        CollisionGeometry("ball", b0, sh.Sphere(0.1)),
        CollisionGeometry("viz", b0, sh.Box((1, 1, 1)),
                          roles=sg.ILLUSTRATION),
    ]
    scene = CollisionScene.build(geoms)
    assert len(scene.pairs) == 1
    q = jnp.asarray([1.0, 0, 0, 0, 0, 0, 0.05])
    data = scene.query(model, params, q)
    assert data.phi.shape[0] == scene.num_contacts
    assert float(data.phi[0]) == pytest.approx(-0.05, abs=1e-6)
