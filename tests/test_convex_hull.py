"""Convex hull tests.

Port of `src/Planners/tests/ConvexHullHelperTest.cpp` (the 8-vertex prism
fixture with vertex-membership and outside-point checks), plus randomized
equivalence of the device-side monotone chain against scipy/Qhull.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blf_tpu.planners.convex_hull import (
    halfspaces_from_points,
    halfspaces_from_polygon,
    monotone_chain_2d,
    point_in_halfspaces,
)

# ConvexHullHelperTest.cpp:20-53 — 8 points, two rectangles at z=0.3 / z=0.24
PRISM_POINTS = np.array(
    [
        [0.6269, 0.7207, 0.3000],
        [0.5538, 0.6526, 0.3000],
        [0.6901, 0.5062, 0.3000],
        [0.7633, 0.5744, 0.3000],
        [0.8927, 0.7319, 0.2400],
        [0.8101, 0.6754, 0.2400],
        [0.9231, 0.5103, 0.2400],
        [1.0056, 0.5668, 0.2400],
    ]
)


class TestHostHull:
    def test_prism_vertices_belong(self):
        A, b = halfspaces_from_points(PRISM_POINTS)
        for p in PRISM_POINTS:
            assert bool(point_in_halfspaces(A, b, jnp.asarray(p)))

    def test_origin_outside(self):
        # ConvexHullHelperTest.cpp:58-62
        A, b = halfspaces_from_points(PRISM_POINTS)
        assert not bool(point_in_halfspaces(A, b, jnp.zeros(3)))

    def test_interior_point_belongs(self):
        A, b = halfspaces_from_points(PRISM_POINTS)
        centroid = PRISM_POINTS.mean(axis=0)
        assert bool(point_in_halfspaces(A, b, jnp.asarray(centroid)))

    def test_batched_membership(self):
        A, b = halfspaces_from_points(PRISM_POINTS)
        pts = jnp.asarray(np.vstack([PRISM_POINTS, np.zeros(3)]))
        res = np.asarray(point_in_halfspaces(A, b, pts))
        assert res[:-1].all() and not res[-1]

    def test_2d_square(self):
        square = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
        A, b = halfspaces_from_points(square)
        assert A.shape == (4, 2)
        assert bool(point_in_halfspaces(A, b, jnp.array([0.5, 0.5])))
        assert not bool(point_in_halfspaces(A, b, jnp.array([1.5, 0.5])))


class TestDeviceHull:
    """Fixed-shape 2-D hull inside jit (SURVEY.md §3.4's device path)."""

    @pytest.mark.parametrize("n", [3, 5, 10, 30])
    def test_matches_scipy(self, n):
        from scipy.spatial import ConvexHull

        rng = np.random.default_rng(n)
        pts = rng.uniform(-1, 1, size=(n, 2))
        poly = jax.jit(monotone_chain_2d)(jnp.asarray(pts))
        count = int(poly.count)
        ours = np.asarray(poly.vertices)[:count]
        ref = pts[ConvexHull(pts).vertices]  # CCW
        assert count == len(ref)
        # same cyclic order: align on the first vertex
        start = np.argmin(np.linalg.norm(ref - ours[0], axis=1))
        np.testing.assert_allclose(ours, np.roll(ref, -start, axis=0), atol=1e-12)

    def test_with_padding_mask(self):
        pts = np.array(
            [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [99.0, 99.0], [7.0, -3.0]]
        )
        valid = jnp.array([True, True, True, True, False, False])
        poly = monotone_chain_2d(jnp.asarray(pts), valid)
        assert int(poly.count) == 4
        verts = np.asarray(poly.vertices)[:4]
        assert {tuple(v) for v in verts} == {(0, 0), (1, 0), (1, 1), (0, 1)}

    def test_degenerate_inputs(self):
        two = monotone_chain_2d(jnp.array([[0.0, 0.0], [1.0, 1.0]]))
        assert int(two.count) == 2
        one = monotone_chain_2d(
            jnp.array([[2.0, 3.0], [0.0, 0.0]]), jnp.array([True, False])
        )
        assert int(one.count) == 1
        np.testing.assert_array_equal(np.asarray(one.vertices[0]), [2.0, 3.0])

    def test_collinear_points_dropped(self):
        pts = jnp.array([[0.0, 0.0], [0.5, 0.5], [1.0, 1.0], [1.0, 0.0]])
        poly = monotone_chain_2d(pts)
        assert int(poly.count) == 3

    def test_halfspaces_from_polygon_membership(self):
        rng = np.random.default_rng(11)
        pts = rng.uniform(-1, 1, size=(12, 2))
        poly = monotone_chain_2d(jnp.asarray(pts))
        A, b = halfspaces_from_polygon(poly)
        # all input points inside (tol for the hull vertices themselves)
        inside = point_in_halfspaces(A, b, jnp.asarray(pts))
        assert bool(jnp.all(inside))
        assert not bool(point_in_halfspaces(A, b, jnp.array([5.0, 0.0])))

    def test_vmap_over_scenarios(self):
        rng = np.random.default_rng(5)
        pts = jnp.asarray(rng.uniform(-1, 1, size=(8, 6, 2)))
        polys = jax.vmap(monotone_chain_2d)(pts)
        assert polys.vertices.shape == (8, 12, 2)
        solo = monotone_chain_2d(pts[3])
        assert int(polys.count[3]) == int(solo.count)
        np.testing.assert_array_equal(
            np.asarray(polys.vertices[3]), np.asarray(solo.vertices)
        )


class TestVariablesHandler:
    """Port of `src/System/tests/VariablesHandlerTest.cpp:15-35` + pack/unpack."""

    def test_offsets_and_sizes(self):
        from blf_tpu.planners.variables import VariablesHandler

        h = VariablesHandler()
        h.add_variable("variable_1", 42)
        h.add_variable("variable_2", 35)
        assert h.get_variable("variable_1").offset == 0
        assert h.get_variable("variable_1").size == 42
        assert h.get_variable("variable_2").offset == 42
        assert h.get_variable("variable_2").size == 35
        assert h.num_variables == 77
        with pytest.raises(KeyError):
            h.get_variable("variable_3")
        with pytest.raises(ValueError):
            h.add_variable("variable_1", 3)

    def test_pack_extract_unpack(self):
        from blf_tpu.planners.variables import VariablesHandler

        h = VariablesHandler()
        h.add_variable("com", 3)
        h.add_variable("zmp", 2)
        flat = h.pack({"com": jnp.array([1.0, 2.0, 3.0]), "zmp": jnp.array([4.0, 5.0])})
        np.testing.assert_array_equal(np.asarray(flat), [1, 2, 3, 4, 5])
        np.testing.assert_array_equal(np.asarray(h.extract("zmp", flat)), [4, 5])
        out = h.unpack(jnp.broadcast_to(flat, (7, 5)))
        assert out["com"].shape == (7, 3)
        with pytest.raises(KeyError):
            h.pack({"com": jnp.zeros(3)})
