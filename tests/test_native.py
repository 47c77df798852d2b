"""Native C++ host-runtime tests: exact agreement with the Python reference
implementations and with the planners-layer semantics, plus the throughput
reason the component exists."""

import time

import numpy as np
import pytest

from blf_tpu import native
from blf_tpu.planners.contacts import ContactList, lower_contact_schedule

needs_native = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain available"
)


def random_schedules(rng, B=32, E=2, C=6):
    """Padded random non-overlapping window sets + the equivalent ContactLists."""
    activation = np.zeros((B, E, C))
    deactivation = np.zeros((B, E, C))
    counts = np.zeros((B, E), dtype=np.int32)
    positions = np.zeros((B, E, C, 3))
    lists = []
    for b in range(B):
        per_b = {}
        for e in range(E):
            t = rng.uniform(0, 0.3)
            n = rng.integers(1, C + 1)
            lst = ContactList(default_name=f"e{e}")
            for c in range(n):
                dur = rng.uniform(0.2, 0.8)
                gap = rng.uniform(0.05, 0.4)
                p = rng.normal(size=3)
                activation[b, e, c] = t
                deactivation[b, e, c] = t + dur
                positions[b, e, c] = p
                assert lst.add_contact(position=p, activation_time=t,
                                       deactivation_time=t + dur)
                t += dur + gap
            counts[b, e] = n
            per_b[f"e{e}"] = lst
        lists.append(per_b)
    return activation, deactivation, counts, positions, lists


class TestScheduleLowering:
    @needs_native
    def test_native_matches_python_reference(self):
        rng = np.random.default_rng(0)
        act, deact, cnt, pos, _ = random_schedules(rng)
        a1, i1, p1 = native.lower_schedules_batch(act, deact, cnt, pos, 40, 0.1)
        a2, i2, p2 = native.lower_schedules_batch(act, deact, cnt, pos, 40, 0.1,
                                                  force_python=True)
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(p1, p2)

    @needs_native
    def test_matches_planners_layer(self):
        """C++ lowering agrees with the reference-semantics ContactList path."""
        rng = np.random.default_rng(1)
        act, deact, cnt, pos, lists = random_schedules(rng, B=8)
        a, i, p = native.lower_schedules_batch(act, deact, cnt, pos, 30, 0.1)
        for b in range(8):
            sched = lower_contact_schedule(lists[b], dt=0.1, horizon=30)
            for e, name in enumerate(sched.names):
                np.testing.assert_array_equal(a[b, e], sched.active[e], err_msg=f"{b} {name}")
                np.testing.assert_array_equal(i[b, e], sched.contact_index[e])
                np.testing.assert_allclose(p[b, e], sched.position[e])

    @needs_native
    def test_throughput_wins_over_python(self):
        rng = np.random.default_rng(2)
        act, deact, cnt, pos, _ = random_schedules(rng, B=512)
        # Warm up both paths (first native call pays dlopen + page-in costs),
        # then take best-of-3 to shrug off scheduler noise.
        native.lower_schedules_batch(act, deact, cnt, pos, 100, 0.05)
        native.lower_schedules_batch(act, deact, cnt, pos, 100, 0.05,
                                     force_python=True)

        def best_of(fn, n=3):
            best = float("inf")
            for _ in range(n):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            return best

        t_native = best_of(lambda: native.lower_schedules_batch(
            act, deact, cnt, pos, 100, 0.05))
        t_python = best_of(lambda: native.lower_schedules_batch(
            act, deact, cnt, pos, 100, 0.05, force_python=True))
        assert t_native < t_python  # typically 10-100x

    def test_python_fallback_always_works(self):
        rng = np.random.default_rng(3)
        act, deact, cnt, pos, _ = random_schedules(rng, B=4)
        a, i, p = native.lower_schedules_batch(act, deact, cnt, pos, 20, 0.1,
                                               force_python=True)
        assert a.shape == (4, 2, 20)


class TestNativeHull:
    @needs_native
    def test_matches_scipy(self):
        from scipy.spatial import ConvexHull

        rng = np.random.default_rng(4)
        for n in (3, 8, 50):
            pts = rng.uniform(-1, 1, (n, 2))
            ours = native.monotone_chain(pts)
            ref = pts[ConvexHull(pts).vertices]
            assert len(ours) == len(ref)
            start = np.argmin(np.linalg.norm(ref - ours[0], axis=1))
            np.testing.assert_allclose(ours, np.roll(ref, -start, axis=0),
                                       atol=1e-12)

    @needs_native
    def test_degenerate(self):
        two = native.monotone_chain(np.array([[0.0, 0.0], [1.0, 1.0]]))
        assert len(two) == 2
        col = native.monotone_chain(
            np.array([[0.0, 0.0], [0.5, 0.5], [1.0, 1.0]])
        )
        assert len(col) == 2  # collinear midpoint dropped

    @needs_native
    def test_support_polygons_match_python(self):
        rng = np.random.default_rng(5)
        B, E, T = 6, 2, 15
        active = rng.random((B, E, T)) > 0.3
        active[:, 0, 0] = True  # ensure knot 0 non-empty
        foot_xy = rng.normal(size=(B, E, T, 2)) * 0.2
        A1, b1 = native.support_polygons_batch(active, foot_xy, 0.07, 0.04)
        A2, b2 = native.support_polygons_batch(active, foot_xy, 0.07, 0.04,
                                               force_python=True)
        np.testing.assert_allclose(A1, A2, atol=1e-12)
        np.testing.assert_allclose(b1, b2, atol=1e-12)

    @needs_native
    def test_polygon_membership_sanity(self):
        active = np.ones((1, 2, 1), dtype=bool)
        foot_xy = np.array([[[[0.0, 0.1]], [[0.0, -0.1]]]])
        A, b = native.support_polygons_batch(active, foot_xy, 0.07, 0.04)
        margins = A[0, 0] @ np.array([0.0, 0.0]) - b[0, 0]
        assert margins.max() <= 1e-12       # centroid inside
        margins_out = A[0, 0] @ np.array([0.5, 0.0]) - b[0, 0]
        assert margins_out.max() > 0        # far point outside
