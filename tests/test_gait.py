"""Full-gait planner tests — BASELINE config 3: 10-step sequence with
convex-hull ZMP constraints."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import tol

from blf_tpu.models.lipm import LIPMParams, lipm_omega
from blf_tpu.planners.contacts import ContactPhaseList, lower_contact_schedule
from blf_tpu.planners.gait import (
    footstep_plan,
    gait_references,
    plan_gait,
    support_polygons,
)

PARAMS = LIPMParams(jnp.asarray(0.9), jnp.asarray(9.81))
DT = 0.1


class TestFootstepPlan:
    def test_schedule_structure(self):
        lists = footstep_plan(num_steps=10)
        # 10 steps alternating: left swings 5 times -> 6 stance windows
        assert len(lists["left"]) == 6
        assert len(lists["right"]) == 6
        # phases alternate single/double support, all well-formed
        pl = ContactPhaseList()
        assert pl.set_lists(lists)
        assert len(pl) == 21  # DS + 10×(SS+DS)
        for phase in pl:
            assert phase.end_time > phase.begin_time
            assert 1 <= len(phase.active_contacts) <= 2

    def test_final_positions(self):
        lists = footstep_plan(num_steps=10, step_length=0.15)
        # each foot swings 5 times → advances 0.75
        np.testing.assert_allclose(lists["left"].last_contact().position[0], 0.75)
        np.testing.assert_allclose(lists["right"].last_contact().position[0], 0.75)


class TestSupportPolygons:
    def test_double_vs_single_support_area(self):
        lists = footstep_plan(num_steps=2)
        T = int(round(max(l.last_contact().deactivation_time
                          for l in lists.values()) / DT))
        schedule = lower_contact_schedule(lists, dt=DT, horizon=T)
        poly_A, poly_b = support_polygons(schedule)
        # knot 0: double support — hull spans both feet laterally (dy = 0.2+2*hw)
        # single-support knots have a small rectangle
        def width(k):
            # max feasible y extent: solve min/max y via vertices of box probe
            ys = np.linspace(-0.3, 0.3, 601)
            pts = np.stack([np.zeros_like(ys) + float(
                schedule.position[:, k, 0][schedule.active[:, k]].mean()
                if schedule.active[:, k].any() else 0.0), ys], -1)
            ok = np.einsum("fa,pa->pf", np.asarray(poly_A[k]), pts) <= np.asarray(poly_b[k]) + 1e-9
            return ys[ok.all(axis=1)]

        w_ds = width(0)
        assert w_ds.max() > 0.1 and w_ds.min() < -0.1   # spans both feet
        # find a single-support knot
        ss = int(np.argmax(schedule.active.sum(axis=0) == 1))
        w_ss = width(ss)
        assert (w_ss.max() - w_ss.min()) < 0.1           # one foot wide

    def test_references_follow_support(self):
        lists = footstep_plan(num_steps=4)
        T = int(round(max(l.last_contact().deactivation_time
                          for l in lists.values()) / DT))
        schedule = lower_contact_schedule(lists, dt=DT, horizon=T)
        zmp_ref, dcm_ref = gait_references(PARAMS, schedule, DT)
        assert zmp_ref.shape == (T, 2)
        assert dcm_ref.shape == (T + 1, 2)
        # reference starts between the feet and ends at the final centroid
        np.testing.assert_allclose(np.asarray(zmp_ref[0]), [0.0, 0.0], atol=1e-9)
        # 4 steps → each foot swings twice → final centroid x = 2 × 0.15
        np.testing.assert_allclose(np.asarray(zmp_ref[-1]), [0.3, 0.0], atol=1e-9)


class TestFullGait:
    def test_ten_step_gait_plan(self):
        """Config 3 acceptance: plan the whole 10-step gait in one QP."""
        lists = footstep_plan(num_steps=10, step_length=0.15)
        dcm0 = jnp.array([0.0, 0.0])
        plan, schedule = plan_gait(PARAMS, lists, DT, dcm0, dcm0,
                                   iterations=2000)
        assert bool(plan.qp.converged), (
            float(plan.qp.primal_residual), float(plan.qp.dual_residual))
        T = plan.zmp.shape[0]
        assert T == 96  # 9.6 s of gait (12 × 0.8 s windows) at dt = 0.1

        # every planned ZMP inside its support hull
        poly_A, poly_b = support_polygons(schedule)
        margins = np.einsum("kfa,ka->kf", np.asarray(poly_A),
                            np.asarray(plan.zmp)) - np.asarray(poly_b)
        assert margins.max() <= tol(1e-5, 5e-4), margins.max()

        # the DCM ends on the final double-support centroid
        np.testing.assert_allclose(
            np.asarray(plan.dcm[-1]), [0.75, 0.0], atol=0.02
        )
        # CoM walks forward monotonically-ish and stays bounded laterally
        com = np.asarray(plan.com)
        assert com[-1, 0] > 0.6
        assert np.abs(com[:, 1]).max() < 0.12
        assert np.all(np.isfinite(com))

    def test_batched_gait_scenarios(self):
        """A small sweep of initial-DCM perturbations over the same gait."""
        lists = footstep_plan(num_steps=6)
        rng = np.random.default_rng(0)
        dcm0s = jnp.asarray(rng.uniform(-0.02, 0.02, (8, 2)))

        # build the static problem once, then vmap the solve
        from blf_tpu.planners.gait import support_polygons, gait_references
        T = int(round(max(l.last_contact().deactivation_time
                          for l in lists.values()) / DT))
        schedule = lower_contact_schedule(lists, dt=DT, horizon=T)
        poly_A, poly_b = support_polygons(schedule)
        zmp_ref, dcm_ref = gait_references(PARAMS, schedule, DT)

        from blf_tpu.mpc.dcm import solve_dcm_mpc
        plans = jax.jit(jax.vmap(
            lambda d0: solve_dcm_mpc(PARAMS, DT, d0, d0, dcm_ref, zmp_ref,
                                     poly_A, poly_b, iterations=1500)
        ))(dcm0s)
        assert plans.zmp.shape == (8, T, 2)
        assert int(plans.qp.converged.sum()) >= 7
