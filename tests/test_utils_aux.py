"""Auxiliary-subsystem tests: containers, telemetry, checkpoint, status
(SURVEY.md §5's build items; GenericContainer test patterns from
`src/GenericContainer/tests/GenericContainerTest.cpp`)."""

import io
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blf_tpu.utils import checkpoint, containers, status, telemetry


class TestFlatViews:
    """The GenericContainer::Vector role: named non-owning windows."""

    def test_make_view_and_roundtrip(self):
        views, total = containers.make_view(
            {"com": (3,), "rot": (3, 3), "scalar": ()}
        )
        assert total == 13
        flat = jnp.arange(13.0)
        np.testing.assert_array_equal(np.asarray(views["com"].read(flat)), [0, 1, 2])
        assert views["rot"].read(flat).shape == (3, 3)
        assert float(views["scalar"].read(flat)) == 12.0

        updated = views["com"].write(flat, jnp.array([9.0, 9.0, 9.0]))
        np.testing.assert_array_equal(np.asarray(updated[:3]), [9, 9, 9])
        np.testing.assert_array_equal(np.asarray(updated[3:]), np.asarray(flat[3:]))

    def test_views_are_batched(self):
        views, total = containers.make_view({"a": (2,), "b": (2,)})
        flat = jnp.arange(12.0).reshape(3, 4)
        assert views["b"].read(flat).shape == (3, 2)

    def test_views_work_under_jit(self):
        views, total = containers.make_view({"a": (2,), "b": (3,)})

        @jax.jit
        def f(flat):
            return views["a"].read(flat) @ jnp.ones(2), views["b"].read(flat)

        s, b = f(jnp.arange(5.0))
        assert float(s) == 1.0
        assert b.shape == (3,)

    def test_structure_predicates(self):
        a = {"x": jnp.zeros(3), "y": (jnp.ones((2, 2)),)}
        b = {"x": jnp.ones(3), "y": (jnp.zeros((2, 2)),)}
        c = {"x": jnp.ones(4), "y": (jnp.zeros((2, 2)),)}
        assert containers.same_structure(a, b)
        assert not containers.same_structure(a, c)
        assert containers.is_resizable_like([1, 2])
        assert containers.is_resizable_like(np.zeros(3))
        assert not containers.is_resizable_like(jnp.zeros(3))
        assert not containers.is_resizable_like((1, 2))

    def test_bounded_flatten_roundtrip(self):
        tree = {"a": jnp.array([1.0, 2.0]), "b": jnp.eye(2)}
        padded, n = containers.flatten_bounded(tree, capacity=10)
        assert n == 6 and padded.shape == (10,)
        back = containers.unflatten_bounded(tree, padded)
        np.testing.assert_array_equal(np.asarray(back["b"]), np.eye(2))
        with pytest.raises(ValueError):
            containers.flatten_bounded(tree, capacity=4)


class TestTelemetry:
    def test_merge_and_publish(self):
        sink = io.StringIO()
        stream = telemetry.TelemetryStream(sink=sink, name="mpc")
        rec = stream.publish(
            {"cost": jnp.asarray(1.5), "dcm": jnp.array([0.1, 0.2]),
             "converged": jnp.asarray(42.0)},
            step=7,
        )
        line = json.loads(sink.getvalue().strip())
        assert line["step"] == 7 and line["stream"] == "mpc"
        assert line["cost"] == 1.5
        assert line["dcm"] == [pytest.approx(0.1), pytest.approx(0.2)]
        assert stream.history[-1] == rec

    def test_merge_layout(self):
        merged, layout = telemetry.merge_metrics(
            {"a": jnp.zeros(3), "b": jnp.asarray(2.0)}
        )
        assert merged.shape == (4,)
        assert layout == [("a", (3,)), ("b", ())]

    def test_logger_format(self):
        log = telemetry.get_logger()
        assert log.name == "blf_tpu"


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from blf_tpu.parallel.sweep import init_fleet

        state = init_fleet(4, 8, 48, jnp.array([0.1, 0.2]), jnp.zeros(2))
        p = str(tmp_path / "fleet.npz")
        checkpoint.save_checkpoint(p, state, step=13)
        restored = checkpoint.load_checkpoint(p, state)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            state, restored,
        )
        assert checkpoint.checkpoint_step(p) == 13

    def test_shape_mismatch_raises(self, tmp_path):
        p = str(tmp_path / "x.npz")
        checkpoint.save_checkpoint(p, {"a": jnp.zeros(3)})
        with pytest.raises(ValueError):
            checkpoint.load_checkpoint(p, {"a": jnp.zeros(4)})


class TestStatus:
    def _sol(self, x, converged, rp=0.0):
        from blf_tpu.mpc.qp import QPSolution

        B = x.shape[0]
        return QPSolution(
            x=x, y=jnp.zeros((B, 1)), z=jnp.zeros((B, 1)),
            primal_residual=jnp.full((B,), rp),
            dual_residual=jnp.zeros((B,)),
            converged=converged, objective=jnp.zeros((B,)),
        )

    def test_classification(self):
        x = jnp.array([[1.0, 2.0], [jnp.nan, 0.0], [3.0, 4.0]])
        conv = jnp.array([True, True, False])
        s = status.classify_qp(self._sol(x, conv))
        assert list(np.asarray(s)) == [0, 2, 1]
        counts = status.status_counts(s)
        assert counts == {"converged": 1, "max_iterations": 1,
                          "numerical_error": 1}

    def test_nan_quarantine(self):
        x = jnp.array([[1.0, 2.0], [jnp.nan, 0.0]])
        s = status.classify_qp(self._sol(x, jnp.array([True, True])))
        state = {"dcm": x, "cov": jnp.stack([jnp.eye(2) * 5, jnp.eye(2) * jnp.nan])}
        reset = {"dcm": jnp.zeros(2), "cov": jnp.eye(2)}
        fixed = status.nan_quarantine(state, s, reset)
        np.testing.assert_array_equal(np.asarray(fixed["dcm"][1]), [0, 0])
        np.testing.assert_array_equal(np.asarray(fixed["cov"][1]), np.eye(2))
        np.testing.assert_array_equal(np.asarray(fixed["dcm"][0]), [1, 2])
