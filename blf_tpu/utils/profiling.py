"""Tracing / profiling / speed-of-light accounting.

The reference has **no** instrumentation at all (SURVEY.md §5: no timers
anywhere in `/root/reference/src`; CI wall-clock is the only signal). The
BASELINE efficiency row, however, requires the new framework to account for
its hot kernels against speed-of-light per chip. This module is that
subsystem, TPU-first:

- :class:`ChipSpec` + :func:`detect_chip` — per-generation peak FLOP/s and
  HBM bandwidth (roofline ceilings).
- :func:`measure` — ``block_until_ready`` timing harness (warmup + best-of /
  median over repeats, so one-off dispatch jitter never pollutes a number).
- :func:`cost_analysis` — XLA's own compiled-program FLOP / bytes-accessed
  estimate (``Compiled.cost_analysis()``), which sees the program *after*
  fusion — the honest numerator/denominator for a roofline.
- :func:`sol_report` — ties the two together: measured time vs. the roofline
  bound ``max(flops/peak_flops, bytes/bandwidth)``, reporting the achieved
  fraction of speed-of-light and whether the program is compute- or
  memory-bound.
- :func:`trace` — ``jax.profiler`` annotation context so regions show up
  named in TensorBoard/xprof traces (the mechanism SURVEY.md §5 prescribes
  for rollout/QP-iteration regions).

Run ``python -m blf_tpu.utils.profiling`` for a SOL table of the framework's
hot programs (QP factor, fleet solve, rigid-body rollout) on the current
backend.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax

__all__ = [
    "ChipSpec",
    "CHIP_SPECS",
    "detect_chip",
    "measure",
    "cost_analysis",
    "roofline_seconds",
    "sol_report",
    "trace",
]


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    """Roofline ceilings for one accelerator chip.

    ``peak_flops_f32``/``peak_flops_bf16`` in FLOP/s, ``hbm_bytes_per_s`` in
    B/s. Public numbers (cloud.google.com/tpu/docs/system-architecture);
    f32 matmul on the MXU runs at half bf16 rate on all listed generations.
    """

    name: str
    peak_flops_bf16: float
    peak_flops_f32: float
    hbm_bytes_per_s: float

    def peak_flops(self, dtype: str = "f32") -> float:
        return self.peak_flops_bf16 if dtype == "bf16" else self.peak_flops_f32


CHIP_SPECS: Dict[str, ChipSpec] = {
    # keyed by substrings of jax Device.device_kind
    "v4": ChipSpec("TPU v4", 275e12, 137.5e12, 1228e9),
    "v5 lite": ChipSpec("TPU v5e", 197e12, 98.5e12, 819e9),
    "v5e": ChipSpec("TPU v5e", 197e12, 98.5e12, 819e9),
    "v5p": ChipSpec("TPU v5p", 459e12, 229.5e12, 2765e9),
    "v5": ChipSpec("TPU v5p", 459e12, 229.5e12, 2765e9),
    "v6 lite": ChipSpec("TPU v6e", 918e12, 459e12, 1640e9),
    "v6e": ChipSpec("TPU v6e", 918e12, 459e12, 1640e9),
    # CPU fallback so SOL accounting degrades gracefully on the test mesh:
    # rough single-socket numbers, only used for relative comparisons.
    "cpu": ChipSpec("host CPU", 1e12, 5e11, 5e10),
}


def detect_chip(device: Optional[jax.Device] = None) -> ChipSpec:
    """Map the active jax device to its :class:`ChipSpec` (CPU fallback)."""
    if device is None:
        device = jax.devices()[0]
    kind = device.device_kind.lower()
    # longest-match wins so "v5 lite" beats "v5"
    best = None
    for key, spec in CHIP_SPECS.items():
        if key in kind and (best is None or len(key) > len(best[0])):
            best = (key, spec)
    if best is not None:
        return best[1]
    return CHIP_SPECS["cpu"]


def measure(
    fn: Callable[..., Any],
    *args: Any,
    warmup: int = 2,
    repeats: int = 5,
    inner: int = 1,
    reduce: str = "median",
) -> float:
    """Wall-clock seconds for one call of ``fn(*args)`` on device.

    ``fn`` should already be jitted; the first ``warmup`` calls absorb
    compilation and cache effects. Each repeat times ``inner`` back-to-back
    calls (raise ``inner`` for sub-millisecond programs so the host timer
    resolution stops mattering) and blocks on the result.
    """
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    jax.block_until_ready(out)
    samples = []
    for _ in range(max(repeats, 1)):
        t0 = time.perf_counter()
        for _ in range(max(inner, 1)):
            out = fn(*args)
        jax.block_until_ready(out)
        samples.append((time.perf_counter() - t0) / max(inner, 1))
    samples.sort()
    if reduce == "min":
        return samples[0]
    return samples[len(samples) // 2]


def cost_analysis(fn: Callable[..., Any], *args: Any) -> Dict[str, float]:
    """Post-fusion FLOPs / bytes accessed for ``jit(fn)(*args)`` from XLA.

    Returns ``{"flops": ..., "bytes": ...}``; zero when the backend does not
    publish an estimate (some CPU builds), so callers must treat 0 as
    "unknown", not "free".
    """
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    compiled = jitted.lower(*args).compile()
    stats = compiled.cost_analysis()
    if isinstance(stats, (list, tuple)):  # older jax returns [dict]
        stats = stats[0] if stats else {}
    stats = stats or {}
    return {
        "flops": float(stats.get("flops", 0.0)),
        "bytes": float(stats.get("bytes accessed", 0.0)),
    }


def roofline_seconds(flops: float, nbytes: float, spec: ChipSpec,
                     dtype: str = "f32") -> float:
    """Speed-of-light time: max of the compute and memory roofline bounds."""
    peak = spec.peak_flops(dtype)
    return max(flops / peak if peak else 0.0,
               nbytes / spec.hbm_bytes_per_s if spec.hbm_bytes_per_s else 0.0)


def sol_report(
    fn: Callable[..., Any],
    *args: Any,
    label: str = "program",
    dtype: str = "f32",
    spec: Optional[ChipSpec] = None,
    warmup: int = 2,
    repeats: int = 5,
    inner: int = 1,
) -> Dict[str, Any]:
    """Measure ``fn`` and score it against the chip roofline.

    Returns a flat metrics dict (telemetry-friendly):
    ``time_s``, ``flops``, ``bytes``, ``achieved_tflops``, ``achieved_gbps``,
    ``sol_time_s``, ``sol_frac`` (measured speed-of-light fraction, 1.0 =
    at the roofline), and ``bound`` ("compute" | "memory" | "unknown").
    """
    spec = spec or detect_chip()
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    cost = cost_analysis(jitted, *args)
    t = measure(jitted, *args, warmup=warmup, repeats=repeats, inner=inner)
    sol_t = roofline_seconds(cost["flops"], cost["bytes"], spec, dtype)
    compute_t = cost["flops"] / spec.peak_flops(dtype)
    memory_t = (cost["bytes"] / spec.hbm_bytes_per_s
                if spec.hbm_bytes_per_s else 0.0)
    if cost["flops"] == 0.0 and cost["bytes"] == 0.0:
        bound = "unknown"
    else:
        bound = "compute" if compute_t >= memory_t else "memory"
    return {
        "label": label,
        "chip": spec.name,
        "dtype": dtype,
        "time_s": t,
        "flops": cost["flops"],
        "bytes": cost["bytes"],
        "achieved_tflops": cost["flops"] / t / 1e12,
        "achieved_gbps": cost["bytes"] / t / 1e9,
        "sol_time_s": sol_t,
        "sol_frac": (sol_t / t) if sol_t > 0 else 0.0,
        "bound": bound,
    }


@contextlib.contextmanager
def trace(name: str):
    """Named profiler region: shows up in xprof/TensorBoard traces.

    Host-side region naming (``jax.profiler.TraceAnnotation``) combined with
    ``jax.named_scope`` so the annotation survives into the HLO too.
    """
    with jax.profiler.TraceAnnotation(name), jax.named_scope(name):
        yield


def _format_row(r: Dict[str, Any]) -> str:
    return (f"{r['label']:<28} {r['time_s'] * 1e3:>9.3f} ms "
            f"{r['achieved_tflops']:>8.2f} TF/s {r['achieved_gbps']:>8.1f} GB/s "
            f"SOL {100.0 * r['sol_frac']:>5.1f}% ({r['bound']})")


def main() -> None:  # pragma: no cover - exercised on hardware
    """SOL table for the framework's hot programs on the current backend."""
    import numpy as np
    import jax.numpy as jnp

    from blf_tpu.mpc.qp import factor_shared_qp, solve_qp_factored
    from blf_tpu.mpc.dcm import build_dcm_qp
    from blf_tpu.models.lipm import LIPMParams

    spec = detect_chip()
    print(f"chip: {spec.name}  peak {spec.peak_flops_bf16 / 1e12:.0f} TF/s "
          f"bf16, {spec.hbm_bytes_per_s / 1e9:.0f} GB/s HBM")

    dtype = jnp.float32
    batch, horizon = 16384, 16
    params = LIPMParams(jnp.asarray(0.9, dtype), jnp.asarray(9.81, dtype))
    dt = 0.1
    zmp_ref = jnp.zeros((horizon, 2), dtype)
    dcm_ref = jnp.zeros((horizon + 1, 2), dtype)
    poly_A = jnp.tile(jnp.asarray(
        [[1.0, 0], [-1.0, 0], [0, 1.0], [0, -1.0]], dtype), (horizon, 1, 1))
    poly_b = jnp.broadcast_to(jnp.asarray([0.1, 0.1, 0.06, 0.06], dtype),
                              (horizon, 4))
    P, qvec, A, l, u = build_dcm_qp(params, dt, jnp.zeros(2, dtype),
                                    dcm_ref, zmp_ref, poly_A, poly_b)
    n, m = P.shape[0], A.shape[0]
    is_eq = jnp.arange(m) < 2 * horizon
    factors = jax.jit(factor_shared_qp)(P, A, is_eq)
    rng = np.random.default_rng(0)
    q_b = qvec + jnp.asarray(rng.normal(0, 0.01, (batch, n)), dtype)
    l_b = jnp.broadcast_to(l, (batch, m))
    u_b = jnp.broadcast_to(u, (batch, m))

    rows = []
    rows.append(sol_report(
        lambda Pm, Am: factor_shared_qp(Pm, Am, is_eq), P, A,
        label="qp.factor_shared (1x)", inner=4))

    solve = jax.jit(lambda q, lo, hi: jax.vmap(
        lambda qq, ll, uu: solve_qp_factored(
            factors, qq, ll, uu, iterations=50)
    )(q, lo, hi))
    rows.append(sol_report(
        solve, q_b, l_b, u_b,
        label=f"qp.solve_factored (B={batch})"))

    # the other BASELINE hot kernel: the contact-dynamics rollout
    from blf_tpu.models.contact import ContactParams
    from blf_tpu.models.foot import FootParams, FootState, foot_rollout
    from blf_tpu.ops.lie import so3_exp

    cparams = ContactParams(
        length=jnp.asarray(0.2, dtype), width=jnp.asarray(0.1, dtype),
        spring_coeff=jnp.asarray(2e5, dtype),
        damper_coeff=jnp.asarray(2e3, dtype))
    fparams = FootParams(
        mass=jnp.asarray(0.75, dtype),
        inertia=jnp.asarray([2e-3, 4e-3, 5e-3], dtype),
        baumgarte_rho=jnp.asarray(10.0, dtype))
    fs = FootState(
        position=jnp.asarray(rng.normal(0, 1e-3, (batch, 3)), dtype),
        rotation=so3_exp(jnp.asarray(rng.normal(0, 0.02, (batch, 3)), dtype)),
        linear_velocity=jnp.asarray(rng.normal(0, 0.05, (batch, 3)), dtype),
        angular_velocity=jnp.asarray(rng.normal(0, 0.05, (batch, 3)), dtype))
    p0 = jnp.zeros((batch, 3), dtype)
    R0 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (batch, 3, 3))
    for be in ("xla", "pallas"):
        rows.append(sol_report(
            jax.jit(lambda s, be=be: foot_rollout(
                cparams, fparams, s, p0, R0, dt=1e-3, steps=200, backend=be)),
            fs, label=f"foot_rollout[{be}] (B={batch})"))

    for r in rows:
        print(_format_row(r))


if __name__ == "__main__":  # pragma: no cover
    main()
