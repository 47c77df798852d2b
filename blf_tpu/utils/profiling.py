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
    "measure_chained",
    "cost_analysis",
    "roofline_seconds",
    "sol_report",
    "sol_score",
    "trace",
    "KernelCost",
    "admm_stage_cost",
    "foot_rollout_cost",
]


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    """Roofline ceilings for one accelerator chip.

    ``peak_flops_f32``/``peak_flops_bf16`` in FLOP/s, ``hbm_bytes_per_s`` in
    B/s. Public numbers (cloud.google.com/tpu/docs/system-architecture);
    f32 matmul on the MXU runs at half bf16 rate on all listed generations.
    ``vpu_ops_per_s`` is the elementwise-unit *issue-rate* ceiling used to
    score VPU-heavy kernels: 8×128 lanes × 4 ALUs × ~1 GHz ≈ 4 T op/s on
    v5e (architectural estimate; other generations scaled by peak-FLOP
    ratio). It is an upper bound — long dependent elementwise chains bound
    instead on VMEM round-trip bandwidth (~2.9 TB/s measured, see
    :func:`foot_rollout_cost`), which SOL.md reports alongside.
    """

    name: str
    peak_flops_bf16: float
    peak_flops_f32: float
    hbm_bytes_per_s: float
    vpu_ops_per_s: float = 0.0

    def peak_flops(self, dtype: str = "f32") -> float:
        return self.peak_flops_bf16 if dtype == "bf16" else self.peak_flops_f32


def _vpu_est(peak_bf16: float) -> float:
    # scaled from the v5e measurement below by bf16-peak ratio
    return 4.2e12 * peak_bf16 / 197e12


CHIP_SPECS: Dict[str, ChipSpec] = {
    # keyed by substrings of jax Device.device_kind
    "v4": ChipSpec("TPU v4", 275e12, 137.5e12, 1228e9, _vpu_est(275e12)),
    "v5 lite": ChipSpec("TPU v5e", 197e12, 98.5e12, 819e9, 4.2e12),
    "v5e": ChipSpec("TPU v5e", 197e12, 98.5e12, 819e9, 4.2e12),
    "v5p": ChipSpec("TPU v5p", 459e12, 229.5e12, 2765e9, _vpu_est(459e12)),
    "v5": ChipSpec("TPU v5p", 459e12, 229.5e12, 2765e9, _vpu_est(459e12)),
    "v6 lite": ChipSpec("TPU v6e", 918e12, 459e12, 1640e9, _vpu_est(918e12)),
    "v6e": ChipSpec("TPU v6e", 918e12, 459e12, 1640e9, _vpu_est(918e12)),
    # CPU fallback so SOL accounting degrades gracefully on the test mesh:
    # rough single-socket numbers, only used for relative comparisons.
    "cpu": ChipSpec("host CPU", 1e12, 5e11, 5e10, 2e11),
}


# ---------------------------------------------------------------------------
# Hand-authored kernel cost models.
#
# XLA's ``Compiled.cost_analysis()`` reports 0 FLOPs for anything inside a
# ``pallas_call`` (the custom call is opaque to the HLO cost model), so the
# two kernels BASELINE.md's speed-of-light row actually cares about would
# score 0% SOL through :func:`cost_analysis`. These models count the work by
# hand from the kernel source, at three levels:
#
# - ``useful_flops``: algorithmically necessary FLOPs (what a perfect
#   machine with no tile granularity would execute). "MXU utilization" in
#   SOL.md = useful_flops / time / bf16-peak.
# - ``mxu_flops``: FLOPs the MXU physically executes — operands padded to
#   the (8-sublane × 128-lane) tile granularity, times the number of passes
#   the precision mode performs. mxu_flops/peak is the honest compute-bound
#   roofline for the chosen shapes+mode.
# - ``vpu_ops``: elementwise ops on the 8×128 vector unit; on kernels whose
#   operator dims sit far below 128 the VPU bound is comparable to the MXU
#   bound and must be part of the roofline.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class KernelCost:
    """Hand-counted cost of one kernel invocation (see block comment)."""

    useful_flops: float
    mxu_flops: float
    vpu_ops: float
    bytes: float

    def sol_seconds(self, spec: ChipSpec) -> float:
        """Shape-adjusted speed-of-light: max of the three unit bounds."""
        bounds = [
            self.mxu_flops / spec.peak_flops_bf16 if spec.peak_flops_bf16 else 0.0,
            self.vpu_ops / spec.vpu_ops_per_s if spec.vpu_ops_per_s else 0.0,
            self.bytes / spec.hbm_bytes_per_s if spec.hbm_bytes_per_s else 0.0,
        ]
        return max(bounds)


def _ceil_to(x: int, g: int) -> int:
    return -(-x // g) * g


def admm_stage_cost(B: int, m: int, n: int, iters: int,
                    matmul: str = "delta", dtype_bytes: int = 4) -> KernelCost:
    """Cost of one :func:`blf_tpu.ops.pallas.admm.admm_stage_t` call.

    Counted from the kernel source (transposed layout, operator-on-the-left
    GEMMs): per iteration two products ``(n×m)·(m×B)`` and ``(m×n)·(n×B)``
    — useful 2·2·m·n·B FLOPs — padded on the contraction dim to 128 lanes
    and on the operator rows to 8 sublanes. Passes per product: ``delta`` 2
    (iteration 1: 3), ``split`` 3, ``f32`` 6.
    """
    useful = 2.0 * 2.0 * B * m * n * iters
    pad1 = _ceil_to(n, 8) * _ceil_to(m, 128) * B       # t = Gᵀρ·ŵ, per pass
    pad2 = _ceil_to(m, 8) * _ceil_to(n, 128) * B       # u = G₂·τ, per pass
    passes = {"delta": 2.0, "split": 3.0, "f32": 6.0}[matmul]
    mxu_macs = (pad1 + pad2) * passes * iters
    if matmul == "delta" and iters >= 1:
        mxu_macs += (pad1 + pad2) * 1.0                # 3-pass first iteration
    # per-iteration elementwise work (kernel body): ~10 m-wide ops
    # (clip 2, ŵ 2, Δŵ 1, bf16 cvt 1, u-accumulate 1, v-update 3) and
    # ~7 n-wide (t-accumulate 2, τ 2, Δτ 1, cvt 1, spectral gain 1),
    # + per-stage setup (sdinv, gqs, operator splits) ≈ 8 rows
    vpu = (10.0 * m + 7.0 * n) * B * iters + 8.0 * (m + n) * B
    # HBM: read v,τ,s,gq,l,u + operators, write v,τ (once per stage)
    io = (3 * m + 2 * n + 1) * B + 2 * m * n
    return KernelCost(
        useful_flops=useful,
        mxu_flops=2.0 * mxu_macs,
        vpu_ops=vpu,
        bytes=float(io * dtype_bytes),
    )


def foot_rollout_cost(B: int, steps: int, dtype_bytes: int = 4) -> KernelCost:
    """Cost of one :func:`blf_tpu.ops.pallas.rollout.foot_rollout_fused` call.

    Pure VPU kernel (per-lane 3×3 algebra unrolled componentwise, no MXU):
    op count from the kernel body — wrench ~45, torque ~60, Newton–Euler
    ~60, Baumgarte S⁻¹ adjugate ~70, Ṙ assembly ~90, Euler update ~36 —
    ≈ 360 VPU ops per lane-step (counted to ±10%; the SOL fraction quoted
    for this kernel inherits that uncertainty).

    Measured reality (SOL.md): the kernel sustains ~0.24 T op/s on v5e,
    invariant to block size and chunk interleave — every intermediate of
    the long dependent per-step chain makes a VMEM round trip (~3 accesses
    per op ≈ 2.9 TB/s, the sustainable VMEM bandwidth), so the issue-rate
    roofline in ``vpu_ops_per_s`` is unreachable for this op structure.
    The HBM ``bytes`` below stay the load/store-once fusion win over the
    XLA path (measured 640×).
    """
    vpu = 360.0 * B * steps
    useful = vpu  # every op is algorithmically necessary scalar work
    io = (18 + 12 + 2) * B  # state in/out + null pose + per-lane coeffs
    return KernelCost(
        useful_flops=useful,
        mxu_flops=0.0,
        vpu_ops=vpu,
        bytes=float(io * dtype_bytes),
    )


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


def measure_chained(
    step: Callable[[Any], Any],
    init: Any,
    *,
    ticks: int = 10,
    warmup: int = 1,
    repeats: int = 3,
) -> float:
    """Seconds per application of ``step`` (carry → carry), scan-chained.

    ``ticks`` data-dependent applications run inside ONE jit and the whole
    chain is timed. This is the only honest way to time sub-millisecond
    programs on this machine: per-call host dispatch crosses the axon
    tunnel (~ms), and the relay memoizes executions whose input buffers are
    unchanged — :func:`measure`'s repeat-the-same-call pattern can report
    physically impossible times for cached dispatches. Chaining defeats
    both (each tick's input is the previous tick's output).
    """
    run = jax.jit(lambda c: jax.lax.scan(
        lambda c, _: (step(c), None), c, None, length=ticks)[0])
    out = run(init)
    for _ in range(max(warmup - 1, 0)):
        out = run(out)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(max(repeats, 1)):
        t0 = time.perf_counter()
        out = run(init)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / ticks)
    return best


def sol_score(
    time_s: float,
    *,
    label: str = "program",
    dtype: str = "f32",
    spec: Optional[ChipSpec] = None,
    kernel_cost: Optional[KernelCost] = None,
    flops: float = 0.0,
    nbytes: float = 0.0,
) -> Dict[str, Any]:
    """Score an externally measured time against the chip roofline.

    With ``kernel_cost`` (hand-counted, for pallas programs XLA can't see
    into) the SOL bound is the max of padded-MXU / VPU / HBM unit bounds
    and the report includes ``mxu_util`` — useful FLOPs / time / bf16-peak.
    Otherwise pass XLA's ``flops``/``nbytes`` (see :func:`cost_analysis`).
    """
    spec = spec or detect_chip()
    if kernel_cost is not None:
        mxu_t = (kernel_cost.mxu_flops / spec.peak_flops_bf16
                 if spec.peak_flops_bf16 else 0.0)
        vpu_t = (kernel_cost.vpu_ops / spec.vpu_ops_per_s
                 if spec.vpu_ops_per_s else 0.0)
        mem_t = (kernel_cost.bytes / spec.hbm_bytes_per_s
                 if spec.hbm_bytes_per_s else 0.0)
        sol_t = max(mxu_t, vpu_t, mem_t)
        bound = ("compute" if sol_t == mxu_t else
                 "vpu" if sol_t == vpu_t else "memory")
        return {
            "label": label,
            "chip": spec.name,
            "dtype": dtype,
            "time_s": time_s,
            "flops": kernel_cost.useful_flops,
            "bytes": kernel_cost.bytes,
            "achieved_tflops": kernel_cost.useful_flops / time_s / 1e12,
            "achieved_gbps": kernel_cost.bytes / time_s / 1e9,
            "sol_time_s": sol_t,
            "sol_frac": (sol_t / time_s) if sol_t > 0 else 0.0,
            "mxu_util": (kernel_cost.useful_flops / time_s /
                         spec.peak_flops_bf16 if spec.peak_flops_bf16 else 0.0),
            "bound": bound,
        }
    sol_t = roofline_seconds(flops, nbytes, spec, dtype)
    compute_t = flops / spec.peak_flops(dtype)
    memory_t = nbytes / spec.hbm_bytes_per_s if spec.hbm_bytes_per_s else 0.0
    if flops == 0.0 and nbytes == 0.0:
        bound = "unknown"
    else:
        bound = "compute" if compute_t >= memory_t else "memory"
    return {
        "label": label,
        "chip": spec.name,
        "dtype": dtype,
        "time_s": time_s,
        "flops": flops,
        "bytes": nbytes,
        "achieved_tflops": flops / time_s / 1e12,
        "achieved_gbps": nbytes / time_s / 1e9,
        "sol_time_s": sol_t,
        "sol_frac": (sol_t / time_s) if sol_t > 0 else 0.0,
        "bound": bound,
    }


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
    kernel_cost: Optional[KernelCost] = None,
) -> Dict[str, Any]:
    """Measure ``fn`` and score it against the chip roofline.

    By default the FLOP/byte numerators come from XLA's post-fusion
    ``cost_analysis`` — which reports **0 for pallas kernels** (custom calls
    are opaque to the HLO cost model). Pass ``kernel_cost`` (a hand-counted
    :class:`KernelCost`, e.g. :func:`admm_stage_cost`) to score such
    programs: the SOL bound then becomes the max of the padded-MXU, VPU and
    HBM unit bounds for the kernel's actual shapes, and the report gains
    ``mxu_util`` — useful FLOPs / time / bf16-peak, the headline
    "fraction of the chip's matmul ceiling doing algorithmically necessary
    work" number BASELINE.md's speed-of-light row asks for.

    Returns a flat metrics dict (telemetry-friendly):
    ``time_s``, ``flops``, ``bytes``, ``achieved_tflops``, ``achieved_gbps``,
    ``sol_time_s``, ``sol_frac`` (measured speed-of-light fraction, 1.0 =
    at the roofline), and ``bound`` ("compute" | "vpu" | "memory" |
    "unknown").
    """
    spec = spec or detect_chip()
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    t = measure(jitted, *args, warmup=warmup, repeats=repeats, inner=inner)
    if kernel_cost is not None:
        return sol_score(t, label=label, dtype=dtype, spec=spec,
                         kernel_cost=kernel_cost)
    cost = cost_analysis(jitted, *args)
    return sol_score(t, label=label, dtype=dtype, spec=spec,
                     flops=cost["flops"], nbytes=cost["bytes"])


@contextlib.contextmanager
def trace(name: str):
    """Named profiler region: shows up in xprof/TensorBoard traces.

    Host-side region naming (``jax.profiler.TraceAnnotation``) combined with
    ``jax.named_scope`` so the annotation survives into the HLO too.
    """
    with jax.profiler.TraceAnnotation(name), jax.named_scope(name):
        yield


def _format_row(r: Dict[str, Any]) -> str:
    mxu = (f" MXU {100.0 * r['mxu_util']:>5.1f}%" if "mxu_util" in r else "")
    return (f"{r['label']:<34} {r['time_s'] * 1e3:>9.3f} ms "
            f"{r['achieved_tflops']:>8.2f} TF/s {r['achieved_gbps']:>8.1f} GB/s "
            f"SOL {100.0 * r['sol_frac']:>5.1f}%{mxu} ({r['bound']})")


def main() -> None:  # pragma: no cover - exercised on hardware
    """SOL table for the framework's hot programs on the current backend.

    Every row is timed with :func:`measure_chained` (data-dependent scan
    inside one jit); pallas rows are scored with hand-counted
    :class:`KernelCost` models since XLA reports 0 FLOPs for them.
    Committed output: ``SOL.md`` at the repo root.
    """
    import numpy as np
    import jax.numpy as jnp

    from blf_tpu.mpc.qp import factor_shared_qp, solve_qp_factored
    from blf_tpu.mpc.dcm import build_dcm_qp
    from blf_tpu.models.lipm import LIPMParams
    from blf_tpu.ops.pallas.admm import admm_stage_t

    spec = detect_chip()
    print(f"chip: {spec.name}  peak {spec.peak_flops_bf16 / 1e12:.0f} TF/s "
          f"bf16, {spec.hbm_bytes_per_s / 1e9:.0f} GB/s HBM, "
          f"~{spec.vpu_ops_per_s / 1e12:.1f} T VPU op/s")

    dtype = jnp.float32
    rng = np.random.default_rng(0)
    rows = []
    iters = 50

    for horizon, batch in ((16, 98304), (32, 98304)):
        params = LIPMParams(jnp.asarray(0.9, dtype), jnp.asarray(9.81, dtype))
        zmp_ref = jnp.zeros((horizon, 2), dtype)
        dcm_ref = jnp.zeros((horizon + 1, 2), dtype)
        poly_A = jnp.tile(jnp.asarray(
            [[1.0, 0], [-1.0, 0], [0, 1.0], [0, -1.0]], dtype),
            (horizon, 1, 1))
        poly_b = jnp.broadcast_to(jnp.asarray([0.1, 0.1, 0.06, 0.06], dtype),
                                  (horizon, 4))
        P, qvec, A, l, u = build_dcm_qp(params, 0.1, jnp.zeros(2, dtype),
                                        dcm_ref, zmp_ref, poly_A, poly_b)
        n, m = P.shape[0], A.shape[0]
        is_eq = jnp.arange(m) < 2 * horizon
        factors = jax.jit(factor_shared_qp)(P, A, is_eq)
        q_b = qvec + jnp.asarray(rng.normal(0, 0.01, (batch, n)), dtype)
        l_b = jnp.broadcast_to(l, (batch, m))
        u_b = jnp.broadcast_to(u, (batch, m))

        if horizon == 16:
            ca = cost_analysis(lambda Pm: factor_shared_qp(Pm, A, is_eq), P)
            t = measure_chained(
                lambda Pm: factor_shared_qp(Pm, A, is_eq).P_s * 0 + Pm, P,
                ticks=4)
            rows.append(sol_score(t, label="qp.factor_shared (1x)",
                                  flops=ca["flops"], nbytes=ca["bytes"]))

        # the fused stage kernel — the BASELINE "QP factorization/iteration"
        # hot op — one 50-iteration stage per tick, matmul modes compared
        vT = jnp.asarray(rng.normal(0, 0.01, (m, batch)), dtype)
        tT = jnp.zeros((n, batch), dtype)
        sT = jnp.ones((1, batch), dtype)
        gqT = jnp.asarray(rng.normal(0, 0.01, (n, batch)), dtype)
        lT, uT = jnp.asarray(l_b.T), jnp.asarray(u_b.T)
        for mode in ("delta", "split"):
            step = lambda c, mode=mode: admm_stage_t(
                c[0], c[1], sT, gqT, lT, uT, factors.G2, factors.d,
                factors.base_rho, iters=iters, alpha=1.6, matmul=mode)
            t = measure_chained(step, (vT, tT), ticks=10)
            rows.append(sol_score(
                t, label=f"admm_stage_t[{mode}] h={horizon} B={batch}",
                kernel_cost=admm_stage_cost(batch, m, n, iters, mode)))

        # the full factored solve (stage boundaries + diagnostics included;
        # SOL numerator stays the kernel work, so the gap to the kernel row
        # is the boundary overhead)
        def solve_step(q):
            sol = solve_qp_factored(factors, q, l_b, u_b,
                                    iterations=iters, backend="pallas")
            return q + 1e-30 * sol.x
        t = measure_chained(solve_step, q_b, ticks=10)
        rows.append(sol_score(
            t, label=f"qp.solve_factored[pallas] h={horizon} B={batch}",
            kernel_cost=admm_stage_cost(batch, m, n, iters, "delta")))

    # the other BASELINE hot kernel: the contact-dynamics rollout
    from blf_tpu.models.contact import ContactParams
    from blf_tpu.models.foot import FootParams, FootState, foot_rollout
    from blf_tpu.ops.lie import so3_exp

    batch, steps = 16384, 200
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
        step = lambda s, be=be: foot_rollout(
            cparams, fparams, s, p0, R0, dt=1e-3, steps=steps, backend=be)
        if be == "xla":
            ca = cost_analysis(step, fs)
            t = measure_chained(step, fs, ticks=5)
            rows.append(sol_score(
                t, label=f"foot_rollout[xla] (B={batch})",
                flops=ca["flops"], nbytes=ca["bytes"]))
        else:
            t = measure_chained(step, fs, ticks=5)
            rows.append(sol_score(
                t, label=f"foot_rollout[pallas] (B={batch})",
                kernel_cost=foot_rollout_cost(batch, steps)))

    for r in rows:
        print(_format_row(r))


if __name__ == "__main__":  # pragma: no cover
    main()
