"""Native host runtime: C++ batch schedule lowering + hulls via ctypes.

Compiled lazily with the system ``g++`` (``-O3 -shared -fPIC``) into a cached
shared library; falls back to numpy reference implementations when no
compiler is available, so the package never hard-depends on a toolchain.
See ``schedule.cpp`` for what/why (the framework's C++ "data loader").
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "available",
    "lower_schedules_batch",
    "monotone_chain",
    "support_polygons_batch",
]

_SRC = os.path.join(os.path.dirname(__file__), "schedule.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[ctypes.CDLL]:
    """Compile (once, content-hashed cache) and load the library."""
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "BLF_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "blf_tpu_native"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, f"libblf_native_{digest}.so")
    if not os.path.exists(lib_path):
        tmp = lib_path + f".build{os.getpid()}"
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
               "-o", tmp, _SRC]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            return None
        os.replace(tmp, lib_path)
    try:
        return ctypes.CDLL(lib_path)
    except OSError:
        return None


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        _LIB = _build()
        if _LIB is not None:
            _LIB.blf_monotone_chain.restype = ctypes.c_int32
    return _LIB


def available() -> bool:
    """True iff the native library compiled and loaded."""
    return _lib() is not None


def _c(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.c_void_p)


# ---------------------------------------------------------------------------
# Batch schedule lowering
# ---------------------------------------------------------------------------

def lower_schedules_batch(
    activation: np.ndarray,     # (B, E, C) padded; sort by activation
    deactivation: np.ndarray,   # (B, E, C)
    counts: np.ndarray,         # (B, E) int32 — real windows per list
    positions: np.ndarray,      # (B, E, C, 3)
    horizon: int,
    dt: float,
    t0: float = 0.0,
    *,
    force_python: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Dense lowering of B×E contact lists — the batched equivalent of
    :func:`blf_tpu.planners.contacts.lower_contact_schedule` (positions only;
    rotations stay identity in the batch path).

    Returns (active (B,E,T) bool, index (B,E,T) int32, pos (B,E,T,3)).
    """
    B, E, C = activation.shape
    T = int(horizon)
    activation = np.ascontiguousarray(activation, dtype=np.float64)
    deactivation = np.ascontiguousarray(deactivation, dtype=np.float64)
    counts = np.ascontiguousarray(counts, dtype=np.int32)
    positions = np.ascontiguousarray(positions, dtype=np.float64)

    lib = None if force_python else _lib()
    if lib is not None:
        active = np.empty((B, E, T), dtype=np.uint8)
        index = np.empty((B, E, T), dtype=np.int32)
        pos = np.empty((B, E, T, 3), dtype=np.float64)
        lib.blf_lower_schedule(
            _c(activation), _c(deactivation), _c(counts), _c(positions),
            ctypes.c_int32(B), ctypes.c_int32(E), ctypes.c_int32(C),
            ctypes.c_int32(T), ctypes.c_double(dt), ctypes.c_double(t0),
            _c(active), _c(index), _c(pos),
        )
        return active.astype(bool), index, pos

    # numpy reference (identical semantics)
    times = t0 + dt * np.arange(T)
    active = np.zeros((B, E, T), dtype=bool)
    index = np.full((B, E, T), -1, dtype=np.int32)
    pos = np.zeros((B, E, T, 3), dtype=np.float64)
    for b in range(B):
        for e in range(E):
            n = counts[b, e]
            if n == 0:
                continue
            acts, deacts = activation[b, e, :n], deactivation[b, e, :n]
            idx = np.searchsorted(acts, times, side="right") - 1
            index[b, e] = idx
            present = idx >= 0
            active[b, e] = present & (times < deacts[np.clip(idx, 0, None)])
            pos[b, e] = positions[b, e, np.where(present, idx, 0)]
    return active, index, pos


def monotone_chain(points: np.ndarray, *, force_python: bool = False) -> np.ndarray:
    """2-D convex hull (CCW, collinear dropped) of (n, 2) points."""
    pts = np.ascontiguousarray(points, dtype=np.float64)
    n = len(pts)
    lib = None if force_python else _lib()
    if lib is not None and n:
        out = np.empty((2 * n + 2, 2), dtype=np.float64)
        k = lib.blf_monotone_chain(_c(pts), ctypes.c_int32(n), _c(out))
        return out[:k].copy()
    from scipy.spatial import ConvexHull

    if n < 3:
        return np.unique(pts, axis=0)
    hull = ConvexHull(pts)
    return pts[hull.vertices]


def support_polygons_batch(
    active: np.ndarray,      # (B, E, T) bool
    foot_xy: np.ndarray,     # (B, E, T, 2)
    half_length: float,
    half_width: float,
    max_halfspaces: int = 8,
    *,
    force_python: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-(scenario, knot) ZMP support polygons as padded half-spaces
    (batched host counterpart of :func:`blf_tpu.planners.gait.support_polygons`).

    Returns (A (B,T,F,2), b (B,T,F)); padding rows are ``0·x ≤ 1``.
    """
    B, E, T = active.shape
    F = int(max_halfspaces)
    corners = np.array(
        [[half_length, half_width], [half_length, -half_width],
         [-half_length, half_width], [-half_length, -half_width]],
        dtype=np.float64,
    )
    active8 = np.ascontiguousarray(active, dtype=np.uint8)
    foot_xy = np.ascontiguousarray(foot_xy, dtype=np.float64)

    lib = None if force_python else _lib()
    if lib is not None:
        A = np.empty((B, T, F, 2), dtype=np.float64)
        b = np.empty((B, T, F), dtype=np.float64)
        lib.blf_support_polygons(
            _c(active8), _c(foot_xy), _c(corners),
            ctypes.c_int32(B), ctypes.c_int32(E), ctypes.c_int32(T),
            ctypes.c_int32(F), _c(A), _c(b),
        )
        return A, b

    A = np.zeros((B, T, F, 2))
    b = np.ones((B, T, F))
    for bb in range(B):
        for t in range(T):
            pts = [
                foot_xy[bb, e, t] + corners
                for e in range(E) if active[bb, e, t]
            ]
            if not pts:
                if t > 0:
                    A[bb, t], b[bb, t] = A[bb, t - 1], b[bb, t - 1]
                continue
            hull = monotone_chain(np.concatenate(pts), force_python=False)
            k = min(len(hull), F)
            for i in range(k):
                v, w = hull[i], hull[(i + 1) % len(hull)]
                e_vec = w - v
                nrm = np.hypot(*e_vec)
                if nrm < 1e-300:
                    continue
                n_hat = np.array([e_vec[1], -e_vec[0]]) / nrm
                A[bb, t, i] = n_hat
                b[bb, t, i] = n_hat @ v
    return A, b
