"""Build + ctypes loader for the native (C++) components.

The shared library is compiled on first use with g++ (cached next to the
sources); everything degrades gracefully to the numpy oracle when no
compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "_isocon_native.so")
_SRCS = ["myers_ed.cc", "traceback.cc", "affine_sg.cc"]
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> bool:
    srcs = [os.path.join(_HERE, s) for s in _SRCS if os.path.exists(os.path.join(_HERE, s))]
    if not srcs:
        return False
    newest_src = max(os.path.getmtime(s) for s in srcs)
    if os.path.exists(_SO) and os.path.getmtime(_SO) > newest_src:
        return True
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", "-o", _SO, *srcs,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is None and not _TRIED:
            _TRIED = True
            if _build():
                lib = ctypes.CDLL(_SO)
                lib.myers_ed.restype = ctypes.c_int64
                lib.myers_ed.argtypes = [
                    ctypes.c_void_p, ctypes.c_int64,
                    ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ]
                lib.myers_ed_batch.restype = None
                lib.myers_ed_batch.argtypes = [
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                    ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                    ctypes.c_int64, ctypes.c_void_p,
                ]
                if hasattr(lib, "affine_sg_batch"):
                    lib.affine_sg_batch.restype = None
                    lib.affine_sg_batch.argtypes = [
                        ctypes.c_void_p, ctypes.c_void_p,
                        ctypes.c_void_p, ctypes.c_void_p,
                        ctypes.c_int64, ctypes.c_int64,
                        ctypes.c_void_p, ctypes.c_int64,
                        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                    ]
                    lib.myers_ed_batch_k.restype = None
                    lib.myers_ed_batch_k.argtypes = [
                        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                    ]
                if hasattr(lib, "hw_banded_traceback"):
                    lib.hw_banded_traceback.restype = ctypes.c_int64
                    lib.hw_banded_traceback.argtypes = [
                        ctypes.c_void_p, ctypes.c_int64,
                        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                        ctypes.c_void_p, ctypes.c_void_p,
                        ctypes.c_char_p, ctypes.c_int64,
                    ]
                if hasattr(lib, "hw_traceback_batch"):
                    lib.hw_traceback_batch.restype = None
                    lib.hw_traceback_batch.argtypes = [
                        ctypes.c_void_p, ctypes.c_void_p,
                        ctypes.c_void_p, ctypes.c_void_p,
                        ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
                        ctypes.c_void_p,
                        ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
                        ctypes.c_void_p,
                    ]
                _LIB = lib
        return _LIB


def native_available() -> bool:
    return get_lib() is not None


def myers_ed(q: bytes | np.ndarray, t: bytes | np.ndarray, k: int = -1) -> int:
    """Unit-cost NW edit distance via the native Myers kernel; -1 if > k."""
    lib = get_lib()
    qa = np.frombuffer(q, dtype=np.uint8) if isinstance(q, (bytes, bytearray)) else np.ascontiguousarray(q, dtype=np.uint8)
    ta = np.frombuffer(t, dtype=np.uint8) if isinstance(t, (bytes, bytearray)) else np.ascontiguousarray(t, dtype=np.uint8)
    if lib is None:
        from ..ops import oracle

        return oracle.edit_distance(
            qa.tobytes().decode("latin1"), ta.tobytes().decode("latin1"),
            k=None if k < 0 else k,
        )
    return int(
        lib.myers_ed(
            qa.ctypes.data, len(qa), ta.ctypes.data, len(ta), k
        )
    )


def myers_ed_batch(qs: np.ndarray, qlens: np.ndarray, ts: np.ndarray,
                   tlens: np.ndarray, k: int = -1) -> np.ndarray:
    """Batched native EDs over padded [B, L] uint8 arrays."""
    lib = get_lib()
    B, L = qs.shape
    out = np.empty(B, dtype=np.int64)
    if lib is None:
        for i in range(B):
            out[i] = myers_ed(qs[i, : qlens[i]], ts[i, : tlens[i]], k)
        return out
    qs = np.ascontiguousarray(qs, dtype=np.uint8)
    ts = np.ascontiguousarray(ts, dtype=np.uint8)
    ql = np.ascontiguousarray(qlens, dtype=np.int64)
    tl = np.ascontiguousarray(tlens, dtype=np.int64)
    lib.myers_ed_batch(
        qs.ctypes.data, ql.ctypes.data, ts.ctypes.data, tl.ctypes.data,
        L, B, k, out.ctypes.data,
    )
    return out

def _nthreads() -> int:
    n = os.cpu_count() or 1
    return max(1, min(n, 16))


def myers_ed_batch_k(qs: np.ndarray, qlens: np.ndarray, ts: np.ndarray,
                     tlens: np.ndarray, ks: np.ndarray) -> np.ndarray:
    """Batched native NW EDs with a per-pair cutoff (k < 0 => none),
    threaded over the host cores.  Returns int64 EDs, -1 where > k."""
    lib = get_lib()
    B, L = qs.shape
    out = np.empty(B, dtype=np.int64)
    if lib is None or not hasattr(lib, "myers_ed_batch_k"):
        for i in range(B):
            out[i] = myers_ed(qs[i, : qlens[i]], ts[i, : tlens[i]],
                              int(ks[i]))
        return out
    qs = np.ascontiguousarray(qs, dtype=np.uint8)
    ts = np.ascontiguousarray(ts, dtype=np.uint8)
    ql = np.ascontiguousarray(qlens, dtype=np.int64)
    tl = np.ascontiguousarray(tlens, dtype=np.int64)
    ka = np.ascontiguousarray(ks, dtype=np.int64)
    lib.myers_ed_batch_k(
        qs.ctypes.data, ql.ctypes.data, ts.ctypes.data, tl.ctypes.data,
        L, B, ka.ctypes.data, _nthreads(), out.ctypes.data,
    )
    return out


def affine_sg_batch(s1s: np.ndarray, s1lens: np.ndarray, s2s: np.ndarray,
                    s2lens: np.ndarray, scores: np.ndarray, nthreads=None):
    """Batched full-DP affine SG alignments with traceback.

    s1s/s2s: [B, L] uint8 padded; scores: [B, 4] int64 (ma, mi, go, ge with
    mi negative, go/ge positive penalties).  Returns the engine handle
    tuple (best, ei, ej, ops, fi, fj, overflow) with backward opcodes in
    the same encoding as ``affine.walk_traceback`` (overflow always False:
    the DP is unbanded).  Returns None when the native lib is unavailable.
    nthreads pins the worker count (bench.py's single-core baseline);
    default is one thread per host core.
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "affine_sg_batch"):
        return None
    B, L = s1s.shape
    ops_stride = 2 * L + 2
    s1s = np.ascontiguousarray(s1s, dtype=np.uint8)
    s2s = np.ascontiguousarray(s2s, dtype=np.uint8)
    l1 = np.ascontiguousarray(s1lens, dtype=np.int64)
    l2 = np.ascontiguousarray(s2lens, dtype=np.int64)
    sc = np.ascontiguousarray(scores, dtype=np.int64)
    ops = np.zeros((B, ops_stride), dtype=np.uint8)
    meta = np.zeros((B, 6), dtype=np.int64)
    lib.affine_sg_batch(
        s1s.ctypes.data, l1.ctypes.data, s2s.ctypes.data, l2.ctypes.data,
        L, B, sc.ctypes.data,
        _nthreads() if nthreads is None else int(nthreads),
        ops.ctypes.data, ops_stride,
        meta.ctypes.data,
    )
    return (
        meta[:, 0].astype(np.int32), meta[:, 1].astype(np.int32),
        meta[:, 2].astype(np.int32), ops,
        meta[:, 3].astype(np.int32), meta[:, 4].astype(np.int32),
        np.zeros(B, dtype=bool),
    )


def hw_traceback_batch(pairs, band: int = 128, ed_hint=None, k_cap=None):
    """Batched threaded HW tracebacks with internal band escalation: the
    vectorized replacement for per-pair ``hw_banded_traceback`` loops
    (the ends-ignored graph's confirm pass).  ``pairs`` is a sequence of
    (q, t) strings; returns a list of (ed, start_j, end_j_incl, ops).

    ``ed_hint[i]`` (>= 0, typically the batched prefilter's distance)
    starts pair i at band = max(16, 2*hint), which certifies immediately
    and shrinks the DP ~5x vs the 128 default; a wrong (too-small) hint
    merely escalates internally, never changes the result.

    ``k_cap[i]`` (>= 0) makes the result give up once ed > cap is proven
    (entry becomes (-1, 0, 0, '') -- the engine's edlib-k contract); use
    -1 (or omit k_cap) for "no cutoff".  The C++ early-escalation guard
    only engages for cap > 0; a cap of 0 still honors the contract via
    the post-filter below (the full DP runs, then ed > 0 maps to -1)."""
    lib = get_lib()
    B = len(pairs)
    if B == 0:
        return []
    bands = np.full(B, band, dtype=np.int64)
    if ed_hint is not None:
        h = np.asarray(ed_hint, dtype=np.int64)
        known = h >= 0
        bands[known] = np.maximum(16, 2 * h[known])
    caps = None
    if k_cap is not None:
        caps = np.asarray(k_cap, dtype=np.int64)
    if lib is None or not hasattr(lib, "hw_traceback_batch"):
        from ..ops import oracle

        out = []
        for i, ((q, t), b) in enumerate(zip(pairs, bands)):
            r = (hw_banded_traceback(q, t, band=int(b))
                 or oracle.edit_distance_hw(q, t))
            if caps is not None and caps[i] >= 0 and r[0] > caps[i]:
                r = (-1, 0, 0, "")
            out.append(r)
        return out
    L = max(max(len(q), len(t)) for q, t in pairs)
    L = max(L, 1)
    # np.empty: the C++ side reads only qlens/tlens prefixes per row
    qs = np.empty((B, L), dtype=np.uint8)
    ts = np.empty((B, L), dtype=np.uint8)
    ql = np.zeros(B, dtype=np.int64)
    tl = np.zeros(B, dtype=np.int64)
    for i, (q, t) in enumerate(pairs):
        qb, tb = q.encode("latin1"), t.encode("latin1")
        qs[i, : len(qb)] = np.frombuffer(qb, dtype=np.uint8)
        ts[i, : len(tb)] = np.frombuffer(tb, dtype=np.uint8)
        ql[i], tl[i] = len(qb), len(tb)
    ops_stride = 2 * L + 16
    ops = np.zeros((B, ops_stride), dtype=np.uint8)
    meta = np.zeros((B, 3), dtype=np.int64)
    lib.hw_traceback_batch(
        qs.ctypes.data, ql.ctypes.data, ts.ctypes.data, tl.ctypes.data,
        L, B, bands.ctypes.data,
        caps.ctypes.data if caps is not None else None,
        _nthreads(), ops.ctypes.data, ops_stride,
        meta.ctypes.data,
    )
    out = []
    for i, (q, t) in enumerate(pairs):
        if meta[i, 0] == -2:  # defensive: ops overflow -> oracle
            from ..ops import oracle

            r = oracle.edit_distance_hw(q, t)
            if caps is not None and caps[i] >= 0 and r[0] > caps[i]:
                r = (-1, 0, 0, "")
            out.append(r)
            continue
        if meta[i, 0] == -1:  # gave up past k_cap
            out.append((-1, 0, 0, ""))
            continue
        ed = int(meta[i, 0])
        if caps is not None and caps[i] >= 0 and ed > caps[i]:
            out.append((-1, 0, 0, ""))
            continue
        row = ops[i]
        nul = int(np.argmin(row)) if row[-1] == 0 else ops_stride
        out.append((ed, int(meta[i, 1]), int(meta[i, 2]),
                    row[:nul].tobytes().decode("latin1")))
    return out


def hw_banded_traceback(q: str, t: str, band: int = 128):
    """Banded infix (HW) unit-cost alignment with traceback; same contract
    as ``oracle.edit_distance_hw_banded``: (ed, start_j, end_j_incl, ops)
    or None when the band cannot certify the result.  Falls back to the
    numpy oracle when the native library is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "hw_banded_traceback") or (
        len(q) == 0 or len(t) == 0
    ):
        from ..ops import oracle

        return oracle.edit_distance_hw_banded(q, t, band=band)
    qa = q.encode("latin1")
    ta = t.encode("latin1")
    start_j = ctypes.c_int64()
    end_j = ctypes.c_int64()
    cap = 2 * (len(q) + len(t)) + 16
    buf = ctypes.create_string_buffer(cap)
    ed = lib.hw_banded_traceback(
        qa, len(qa), ta, len(ta), band,
        ctypes.byref(start_j), ctypes.byref(end_j), buf, cap,
    )
    if ed == -1:
        return None
    if ed == -2:  # ops buffer too small; should not happen with 2(n+m)
        from ..ops import oracle

        return oracle.edit_distance_hw_banded(q, t, band=band)
    return int(ed), int(start_j.value), int(end_j.value), buf.value.decode("latin1")
