"""Drop-in ``parasail`` API shim backed by isocon_tpu's native affine
semi-global aligner (native/affine_sg.cc + ops/affine.ops_to_alignment).

Surface = exactly what the reference calls (SW_alignment_module.py:65-69):

    parasail.matrix_create("ACGT", match, mismatch)
    parasail.sg_trace_scan_16(s1, s2, open, ext, matrix)
        -> result.saturated, result.cigar.decode (bytes, ops = X I D)
    parasail.sg_trace_scan_32(...)  (same; we never saturate)

The cigar is derived from the aligned strings, so the reference's
cigar_to_seq (SW_alignment_module.py:15-53) reconstructs exactly the
alignment our engine would hand the isocon_tpu pipeline ('I' consumes
query s1, 'D' consumes reference s2).
"""
from __future__ import annotations

import numpy as np

from isocon_tpu.ops import oracle
from isocon_tpu.ops.affine import ops_to_alignment
from isocon_tpu.ops.encode import encode_seq
from isocon_tpu import native


class _Matrix:
    def __init__(self, match: int, mismatch: int):
        self.match = int(match)
        self.mismatch = int(mismatch)


def matrix_create(alphabet: str, match: int, mismatch: int) -> _Matrix:
    return _Matrix(match, mismatch)


class _Cigar:
    def __init__(self, cigar_str: str):
        self.decode = cigar_str.encode("ascii")


class _Result:
    saturated = False

    def __init__(self, a1: str, a2: str, score: int):
        self.score = score
        ops = []
        for x, y in zip(a1, a2):
            if y == "-":
                ops.append("I")
            elif x == "-":
                ops.append("D")
            elif x == y:
                ops.append("=")
            else:
                ops.append("X")
        out = []
        prev = None
        n = 0
        for ch in ops:
            if ch == prev:
                n += 1
            else:
                if prev is not None:
                    out.append("%d%s" % (n, prev))
                prev = ch
                n = 1
        if prev is not None:
            out.append("%d%s" % (n, prev))
        self.cigar = _Cigar("".join(out))


def _sg_align(s1: str, s2: str, open_pen: int, ext_pen: int, matrix: _Matrix):
    ma, mi = matrix.match, -abs(matrix.mismatch)
    if native.native_available():
        e1 = encode_seq(s1).view(np.uint8)
        e2 = encode_seq(s2).view(np.uint8)
        L = max(len(e1), len(e2), 1)
        q = np.full((1, L), 5, dtype=np.uint8)
        t = np.full((1, L), 6, dtype=np.uint8)
        q[0, : len(e1)] = e1
        t[0, : len(e2)] = e2
        sc = np.array([[ma, mi, open_pen, ext_pen]], dtype=np.int64)
        outs = native.affine_sg_batch(
            q, np.array([len(e1)], np.int64), t,
            np.array([len(e2)], np.int64), sc)
        if outs is not None:
            best, ei, ej, ops, fi, fj, overflow = outs
            a1, a2 = ops_to_alignment(
                np.asarray(ops)[0], s1, s2, int(np.asarray(ei)[0]),
                int(np.asarray(ej)[0]), int(np.asarray(fi)[0]),
                int(np.asarray(fj)[0]))
            return a1, a2, int(np.asarray(best)[0])
    a1, a2, _stats = oracle.align_semi_global(
        s1, s2, ma, mi, open_pen, ext_pen)
    return a1, a2, 0


def sg_trace_scan_16(s1, s2, open_pen, ext_pen, matrix):
    a1, a2, score = _sg_align(s1, s2, open_pen, ext_pen, matrix)
    return _Result(a1, a2, score)


sg_trace_scan_32 = sg_trace_scan_16
