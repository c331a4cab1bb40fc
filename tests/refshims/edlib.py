"""Drop-in ``edlib`` API shim backed by isocon_tpu's native kernels.

Used by scripts/run_reference_parity.py to run the reference IsoCon
pipeline (/root/reference) with OUR alignment kernels, so its decisions
can be diffed against the isocon_tpu pipeline end to end.  Surface =
exactly what the reference calls (edlib_alignment_module.py:111,131,
end_invariant_functions.py:192,573,594, functions.py:772,
nearest_neighbor_graph.py:105):

    edlib.align(x, y, "NW")                       -> {"editDistance"}
    edlib.align(x, y, mode=, task=, k=)           -> + "locations","cigar"

Conventions matched to the reference's consumption (and to real edlib):
query = x, target = y; cigar ops '=', 'X', 'I' (consumes query only),
'D' (consumes target only); HW locations = (start, end_inclusive) span
of the target; editDistance == -1 when k >= 0 and ed > k (cigar None).
"""
from __future__ import annotations

import numpy as np

from isocon_tpu.ops import oracle
from isocon_tpu.ops.encode import encode_seq
from isocon_tpu import native


def _rle(ops: str) -> str:
    if not ops:
        return ""
    out = []
    prev = ops[0]
    n = 1
    for ch in ops[1:]:
        if ch == prev:
            n += 1
        else:
            out.append("%d%s" % (n, prev))
            prev = ch
            n = 1
    out.append("%d%s" % (n, prev))
    return "".join(out)


def _nw_distance(x: str, y: str, k: int) -> int:
    ex = encode_seq(x).view(np.uint8)
    ey = encode_seq(y).view(np.uint8)
    if native.native_available():
        L = max(len(ex), len(ey), 1)
        q = np.zeros((1, L), dtype=np.uint8)
        t = np.zeros((1, L), dtype=np.uint8)
        q[0, : len(ex)] = ex
        t[0, : len(ey)] = ey
        ed = int(native.myers_ed_batch(
            q, np.array([len(ex)], np.int64), t,
            np.array([len(ey)], np.int64), k=k if k is not None else -1)[0])
        return ed
    ed = oracle.edit_distance(x, y)
    if k is not None and k >= 0 and ed > k:
        return -1
    return ed


def align(query, target, mode="NW", task="distance", k=-1):
    """Third positional argument is the mode, like real edlib
    (the reference calls ``edlib.align(x, y, "NW")``)."""
    if k is None:
        k = -1
    k = int(k)
    if mode == "NW":
        if task == "path":
            ed, ops = oracle.nw_unit_alignment(query, target)
            if 0 <= k < ed:
                return {"editDistance": -1, "locations": [], "cigar": None}
            return {
                "editDistance": ed,
                "locations": [(0, len(target) - 1)],
                "cigar": _rle(ops),
            }
        ed = _nw_distance(query, target, k)
        return {"editDistance": ed, "locations": [], "cigar": None}
    if mode == "HW":
        res = native.hw_banded_traceback(query, target)
        if res is None:
            res = oracle.edit_distance_hw(query, target)
        ed, start_j, end_j, ops = res
        if 0 <= k < ed:
            return {"editDistance": -1, "locations": [], "cigar": None}
        return {
            "editDistance": ed,
            "locations": [(start_j, end_j)],
            "cigar": _rle(ops) if task == "path" else None,
        }
    raise NotImplementedError("shim supports NW and HW modes, got %r" % mode)
