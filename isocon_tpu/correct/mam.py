"""Multi-alignment matrix (MAM) construction.

Faithful re-implementation of the reference's star multi-alignment
(``functions.py:543-797``): every partition member's pairwise alignment to
the center m is positioned on a 2*len(m)+1 slot vector (odd slots = bases of
m, even slots = insertion strings between them), then every even column is
expanded to the length of its longest insertion, with shorter insertions
placed by (a) substring match, (b) deletion-free unit-cost alignment,
(c) best left-shift with at least one match, (d) plain left-justification
(``get_best_solution``, ``functions.py:635-676``).
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from ..ops import oracle


def position_query_to_alignment(
    query_aligned: str, target_aligned: str, target_start: int
) -> Tuple[List[str], int, int]:
    """Place one pairwise alignment onto the target position vector.

    Matches ``functions.py:598-631`` including its start/end conventions:
    returns (slots, 2*target_start, 2*(last_target_pos)+2).
    """
    slots: List[str] = []
    target_pos = target_start
    pending_ins = ""
    for qc, tc in zip(query_aligned, target_aligned):
        if tc == "-":
            pending_ins += qc
        else:
            slots.append(pending_ins if pending_ins else "-")
            pending_ins = ""
            slots.append(qc)
            target_pos += 1
    slots.append(pending_ins if pending_ins else "-")
    return slots, 2 * target_start, 2 * (target_pos - 1) + 2


def _best_solution(max_insertion: str, q_ins: str) -> List[str]:
    """Place q_ins within max_insertion; see ``functions.py:635-676``.

    The deletion-free alignment step pins a deterministic rule where the
    reference consults edlib's arbitrary optimal path: we emit the
    deletion-free placement iff a deletion-free optimal alignment exists
    (reference ``min_ed``, ``functions.py:771-797``).
    """
    if q_ins == "-":
        return ["-"] * len(max_insertion)
    pos = max_insertion.find(q_ins)
    if pos >= 0:
        padded = (
            "-" * pos
            + q_ins
            + "-" * (len(max_insertion) - pos - len(q_ins))
        )
        return list(padded)
    threaded = _min_ed_threading(max_insertion, q_ins)
    if threaded:
        return list(threaded)
    # best left-shift with maximal matches
    best_p, best_matches = 0, 0
    for p in range(0, len(max_insertion) - len(q_ins) + 1):
        nr = sum(
            1 for c1, c2 in zip(q_ins, max_insertion[p : p + len(q_ins)]) if c1 == c2
        )
        if nr > best_matches:
            best_p, best_matches = p, nr
    if best_p > 0:
        padded = (
            "-" * best_p
            + q_ins
            + "-" * (len(max_insertion) - best_p - len(q_ins))
        )
        return list(padded)
    # left-justify
    return [
        q_ins[p] if p < len(q_ins) else "-" for p in range(len(max_insertion))
    ]


def _min_ed_threading(max_insertion: str, q_ins: str) -> str:
    """Thread q_ins into max_insertion if a deletion-free optimal unit-cost
    alignment exists (mirrors ``min_ed``, ``functions.py:771-797``)."""
    ed, ops = oracle.nw_unit_alignment(max_insertion, q_ins)
    if "D" not in ops:
        out = []
        qpos = 0
        for op in ops:
            if op == "I":
                out.append("-")
            else:
                out.append(q_ins[qpos])
                qpos += 1
        return "".join(out)
    # the preferred path used deletions; check if a deletion-free optimal
    # alignment exists: D-free cost = (len difference) + min mismatches
    la, lb = len(max_insertion), len(q_ins)
    if lb > la:
        return ""
    # max matches of q_ins as ordered subsequence alignment into max_insertion
    best = _max_subsequence_matches(max_insertion, q_ins)
    dfree_cost = (la - lb) + (lb - best)
    if dfree_cost != ed:
        return ""
    # reconstruct a D-free optimal placement (greedy DP traceback)
    return _dfree_alignment(max_insertion, q_ins)


def _max_subsequence_matches(a: str, b: str) -> int:
    # dp[j] = max matches aligning b[:j] into a-prefix; O(|a||b|), tiny inputs
    la, lb = len(a), len(b)
    NEGI = -(10**9)
    dp = [0] + [NEGI] * lb
    for i in range(1, la + 1):
        for j in range(min(i, lb), 0, -1):
            cand = dp[j - 1] + (1 if a[i - 1] == b[j - 1] else 0)
            if cand > dp[j]:
                dp[j] = cand
    return max(dp[lb], 0) if dp[lb] > NEGI // 2 else 0


def _dfree_alignment(a: str, b: str) -> str:
    """One deletion-free alignment of b into a maximizing matches."""
    la, lb = len(a), len(b)
    NEGI = -(10**9)
    dp = [[NEGI] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        dp[i][0] = 0  # any prefix of a may align to gaps
    for i in range(1, la + 1):
        for j in range(1, min(i, lb) + 1):
            stay = dp[i - 1][j]  # a[i-1] aligned to gap
            diag = dp[i - 1][j - 1] + (1 if a[i - 1] == b[j - 1] else 0)
            dp[i][j] = max(stay, diag)
    out = []
    i, j = la, lb
    while i > 0:
        if j > 0 and dp[i][j] == dp[i - 1][j - 1] + (
            1 if a[i - 1] == b[j - 1] else 0
        ):
            out.append(b[j - 1])
            i -= 1
            j -= 1
        else:
            out.append("-")
            i -= 1
    out.reverse()
    return "".join(out)


def create_multialignment_format(
    positioned: Dict[str, Tuple[List[str], int, int]], start: int, stop: int
) -> Dict[str, List[str]]:
    """Expand positioned rows covering [start, stop] into aligned columns
    (``create_multialignment_format_NEW``, ``functions.py:679-767``)."""
    assert positioned
    segments: Dict[str, List[str]] = {}
    for acc, (slots, vstart, vend) in positioned.items():
        if vstart <= start and vend >= stop:
            segments[acc] = slots[start - vstart : stop - vstart + 1]
    if not segments:
        return {}
    nr_pos = stop - start + 1
    rows = list(segments.values())
    unique_per_col = [set(col) for col in zip(*rows)]

    max_insertions: List[str] = []
    for p in range(nr_pos):
        max_len = max(len(x) for x in unique_per_col[p])
        if max_len > 1:
            max_ins = sorted(
                x for x in unique_per_col[p] if len(x) == max_len
            )[0]
            assert (start + p) % 2 == 0
            max_insertions.append("-" + max_ins + "-")
        else:
            max_insertions.append("-")

    solutions: Dict[str, Dict[str, List[str]]] = {}
    for nucl in ["A", "G", "C", "T", "-"]:
        solutions[nucl] = {
            "A": ["A"], "G": ["G"], "C": ["C"], "T": ["T"], "-": ["-"]
        }
    for p in range(nr_pos):
        mx = max_insertions[p]
        if len(mx) > 1:
            sols = solutions.setdefault(mx, {})
            for ins in unique_per_col[p]:
                if ins not in sols:
                    sols[ins] = _best_solution(mx, ins)

    out: Dict[str, List[str]] = {}
    for acc, seg in segments.items():
        expanded: List[str] = []
        for p in range(nr_pos):
            sol = solutions[max_insertions[p]].get(seg[p])
            if sol is None:
                sol = solutions[max_insertions[p]][seg[p]]
            expanded.extend(sol)
        out[acc] = expanded
    return out


def create_multialignment_matrix(
    m: str, partition: Dict[str, Tuple[int, str, str, int]]
) -> Dict[str, List[str]]:
    """Star MAM for partition {seq: (ed, m_aln, s_aln, degree)} against
    center m (``create_multialignment_matrix``, ``functions.py:543-588``)."""
    positioned = {}
    for acc, (ed, m_aln, s_aln, deg) in partition.items():
        slots, vstart, vend = position_query_to_alignment(s_aln, m_aln, 0)
        assert vstart == 0
        assert vend + 1 == 2 * len(m) + 1
        positioned[acc] = (slots, vstart, vend)
    return create_multialignment_format(positioned, 0, 2 * len(m))


def create_position_frequency_matrix(
    alignment_matrix: Dict[str, List[str]],
    partition: Dict[str, Tuple[int, str, str, int]],
) -> List[Dict[str, int]]:
    """Degree-weighted per-column {A,C,G,T,-} counts
    (``functions.py:526-536``)."""
    any_row = next(iter(alignment_matrix.values()))
    pfm = [dict.fromkeys("ACGT-", 0) for _ in range(len(any_row))]
    for acc, row in alignment_matrix.items():
        deg = partition[acc][3]
        for j, nucl in enumerate(row):
            pfm[j][nucl] += deg
    return pfm
