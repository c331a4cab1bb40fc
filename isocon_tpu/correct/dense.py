"""Dense (numpy) multi-alignment matrix + consensus correction.

The production path for ``correct_to_consensus``: the same star-MAM
construction, PFM and ceil(0.5 * minority) type-normalized correction as
``mam.py`` / ``consensus.py`` (the per-string reference implementation,
kept as the oracle -- see tests/test_mam.py property tests), built as flat
uint8 code matrices with vectorized column math instead of per-character
Python loops (SURVEY.md sec 7 step 5; reference
``correction_module.py:260-446``, ``functions.py:526-767``).

Layout: the MAM of a partition of K rows against center m of length L is
a [K, W] uint8 byte matrix.  Columns interleave the 2L+1 reference slots
(even = insertion slots, odd = bases of m); insertion slots expand to the
width of their longest unique insertion (+2 flanking dashes) exactly as
``create_multialignment_format`` does, with the same ``_best_solution``
placement rules for the (few) non-trivial insertion strings.

Exactness: integer PFM counts are identical; correction ratios use the
same float64 divisions; sorting is stable with columns ascending, so the
tie-extension cut matches the reference decision-for-decision.
"""
from __future__ import annotations

import math
from typing import Dict, List, Tuple

import numpy as np

from .mam import _best_solution

_DASH = np.uint8(ord("-"))
# PFM channel order "ACGT-" (matches mam.create_position_frequency_matrix)
_CODE = np.full(256, 4, dtype=np.int8)
for _i, _c in enumerate("ACGT"):
    _CODE[ord(_c)] = _i
_CHAN = np.frombuffer(b"ACGT-", dtype=np.uint8)


def _row_bytes(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("latin1"), dtype=np.uint8)


def build_dense_mam(
    m: str, partition: Dict[str, Tuple[int, str, str, int]]
) -> Tuple[List[str], np.ndarray, np.ndarray]:
    """Dense star MAM.

    Returns (row order = sorted members, matrix [K, W] uint8,
    degrees [K] int64).  Row strings reproduce ``mam.
    create_multialignment_matrix`` exactly (property-tested).
    """
    L = len(m)
    accs = sorted(partition)
    K = len(accs)
    odd = np.full((K, L), _DASH, dtype=np.uint8)
    # insertions per even slot: slot -> {ins_string: [row indices]}
    slot_ins: Dict[int, Dict[str, List[int]]] = {}

    for k, acc in enumerate(accs):
        _ed, m_aln, s_aln, _deg = partition[acc]
        ma = _row_bytes(m_aln)
        sa = _row_bytes(s_aln)
        tmask = ma != _DASH
        tcols = np.flatnonzero(tmask)
        assert len(tcols) == L, (len(tcols), L)
        odd[k] = sa[tcols]
        gaps = np.flatnonzero(~tmask)
        if gaps.size:
            # insertion at alignment column g belongs to the even slot
            # equal to the number of target chars before g
            nd = np.cumsum(tmask)
            slots = nd[gaps]
            # group consecutive gap columns with equal slot into strings
            brk = np.flatnonzero(
                (np.diff(gaps) != 1) | (np.diff(slots) != 0)
            )
            starts = np.concatenate(([0], brk + 1))
            ends = np.concatenate((brk + 1, [gaps.size]))
            for a, b in zip(starts, ends):
                ins = s_aln[gaps[a] : gaps[a] + (b - a)]
                slot = int(slots[a])
                slot_ins.setdefault(slot, {}).setdefault(ins, []).append(k)

    # per even slot: width and (for expanded slots) placed solutions
    widths = np.ones(2 * L + 1, dtype=np.int64)
    expanded: Dict[int, np.ndarray] = {}
    for slot, by_ins in slot_ins.items():
        max_len = max(len(x) for x in by_ins)
        if max_len == 1:
            continue  # width-1 slot; cells are the raw single chars
        max_ins = sorted(x for x in by_ins if len(x) == max_len)[0]
        mx = "-" + max_ins + "-"
        w = len(mx)
        widths[2 * slot] = w
        block = np.full((K, w), _DASH, dtype=np.uint8)
        for ins, rows in by_ins.items():
            sol = _row_bytes("".join(_best_solution(mx, ins)))
            block[rows] = sol
        expanded[slot] = block

    offsets = np.concatenate(([0], np.cumsum(widths)))
    W = int(offsets[-1])
    out = np.full((K, W), _DASH, dtype=np.uint8)
    out[:, offsets[1 : 2 * L : 2]] = odd     # odd slots, width 1
    for slot, by_ins in slot_ins.items():
        off = int(offsets[2 * slot])
        if slot in expanded:
            out[:, off : off + expanded[slot].shape[1]] = expanded[slot]
        else:
            for ins, rows in by_ins.items():
                out[rows, off] = ord(ins)
    degs = np.array([partition[a][3] for a in accs], dtype=np.int64)
    return accs, out, degs


def dense_pfm(mat: np.ndarray, degs: np.ndarray) -> np.ndarray:
    """Degree-weighted [W, 5] counts in channel order A,C,G,T,'-'."""
    K, W = mat.shape
    idx = _CODE[mat].astype(np.int64)       # [K, W] in 0..4
    flat = idx + np.arange(W, dtype=np.int64) * 5
    counts = np.bincount(
        flat.ravel(), weights=np.repeat(degs.astype(np.float64), W),
        minlength=W * 5,
    )
    return counts.reshape(W, 5).astype(np.int64)


def correct_to_consensus_dense(
    m: str,
    partition: Dict[str, Tuple[int, str, str, int]],
    seq_to_acc: Dict[str, List[str]],
) -> Dict[str, str]:
    """Vectorized ``correct_to_consensus`` (``correction_module.py:260-
    446``); dispatched by ``consensus.correct_to_consensus``."""
    s_prime: Dict[str, str] = {}
    accs, mat, degs = build_dense_mam(m, partition)
    # round-trip invariant (correction_module.py:273-275)
    for k, s_before in enumerate(accs):
        row = mat[k]
        assert row[row != _DASH].tobytes().decode("latin1") == s_before

    counts = dense_pfm(mat, degs)           # [W, 5]
    W = counts.shape[0]
    maxc = counts.max(axis=1)
    n_max = (counts == maxc[:, None]).sum(axis=1)
    unamb = n_max == 1
    # among "ACGT-": argmax picks the first (lexicographically smallest is
    # only needed for ambiguous columns, which are excluded everywhere)
    maj = counts.argmax(axis=1)
    tot = counts.sum(axis=1)
    maj_dash = maj == 4
    other = tot - maxc
    c_ins = int(other[unamb & maj_dash].sum())
    dash_cnt = counts[:, 4]
    sel = unamb & ~maj_dash
    c_del = int(dash_cnt[sel].sum())
    c_subs = int((other[sel] - dash_cnt[sel]).sum())

    idx = _CODE[mat].astype(np.int64)       # [K, W]
    cols = np.arange(W, dtype=np.int64)
    norm_ins = float(max(c_ins, 1))
    norm_del = float(max(c_del, 1))
    norm_subs = float(max(c_subs, 1))

    for k, s in enumerate(accs):
        if partition[s][3] > 1:
            continue  # converged member: never corrected (:316-317)
        row_idx = idx[k]
        mism = unamb & (row_idx != maj)
        nr_pos = int(math.ceil(int(mism.sum()) * 0.5))
        if nr_pos == 0:
            continue
        jj = cols[mism]
        vcnt = counts[jj, row_idx[jj]].astype(np.float64)
        mdash = maj_dash[jj]
        vdash = row_idx[jj] == 4
        norm = np.where(mdash, norm_ins, np.where(vdash, norm_del,
                                                  norm_subs))
        freqs = vcnt / norm
        order = np.argsort(freqs, kind="stable")  # ties stay j-ascending
        if len(order) < nr_pos:
            end = len(order)
        else:
            cutoff = freqs[order[nr_pos - 1]]
            end = nr_pos + int(
                (freqs[order[nr_pos:]] <= cutoff).cumprod().sum()
            )
        chosen = jj[order[:end]]
        new_row = mat[k].copy()
        new_row[chosen] = _CHAN[maj[chosen]]
        s_modified = new_row[new_row != _DASH].tobytes().decode("latin1")
        for acc in seq_to_acc[s]:
            s_prime[acc] = s_modified
    return s_prime
