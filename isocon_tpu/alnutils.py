"""Alignment-string helpers shared by correction and testing phases.

Re-implementations of ``functions.py`` helpers operating on aligned string
pairs (with '-' gaps).
"""
from __future__ import annotations

import re
from typing import Dict, List, Set, Tuple

import numpy as np

_GAP_RUN = re.compile(r"[-]+")
_DASH = np.uint8(ord("-"))


def _bytes(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("latin1"), dtype=np.uint8)


def get_mask_start_and_end(aln_a: str, aln_b: str) -> Tuple[int, int]:
    """Mask leading/trailing gap runs caused by length differences
    (``functions.py:218-236``)."""
    mask_start, mask_end = 0, len(aln_a)
    for m in _GAP_RUN.finditer(aln_a):
        if m.start() == 0:
            mask_start = m.end()
        if m.end() == len(aln_a):
            mask_end = m.start()
    for m in _GAP_RUN.finditer(aln_b):
        if m.start() == 0:
            assert mask_start == 0
            mask_start = m.end()
        if m.end() == len(aln_a):
            assert mask_end == len(aln_a)
            mask_end = m.start()
    return mask_start, mask_end


def filter_exon_differences(
    pairwise: Dict[str, Dict[str, Tuple[str, str, Tuple[int, int, int]]]],
    min_exon_diff: int,
    ignore_ends_len: int,
) -> Set[str]:
    """Drop alignments with an interior gap run >= min_exon_diff
    (``functions.py:23-50``).  Mutates `pairwise` in place; returns the set
    of second keys removed."""
    pattern = re.compile(r"[-]{%d,}" % min_exon_diff)
    filtered: Set[str] = set()
    for s1 in list(pairwise.keys()):
        for s2 in list(pairwise[s1].keys()):
            a1, a2, _stats = pairwise[s1][s2]
            start, end = get_mask_start_and_end(a1, a2)
            start = min(ignore_ends_len, start)
            end = max(len(a1) - ignore_ends_len, end)
            if pattern.search(a1[start:end]) or pattern.search(a2[start:end]):
                del pairwise[s1][s2]
                filtered.add(s2)
    return filtered


def read_errors_from_alignment(ref_aln: str, read_aln: str) -> Tuple[int, int, int]:
    """(insertions, deletions, substitutions) of the read vs the reference,
    end gap runs excluded (``functions.py:495-522``).  Vectorized: this is
    called once per read per test edge."""
    a = _bytes(ref_aln)
    b = _bytes(read_aln)
    n = len(a)

    def lead(arr):
        nz = np.flatnonzero(arr != _DASH)
        return int(nz[0]) if nz.size else len(arr)

    start = max(lead(a), lead(b))
    stop = n - max(lead(a[::-1]), lead(b[::-1]))
    if stop <= start:
        return 0, 0, 0
    aa = a[start:stop]
    bb = b[start:stop]
    diff = aa != bb
    ins = int((diff & (aa == _DASH)).sum())
    dele = int((diff & (bb == _DASH)).sum())
    subs = int(diff.sum()) - ins - dele
    return ins, dele, subs


def read_errors_batch(pairs) -> List[Tuple[int, int, int]]:
    """Batched ``read_errors_from_alignment`` over (ref_aln, read_aln)
    string pairs: one padded [R, Lmax] byte-matrix pass instead of
    per-read numpy calls (720k of them were 41 s of a 10k-scale stat
    profile).  Padding uses '-', which is exactness-preserving: each
    pair's two strings have equal true length, so padding columns compare
    equal (no diff contribution) and only extend the excluded end-gap
    runs."""
    R = len(pairs)
    if R == 0:
        return []
    Lmax = max(len(a) for a, _b in pairs)
    A = np.full((R, Lmax), _DASH, dtype=np.uint8)
    B = np.full((R, Lmax), _DASH, dtype=np.uint8)
    for k, (a, b) in enumerate(pairs):
        assert len(a) == len(b)
        A[k, : len(a)] = _bytes(a)
        B[k, : len(b)] = _bytes(b)
    am = A != _DASH
    bm = B != _DASH
    anym = am.any(axis=1)

    def lead2(m):
        # first non-dash column per row (Lmax when all-dash)
        return np.where(m.any(axis=1), m.argmax(axis=1), Lmax)

    start = np.maximum(lead2(am), lead2(bm))
    last_a = Lmax - 1 - am[:, ::-1].argmax(axis=1)
    last_b = Lmax - 1 - bm[:, ::-1].argmax(axis=1)
    stop = np.where(anym & bm.any(axis=1),
                    np.minimum(last_a, last_b) + 1, 0)
    cols = np.arange(Lmax)
    win = (cols[None, :] >= start[:, None]) & (cols[None, :] < stop[:, None])
    diff = (A != B) & win
    ins = (diff & ~am).sum(axis=1)
    dele = (diff & ~bm).sum(axis=1)
    subs = diff.sum(axis=1) - ins - dele
    return [(int(i), int(d), int(s)) for i, d, s in zip(ins, dele, subs)]


def alignment_stats(a1: str, a2: str) -> Tuple[int, int, int]:
    x = _bytes(a1)
    y = _bytes(a2)
    eq = x == y
    matches = int((eq & (x != _DASH)).sum())
    mismatches = int((~eq & (x != _DASH) & (y != _DASH)).sum())
    return matches, mismatches, len(a1) - matches - mismatches
