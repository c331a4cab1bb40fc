"""Alignment-string helpers shared by correction and testing phases.

Re-implementations of ``functions.py`` helpers operating on aligned string
pairs (with '-' gaps).
"""
from __future__ import annotations

import re
from typing import Dict, Set, Tuple

_GAP_RUN = re.compile(r"[-]+")


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
    end gap runs excluded (``functions.py:495-522``)."""
    def lead(s):
        m = re.match(r"[-]+", s)
        return len(m.group()) if m else 0

    start = max(lead(ref_aln), lead(read_aln))
    stop = len(ref_aln) - max(lead(ref_aln[::-1]), lead(read_aln[::-1]))
    ins = dele = subs = 0
    for n1, n2 in zip(ref_aln[start:stop], read_aln[start:stop]):
        if n1 == n2:
            continue
        if n1 == "-":
            ins += 1
        elif n2 == "-":
            dele += 1
        else:
            subs += 1
    return ins, dele, subs


def alignment_stats(a1: str, a2: str) -> Tuple[int, int, int]:
    matches = sum(1 for x, y in zip(a1, a2) if x == y and x != "-")
    mismatches = sum(1 for x, y in zip(a1, a2) if x != y and x != "-" and y != "-")
    return matches, mismatches, len(a1) - matches - mismatches
