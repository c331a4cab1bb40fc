"""Nearest-neighbor search over unique sequences.

Replaces the reference's adaptive per-query expansion
(``nearest_neighbor_graph.py:110-198``) with rounds of batched banded edit
distances:

  round k: every unresolved query considers all neighbors within length
  difference <= k (a contiguous window of the length-sorted list), their
  banded EDs are computed in one fused batch, and a query resolves the
  moment some neighbor has 0 < ed <= k -- neighbors outside the window
  then provably satisfy ed >= |len diff| > k, so the minimum and ALL its
  ties are exact.  Unresolved queries escalate to 2k.

This yields exactly the reference's result set: for each query, the set of
neighbors at the minimum positive edit distance (all ties kept,
``nearest_neighbor_graph.py:155-178``), searching no further than the
initial upper bound best_ed = len(query) (``:129``) -- queries whose
nearest neighbor is farther than their own length end up isolated
(``compute_nearest_neighbor_graph``'s ``isolated`` set, ``:267-273``).

The per-query ``lower_target_edit_distances`` seeding (``:125-129``) and the
running-bound window shrinking are pure pruning in the reference; they do
not change the result and have no analog here.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def _sorted_order(seqs: Sequence[str]) -> np.ndarray:
    """Deterministic length-sorted order: by (len, seq).

    The reference sorts by length only (``nearest_neighbor_graph.py:246``),
    leaving equal-length order to dict insertion; results do not depend on
    the order, only on the window contents, which are identical.
    """
    return np.array(
        sorted(range(len(seqs)), key=lambda i: (len(seqs[i]), seqs[i])),
        dtype=np.int64,
    )


def nearest_neighbors(
    seqs: Sequence[str],
    converged: Sequence[bool],
    engine,
    k0: int = 63,
    depth: Optional[int] = None,
) -> List[Dict[int, int]]:
    """Min-positive-ED neighbor sets with ties for every unique sequence.

    Args:
      seqs: unique sequences.
      converged: mask; converged queries get an empty result (they still
        serve as targets), mirroring ``nearest_neighbor_graph.py:121-123``.
      engine: PairEngine.
      depth: neighbor_search_depth -- limits the window to the `depth`
        nearest list positions on each side (reference ``:190-191``).

    Returns: per input index, dict {target_index: ed}.
    """
    n = len(seqs)
    out: List[Dict[int, int]] = [dict() for _ in range(n)]
    if n <= 1:
        return out
    order = _sorted_order(seqs)
    lens = np.array([len(seqs[i]) for i in order], dtype=np.int64)
    conv = np.array([bool(converged[i]) for i in order])

    pair_cache: Dict[tuple, int] = {}       # certified exact values
    unresolved = [p for p in range(n) if not conv[p]]
    k = int(k0)
    while unresolved:
        caps = {}
        windows = {}
        want = set()
        for p in unresolved:
            cap = min(k, lens[p])           # never search beyond len(query)
            caps[p] = cap
            lo = int(np.searchsorted(lens, lens[p] - cap, side="left"))
            hi = int(np.searchsorted(lens, lens[p] + cap, side="right"))
            if depth is not None:
                lo = max(lo, p - depth)
                hi = min(hi, p + depth + 1)
            windows[p] = (lo, hi)
            for q in range(lo, hi):
                if q != p:
                    a, b = (p, q) if p < q else (q, p)
                    if (a, b) not in pair_cache:
                        want.add((a, b))

        want = sorted(want)
        if want:
            pairs = [(seqs[order[a]], seqs[order[b]]) for a, b in want]
            kcap = [min(int(max(caps.get(a, 0), caps.get(b, 0))), k)
                    for a, b in want]
            eds, _ = engine.edit_distances(pairs, k_cap=kcap)
            for (a, b), d in zip(want, eds):
                if d >= 0:
                    pair_cache[(a, b)] = int(d)

        still = []
        for p in unresolved:
            lo, hi = windows[p]
            cap = caps[p]
            best = None
            for q in range(lo, hi):
                if q == p:
                    continue
                key = (p, q) if p < q else (q, p)
                d = pair_cache.get(key)
                if d is None or d <= 0 or d > cap:
                    continue
                if best is None or d < best:
                    best = d
            if best is not None:
                ties = {}
                for q in range(lo, hi):
                    if q == p:
                        continue
                    key = (p, q) if p < q else (q, p)
                    if pair_cache.get(key) == best:
                        ties[int(order[q])] = best
                out[int(order[p])] = ties
            elif cap >= lens[p]:
                pass  # isolated: nothing within len(query); empty dict stays
            else:
                still.append(p)
        unresolved = [p for p in still]
        if k >= int(lens.max()):
            break
        k *= 2
    return out


def nearest_neighbors_2set(
    queries: Dict[str, str],
    targets: Dict[str, str],
    engine,
    k0: int = 63,
    depth: Optional[int] = None,
) -> Dict[str, Dict[str, int]]:
    """Read -> candidate min-ED assignment with ties (allows ed == 0).

    Mirrors ``nearest_neighbor_graph.py:341-424``: every query gets an entry
    (possibly empty); minimum is over targets with ed <= len(query).
    """
    t_accs = sorted(targets)
    t_seqs = [targets[a] for a in t_accs]
    t_lens = np.array([len(s) for s in t_seqs], dtype=np.int64)
    t_order = np.argsort(t_lens, kind="stable")
    t_lens_sorted = t_lens[t_order]

    out: Dict[str, Dict[str, int]] = {}
    q_accs = sorted(queries)
    unresolved = list(range(len(q_accs)))
    for qa in q_accs:
        out[qa] = {}
    if not t_accs:
        return out

    cache: Dict[tuple, int] = {}
    k = int(k0)
    while unresolved:
        want = []
        windows = {}
        caps = {}
        for qi in unresolved:
            qs = queries[q_accs[qi]]
            cap = min(k, len(qs))
            caps[qi] = cap
            lo = int(np.searchsorted(t_lens_sorted, len(qs) - cap, "left"))
            hi = int(np.searchsorted(t_lens_sorted, len(qs) + cap, "right"))
            if depth is not None:
                mid = int(np.searchsorted(t_lens_sorted, len(qs)))
                lo = max(lo, mid - depth)
                hi = min(hi, mid + depth)
            windows[qi] = (lo, hi)
            for tpos in range(lo, hi):
                if (qi, tpos) not in cache:
                    want.append((qi, tpos))
        if want:
            pairs = [
                (queries[q_accs[qi]], t_seqs[int(t_order[tpos])])
                for qi, tpos in want
            ]
            kcap = [caps[qi] for qi, _ in want]
            eds, _ = engine.edit_distances(pairs, k_cap=kcap)
            for (qi, tpos), d in zip(want, eds):
                if d >= 0:
                    cache[(qi, tpos)] = int(d)

        still = []
        for qi in unresolved:
            lo, hi = windows[qi]
            cap = caps[qi]
            vals = [
                cache[(qi, tpos)]
                for tpos in range(lo, hi)
                if (qi, tpos) in cache and cache[(qi, tpos)] <= cap
            ]
            if vals:
                best = min(vals)
                ties = {
                    t_accs[int(t_order[tpos])]: best
                    for tpos in range(lo, hi)
                    if cache.get((qi, tpos)) == best
                }
                out[q_accs[qi]] = ties
            elif cap >= len(queries[q_accs[qi]]):
                pass  # isolated
            else:
                still.append(qi)
        unresolved = still
        if k > int(t_lens.max()) + max(len(queries[a]) for a in q_accs):
            break
        k *= 2
    return out
