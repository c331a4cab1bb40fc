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

The reference's running-bound window shrinking (``:155-178``: after a
neighbor at distance d is found, only targets with |len diff| <= d can
still beat or tie it, since ed >= |len diff|) has a batched analog here:
each slab computes a narrow seed sub-window (|len diff| <= _SEED_K)
first, takes the per-query best certified distance as the bound, and
only then computes the remaining entries within |len diff| <= bound.
Entries beyond the bound provably cannot change the minimum or its tie
set, so the result is identical while the kernel volume drops to what
the reference's pruned expansion would visit (~40-60%% of the full
window on clustered reads).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

_NN_DEBUG = bool(os.environ.get("ISOCON_NN_DEBUG"))


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


_BIG = np.int64(2 ** 30)
_SLAB_ENTRIES = 4_000_000  # window-entry budget per bookkeeping slab
_SEED_K = 16  # |len diff| of the seed sub-window (two-phase pruning)


class _PairCache:
    """Certified pair EDs keyed a*n+b (a < b), stored as a log-structured
    list of sorted (keys, vals) runs.

    At 10k+ reads the per-round windows hold tens of millions of entries;
    python dict bookkeeping dominated the whole phase-1 wall clock, so the
    cache and all window logic are numpy (SURVEY.md §7 design stance).
    Runs instead of one array because the one-array insert re-sorted ALL
    cached pairs on every slab insert -- O(total) per slab, superlinear
    across a 50-100k-read search.  Each inserted slab is already sorted
    (callers insert ``np.unique`` survivors), so insert is an append plus
    geometric merging of adjacent runs (amortized O(log) merges per key);
    lookup binary-searches each of the <= ~log2(N) live runs."""

    def __init__(self):
        self.runs: List[Tuple[np.ndarray, np.ndarray]] = []

    @property
    def keys(self):  # single sorted view (tests / introspection only)
        self._compact()
        return self.runs[0][0] if self.runs else np.empty(0, np.int64)

    @property
    def vals(self):
        self._compact()
        return self.runs[0][1] if self.runs else np.empty(0, np.int32)

    def _compact(self):
        while len(self.runs) > 1:
            self._merge_last_two()

    def _merge_last_two(self):
        k2, v2 = self.runs.pop()
        k1, v1 = self.runs.pop()
        mk = np.concatenate([k1, k2])
        mv = np.concatenate([v1, v2])
        o = np.argsort(mk, kind="stable")
        self.runs.append((mk[o], mv[o]))

    def lookup(self, keys: np.ndarray):
        """-> (present mask, values where present)."""
        present = np.zeros(keys.shape, bool)
        vals = np.zeros(keys.shape, np.int32)
        for rk, rv in self.runs:
            pos = np.searchsorted(rk, keys)
            posc = np.minimum(pos, rk.size - 1)
            hit = rk[posc] == keys
            # keys are unique across runs (callers only insert misses),
            # so no override order to worry about
            present |= hit
            vals[hit] = rv[posc][hit]
        return present, vals

    def insert(self, keys: np.ndarray, vals: np.ndarray):
        if keys.size == 0:
            return
        if keys.size > 1 and not (keys[1:] >= keys[:-1]).all():
            o = np.argsort(keys, kind="stable")  # callers pass sorted keys;
            keys, vals = keys[o], vals[o]        # guard anyway (O(B) check)
        self.runs.append((keys, vals.astype(np.int32)))
        while (len(self.runs) > 1
               and self.runs[-1][0].size * 2 >= self.runs[-2][0].size):
            self._merge_last_two()


def _window_entries(unresolved, caps, lo, hi):
    """Flatten per-query windows [lo, hi) into (qrep, tgt, caprep, cum,
    counts) -- the vectorized form of the reference's per-query expansion."""
    counts = np.maximum(hi - lo, 0)
    total = int(counts.sum())
    qrep = np.repeat(unresolved, counts)
    caprep = np.repeat(caps, counts)
    cum = np.zeros(len(counts), np.int64)
    np.cumsum(counts[:-1], out=cum[1:])
    tgt = np.arange(total, dtype=np.int64) - np.repeat(cum, counts) \
        + np.repeat(lo, counts)
    return qrep, tgt, caprep, cum, counts


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
    # engine-table ids in sorted order: batches then ship index arrays,
    # never per-pair string tuples (the string-pair lists were ~44M
    # Python tuples per 10k-read run)
    ids = engine.add_seqs([seqs[int(i)] for i in order])

    cache = _PairCache()
    unresolved = np.flatnonzero(~conv).astype(np.int64)
    k = int(k0)
    while unresolved.size:
        caps_all = np.minimum(k, lens[unresolved])
        lo_all = np.searchsorted(lens, lens[unresolved] - caps_all, "left")
        hi_all = np.searchsorted(lens, lens[unresolved] + caps_all, "right")
        if depth is not None:
            lo_all = np.maximum(lo_all, unresolved - depth)
            hi_all = np.minimum(hi_all, unresolved + depth + 1)
        capfull = np.zeros(n, np.int64)
        capfull[unresolved] = caps_all

        # process queries in slabs so the flattened window arrays stay
        # bounded; the cache carries certified results across slabs/rounds
        still: List[np.ndarray] = []
        s = 0
        while s < unresolved.size:
            e = s + 1
            entries = int(hi_all[s] - lo_all[s])
            while e < unresolved.size and entries < _SLAB_ENTRIES:
                entries += int(max(hi_all[e] - lo_all[e], 0))
                e += 1
            sl = slice(s, e)
            s = e
            qrep, tgt, caprep, cum, counts = _window_entries(
                unresolved[sl], caps_all[sl], lo_all[sl], hi_all[sl])
            a = np.minimum(qrep, tgt)
            b = np.maximum(qrep, tgt)
            wkeys = a * n + b
            self_mask = tgt != qrep
            ad = np.abs(lens[tgt] - lens[qrep])

            def _compute(mask):
                ukeys = np.unique(wkeys[mask])
                have, _v = cache.lookup(ukeys)
                newkeys = ukeys[~have]
                if newkeys.size:
                    na = newkeys // n
                    nb = newkeys % n
                    kcap = np.minimum(
                        np.maximum(capfull[na], capfull[nb]), k)
                    eds, _ = engine.edit_distances_idx(
                        ids[na], ids[nb], k_cap=kcap)
                    eds = np.asarray(eds)
                    good = eds >= 0
                    cache.insert(newkeys[good], eds[good])
                return newkeys.size

            # two-phase pruning (see module docstring): seed the narrow
            # sub-window, bound each query by its best certified distance,
            # then compute only entries that can still beat or tie it
            nA = _compute(self_mask & (ad <= _SEED_K))
            present, vals = cache.lookup(wkeys)
            vA = np.where(
                present & self_mask & (vals > 0) & (vals <= caprep),
                vals.astype(np.int64), _BIG)
            bestA = np.minimum.reduceat(
                np.concatenate([vA, [_BIG]]), cum)[: len(counts)]
            bestA[counts == 0] = _BIG
            bound = np.repeat(np.minimum(bestA, caps_all[sl]), counts)
            nB = _compute(self_mask & ~present & (ad > _SEED_K) & (ad <= bound))
            if _NN_DEBUG:
                seeded = int((bestA < _BIG).sum())
                print("nn.slab k=%d nq=%d entries=%d computedA=%d "
                      "seeded=%d computedB=%d" % (
                          k, len(counts), int(counts.sum()),
                          nA, seeded, nB), flush=True)

            present, vals = cache.lookup(wkeys)
            v = np.where(
                present & self_mask & (vals > 0) & (vals <= caprep),
                vals.astype(np.int64), _BIG)
            best = np.minimum.reduceat(np.concatenate([v, [_BIG]]), cum)[
                : len(counts)]
            best[counts == 0] = _BIG
            found = best < _BIG

            tie_mask = (v == np.repeat(best, counts)) \
                & np.repeat(found, counts)
            tq = qrep[tie_mask]
            tt = tgt[tie_mask]
            tv = v[tie_mask]
            oq = order[tq]
            ot = order[tt]
            for qi, ti, vi in zip(oq.tolist(), ot.tolist(), tv.tolist()):
                out[qi][ti] = int(vi)

            caps = caps_all[sl]
            usl = unresolved[sl]
            still.append(usl[~found & (caps < lens[usl])])

        unresolved = (np.concatenate(still) if still
                      else np.empty(0, np.int64))
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
    nt = len(t_accs)

    out: Dict[str, Dict[str, int]] = {}
    q_accs = sorted(queries)
    q_lens = np.array([len(queries[a]) for a in q_accs], dtype=np.int64)
    for qa in q_accs:
        out[qa] = {}
    if not t_accs:
        return out

    cache = _PairCache()
    q_ids = engine.add_seqs([queries[a] for a in q_accs])
    t_ids = engine.add_seqs([t_seqs[int(i)] for i in t_order])
    unresolved = np.arange(len(q_accs), dtype=np.int64)
    k = int(k0)
    k_stop = int(t_lens.max()) + int(q_lens.max())
    while unresolved.size:
        caps_all = np.minimum(k, q_lens[unresolved])
        lo_all = np.searchsorted(t_lens_sorted, q_lens[unresolved] - caps_all,
                                 "left")
        hi_all = np.searchsorted(t_lens_sorted, q_lens[unresolved] + caps_all,
                                 "right")
        if depth is not None:
            mid = np.searchsorted(t_lens_sorted, q_lens[unresolved])
            lo_all = np.maximum(lo_all, mid - depth)
            hi_all = np.minimum(hi_all, mid + depth)

        still: List[np.ndarray] = []
        s = 0
        while s < unresolved.size:
            e = s + 1
            entries = int(max(hi_all[s] - lo_all[s], 0))
            while e < unresolved.size and entries < _SLAB_ENTRIES:
                entries += int(max(hi_all[e] - lo_all[e], 0))
                e += 1
            sl = slice(s, e)
            s = e
            qrep, tgt, caprep, cum, counts = _window_entries(
                unresolved[sl], caps_all[sl], lo_all[sl], hi_all[sl])
            wkeys = qrep * nt + tgt
            ad = np.abs(t_lens_sorted[tgt] - q_lens[qrep])

            def _compute(mask):
                have, _v = cache.lookup(wkeys[mask])
                newkeys = np.unique(wkeys[mask][~have])
                if newkeys.size:
                    nq = newkeys // nt
                    ntt = newkeys % nt
                    kcap = np.minimum(q_lens[nq], k)
                    eds, _ = engine.edit_distances_idx(
                        q_ids[nq], t_ids[ntt], k_cap=kcap)
                    eds = np.asarray(eds)
                    good = eds >= 0
                    cache.insert(newkeys[good], eds[good])

            # two-phase pruning (module docstring); ed == 0 counts here
            # (:341-424 allows exact matches), so the bound includes it
            _compute(ad <= _SEED_K)
            present, vals = cache.lookup(wkeys)
            vA = np.where(present & (vals <= caprep),
                          vals.astype(np.int64), _BIG)
            bestA = np.minimum.reduceat(
                np.concatenate([vA, [_BIG]]), cum)[: len(counts)]
            bestA[counts == 0] = _BIG
            bound = np.repeat(np.minimum(bestA, caps_all[sl]), counts)
            _compute(~present & (ad > _SEED_K) & (ad <= bound))

            present, vals = cache.lookup(wkeys)
            v = np.where(present & (vals <= caprep),
                         vals.astype(np.int64), _BIG)
            best = np.minimum.reduceat(np.concatenate([v, [_BIG]]), cum)[
                : len(counts)]
            best[counts == 0] = _BIG
            found = best < _BIG

            tie_mask = (v == np.repeat(best, counts)) \
                & np.repeat(found, counts)
            tq = qrep[tie_mask]
            tt = tgt[tie_mask]
            tv = v[tie_mask]
            for qi, ti, vi in zip(tq.tolist(), tt.tolist(), tv.tolist()):
                out[q_accs[qi]][t_accs[int(t_order[ti])]] = int(vi)

            caps = caps_all[sl]
            usl = unresolved[sl]
            still.append(usl[~found & (caps < q_lens[usl])])

        unresolved = (np.concatenate(still) if still
                      else np.empty(0, np.int64))
        if k > k_stop:
            break
        k *= 2
    return out
