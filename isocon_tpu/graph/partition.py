"""Star partitioning of the nearest-neighbor graph.

Re-implements the reference's maximum-weight-reachable-component extraction
(``partitions.py:301-413`` and the end-invariant variant
``end_invariant_functions.py:405-533``) on integer-indexed adjacency lists
with an explicit alive mask instead of networkx node removal.

``star_partition`` deliberately stays on Python sets: the per-round
``processed`` pruning makes it ~O(E) per round in practice, and it measures
0.08 s at 20k nodes / 30k edges -- a numpy-CSR local-index rewrite was
built, proven decision-identical (tests/test_partition_equiv.py) and
measured 2.5-3x SLOWER at every scale tried (per-component array overhead
dominates the many-small-components shape of real NN graphs), so it was
dropped.  ``greedy_bipartite_assignment`` IS vectorized (CSR + incremental
degree maintenance): the scalar version cost 1.22 s per call at
C=1600/R=10k (called every stat-filter realignment round), the vectorized
one 0.06 s (20x) with pinned-identical outputs.

Semantics preserved:
 * operate on the TRANSPOSED nearest-neighbor graph;
 * per weakly-connected component (largest first), repeatedly pick the
   candidate start node whose reachable set has maximum total degree weight;
   weight ties break by (variant "candidates") more direct neighbors then
   lexicographically smaller node, or (variant "ends") lexicographically
   smaller node only (``partitions.py:354-369`` vs
   ``end_invariant_functions.py:476-486``);
 * nodes already reached from an earlier candidate are not evaluated as
   candidates themselves (the ``processed`` set, ``partitions.py:322-338``);
 * the chosen component's center is re-picked as the node maximizing
   degree + surviving-out-neighbor count, lexicographic min on ties
   (``partitions.py:385-399``);
 * the component is removed and the loop repeats.

Where the reference is order-dependent (python set iteration), we iterate
candidates in lexicographic node order, which makes results deterministic.
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Set, Tuple

import numpy as np


def _weak_components_sets(n: int, adj_all: List[Set[int]]) -> List[Set[int]]:
    seen = [False] * n
    comps = []
    for s in range(n):
        if seen[s]:
            continue
        comp = set()
        stack = [s]
        seen[s] = True
        while stack:
            u = stack.pop()
            comp.add(u)
            for v in adj_all[u]:
                if not seen[v]:
                    seen[v] = True
                    stack.append(v)
        comps.append(comp)
    return comps


def _reachable(start: int, out_adj: List[Set[int]],
               alive: Sequence[bool]) -> Set[int]:
    comp = {start}
    stack = [start]
    while stack:
        u = stack.pop()
        for v in out_adj[u]:
            if alive[v] and v not in comp:
                comp.add(v)
                stack.append(v)
    return comp


def star_partition(
    names: Sequence[str],
    degrees: Sequence[int],
    edges: Iterable[Tuple[int, int]],
    tiebreak: str = "candidates",
) -> Tuple[Dict[int, int], Dict[int, Set[int]]]:
    """Partition the transposed NN graph into star clusters.

    Args:
      names: node identity strings used for lexicographic tie-breaks (the
        reference compares the sequences / accessions themselves).
      degrees: node weights (multiplicity of identical reads).
      edges: directed edges of the NN graph G* (u -> u's nearest neighbor).
        They are reversed internally (``partitions.py:425``).
      tiebreak: "candidates" (``get_partitions_no_copy``) or "ends"
        (``partition_highest_reachable_with_edge_degrees``).

    Returns:
      M: {center_index: component weight (0 for singleton centers)}
      partition: {center_index: set of member indices (center excluded)}
    """
    n = len(names)
    out_adj: List[Set[int]] = [set() for _ in range(n)]  # transposed edges
    adj_all: List[Set[int]] = [set() for _ in range(n)]
    for u, v in edges:
        out_adj[v].add(u)       # reverse: G^T
        adj_all[u].add(v)
        adj_all[v].add(u)

    alive = [True] * n
    M: Dict[int, int] = {}
    partition: Dict[int, Set[int]] = {}

    comps = _weak_components_sets(n, adj_all)
    comps.sort(key=lambda c: (-len(c), min(names[i] for i in c)))

    for comp in comps:
        remaining = set(comp)
        while remaining:
            processed: Set[int] = set()
            best_weight = 0
            best_nodes: Set[int] = set()
            best_center = None
            best_center_nbrs = -1
            last_m = None
            for m in sorted(remaining, key=lambda i: names[i]):
                if m in processed:
                    continue
                last_m = m
                reach = _reachable(m, out_adj, alive)
                processed |= reach
                w = sum(degrees[x] for x in reach)
                nbrs = sum(1 for x in out_adj[m] if alive[x])
                if best_center is None or best_weight == 0:
                    take = True
                elif w > best_weight:
                    take = True
                elif w == best_weight:
                    if tiebreak == "candidates":
                        if nbrs > best_center_nbrs:
                            take = True
                        elif nbrs == best_center_nbrs:
                            take = names[m] < names[best_center]
                        else:
                            take = False
                    else:  # "ends": lexicographic only
                        take = names[m] < names[best_center]
                else:
                    take = False
                if take:
                    best_weight = w
                    best_nodes = reach
                    best_center = m
                    best_center_nbrs = nbrs

            if best_weight == 0:
                # no edges at all in what remains: each node its own center
                # (the reference reaches this with the last iterated m,
                # ``partitions.py:381-383``; we emit the last candidate too
                # and continue the loop for the rest)
                m = last_m
                M[m] = 0
                partition[m] = set()
                alive[m] = False
                remaining.discard(m)
                continue

            # center refinement within the chosen reachable set
            center = None
            best_direct = -1
            for x in best_nodes:
                direct = degrees[x] + sum(1 for y in out_adj[x] if alive[y])
                if direct > best_direct or (
                    direct == best_direct and names[x] < names[center]
                ):
                    best_direct = direct
                    center = x
            M[center] = best_weight
            partition[center] = best_nodes - {center}
            for x in best_nodes:
                alive[x] = False
            remaining -= best_nodes
    return M, partition


def greedy_bipartite_assignment(
    read_edges: Dict[str, Iterable[str]], candidates: Iterable[str]
) -> Dict[str, Set[str]]:
    """Assign reads to candidates greedily by max remaining degree.

    Mirrors ``partitions.py:598-644``: repeatedly take the candidate with
    the most unassigned supporting reads (lexicographically smallest on
    ties, via ``max(sorted(...))`` semantics), claim its reads, remove both.
    Every candidate gets an entry, possibly empty.

    Vectorized: candidates indexed in lexicographic order so np.argmax's
    first-maximum rule IS the tie-break; per pick, only the degrees of
    candidates sharing a newly-claimed read are decremented (CSR over the
    read axis), so total work is O(E) plus one O(C) argmax per pick.
    """
    cand_names = sorted(set(candidates))
    C = len(cand_names)
    cidx = {c: i for i, c in enumerate(cand_names)}
    read_names: List[str] = []
    ridx: Dict[str, int] = {}
    e_c: List[int] = []
    e_r: List[int] = []
    for r, cs in read_edges.items():
        for c in cs:
            ci = cidx.get(c)
            if ci is None:
                continue
            rj = ridx.get(r)
            if rj is None:
                rj = ridx[r] = len(read_names)
                read_names.append(r)
            e_c.append(ci)
            e_r.append(rj)
    R = len(read_names)
    ec = np.asarray(e_c, dtype=np.int64)
    er = np.asarray(e_r, dtype=np.int64)
    if len(ec):
        # dedupe (candidate, read) pairs: sets in the scalar version did
        keys = ec * max(R, 1) + er
        _, uniq = np.unique(keys, return_index=True)
        ec, er = ec[uniq], er[uniq]
    deg = np.zeros(C, dtype=np.int64)
    np.add.at(deg, ec, 1)
    # CSR over candidates (their read lists) and over reads (their edges)
    c_order = np.argsort(ec, kind="stable")
    c_reads = er[c_order]
    c_ptr = np.zeros(C + 1, dtype=np.int64)
    np.add.at(c_ptr, ec + 1, 1)
    np.cumsum(c_ptr, out=c_ptr)
    r_order = np.argsort(er, kind="stable")
    r_cands = ec[r_order]
    r_ptr = np.zeros(R + 1, dtype=np.int64)
    np.add.at(r_ptr, er + 1, 1)
    np.cumsum(r_ptr, out=r_ptr)

    assigned = np.zeros(R, dtype=bool)
    done = np.zeros(C, dtype=bool)
    result: Dict[str, Set[str]] = {}
    for _ in range(C):
        d = np.where(done, -1, deg)
        best = int(np.argmax(d))  # first max = lexicographically smallest
        done[best] = True
        reads = c_reads[c_ptr[best]:c_ptr[best + 1]]
        newly = reads[~assigned[reads]]
        result[cand_names[best]] = {read_names[int(r)] for r in newly}
        if len(newly):
            assigned[newly] = True
            for r in newly:
                cs = r_cands[r_ptr[r]:r_ptr[r + 1]]
                np.subtract.at(deg, cs, 1)
    return result
