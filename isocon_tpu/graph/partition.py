"""Star partitioning of the nearest-neighbor graph.

Re-implements the reference's maximum-weight-reachable-component extraction
(``partitions.py:301-413`` and the end-invariant variant
``end_invariant_functions.py:405-533``) on integer-indexed adjacency lists
with an explicit alive mask instead of networkx node removal.

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


def _weak_components(n: int, adj_all: List[Set[int]]) -> List[Set[int]]:
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


def _reachable(start: int, out_adj: List[Set[int]], alive: Sequence[bool]) -> Set[int]:
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

    comps = _weak_components(n, adj_all)
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
    """
    cand_to_reads: Dict[str, Set[str]] = {c: set() for c in candidates}
    for r, cs in read_edges.items():
        for c in cs:
            if c in cand_to_reads:
                cand_to_reads[c].add(r)
    assigned: Set[str] = set()
    result: Dict[str, Set[str]] = {}
    left = set(cand_to_reads)
    while left:
        # max degree, lexicographically smallest among maxima
        best = None
        best_deg = -1
        for c in sorted(left):
            deg = len(cand_to_reads[c] - assigned)
            if deg > best_deg:
                best_deg = deg
                best = c
        reads = cand_to_reads[best] - assigned
        result[best] = reads
        assigned |= reads
        left.discard(best)
    return result
