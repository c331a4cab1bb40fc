"""The vectorized (CSR + numpy frontier) star partition and bipartite
assignment must reproduce the round-3 set-based implementations
decision-for-decision (both tie-break variants, random graphs).

The reference implementations below are verbatim ports of the scalar
versions that shipped through round 3 (themselves pinned to the
reference's ``partitions.py:301-413,598-644`` semantics by the golden and
parity suites), kept here as the equivalence oracle.
"""
from __future__ import annotations

import random
from typing import Dict, Iterable, List, Sequence, Set, Tuple

from isocon_tpu.graph.partition import (
    greedy_bipartite_assignment, star_partition)


def _weak_components_ref(n, adj_all):
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


def _reachable_ref(start, out_adj, alive):
    comp = {start}
    stack = [start]
    while stack:
        u = stack.pop()
        for v in out_adj[u]:
            if alive[v] and v not in comp:
                comp.add(v)
                stack.append(v)
    return comp


def star_partition_ref(names, degrees, edges, tiebreak="candidates"):
    n = len(names)
    out_adj: List[Set[int]] = [set() for _ in range(n)]
    adj_all: List[Set[int]] = [set() for _ in range(n)]
    for u, v in edges:
        out_adj[v].add(u)
        adj_all[u].add(v)
        adj_all[v].add(u)
    alive = [True] * n
    M: Dict[int, int] = {}
    partition: Dict[int, Set[int]] = {}
    comps = _weak_components_ref(n, adj_all)
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
                reach = _reachable_ref(m, out_adj, alive)
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
                    else:
                        take = names[m] < names[best_center]
                else:
                    take = False
                if take:
                    best_weight = w
                    best_nodes = reach
                    best_center = m
                    best_center_nbrs = nbrs
            if best_weight == 0:
                m = last_m
                M[m] = 0
                partition[m] = set()
                alive[m] = False
                remaining.discard(m)
                continue
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


def greedy_bipartite_assignment_ref(read_edges, candidates):
    cand_to_reads: Dict[str, Set[str]] = {c: set() for c in candidates}
    for r, cs in read_edges.items():
        for c in cs:
            if c in cand_to_reads:
                cand_to_reads[c].add(r)
    assigned: Set[str] = set()
    result: Dict[str, Set[str]] = {}
    left = set(cand_to_reads)
    while left:
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


def _random_graph(rng, n, avg_out, ties):
    names = ["s%04d" % i for i in range(n)]
    rng.shuffle(names)
    degrees = [rng.choice([1, 1, 1, 2, 3, 7]) for _ in range(n)]
    if ties:  # heavy weight ties to stress tie-break rules
        degrees = [1] * n
    edges = set()
    for u in range(n):
        for _ in range(rng.randrange(0, avg_out * 2 + 1)):
            v = rng.randrange(n)
            if v != u:
                edges.add((u, v))
    return names, degrees, sorted(edges)


def test_star_partition_matches_reference_impl():
    rng = random.Random(5)
    for trial in range(30):
        n = rng.randrange(1, 60)
        names, degrees, edges = _random_graph(
            rng, n, avg_out=rng.choice([1, 1, 2, 4]), ties=trial % 3 == 0)
        for tiebreak in ("candidates", "ends"):
            want = star_partition_ref(names, degrees, edges, tiebreak)
            got = star_partition(names, degrees, edges, tiebreak)
            assert got == want, (trial, tiebreak, n, len(edges))


def test_star_partition_zero_degree_singletons():
    # the best_weight == 0 branch (reference partitions.py:381-383)
    names = ["a", "b", "c"]
    degrees = [0, 0, 0]
    edges = [(0, 1)]
    for tiebreak in ("candidates", "ends"):
        want = star_partition_ref(names, degrees, edges, tiebreak)
        got = star_partition(names, degrees, edges, tiebreak)
        assert got == want


def test_bipartite_assignment_matches_reference_impl():
    rng = random.Random(9)
    for trial in range(30):
        nc = rng.randrange(1, 30)
        nr = rng.randrange(0, 80)
        cands = ["c%03d" % i for i in range(nc)]
        rng.shuffle(cands)
        read_edges = {}
        for r in range(nr):
            k = rng.randrange(0, min(nc, 4) + 1)
            read_edges["r%03d" % r] = rng.sample(cands, k)
        # some edges to unknown candidates must be ignored
        if nr:
            read_edges["r%03d" % rng.randrange(nr)] = ["zzz_unknown"]
        want = greedy_bipartite_assignment_ref(read_edges, cands)
        got = greedy_bipartite_assignment(read_edges, cands)
        assert got == want, trial
