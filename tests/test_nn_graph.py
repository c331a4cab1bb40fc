"""NN search vs brute force; star partition properties."""
import random

import numpy as np

from isocon_tpu.graph.nn import nearest_neighbors, nearest_neighbors_2set
from isocon_tpu.graph.partition import star_partition, greedy_bipartite_assignment
from isocon_tpu.ops import oracle
from isocon_tpu.ops.engine import PairEngine


def rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def mutate(rng, s, n_ops):
    s = list(s)
    for _ in range(n_ops):
        op = rng.choice("SID")
        pos = rng.randrange(len(s)) if s else 0
        if op == "S" and s:
            s[pos] = rng.choice("ACGT")
        elif op == "I":
            s.insert(pos, rng.choice("ACGT"))
        elif op == "D" and len(s) > 1:
            del s[pos]
    return "".join(s)


def brute_nn(seqs, converged):
    """Reference semantics: min positive ed <= len(query), all ties."""
    out = []
    for i, a in enumerate(seqs):
        if converged[i]:
            out.append({})
            continue
        ds = {}
        for j, b in enumerate(seqs):
            if i == j:
                continue
            d = oracle.edit_distance(a, b)
            if 0 < d <= len(a):
                ds[j] = d
        if ds:
            m = min(ds.values())
            out.append({j: d for j, d in ds.items() if d == m})
        else:
            out.append({})
    return out


def make_cluster_data(rng, n_clusters=3, per=5, L=60, noise=4):
    seqs = set()
    for _ in range(n_clusters):
        center = rand_seq(rng, L + rng.randrange(-10, 10))
        for _ in range(per):
            seqs.add(mutate(rng, center, rng.randrange(1, noise)))
    return sorted(seqs)


def test_nearest_neighbors_matches_brute():
    rng = random.Random(0)
    seqs = make_cluster_data(rng)
    converged = [False] * len(seqs)
    eng = PairEngine(batch_pairs=16)
    got = nearest_neighbors(seqs, converged, eng, k0=7)
    want = brute_nn(seqs, converged)
    assert got == want


def test_nearest_neighbors_converged_skipped():
    rng = random.Random(1)
    seqs = make_cluster_data(rng, n_clusters=2, per=4)
    converged = [False] * len(seqs)
    converged[0] = True
    converged[3] = True
    eng = PairEngine(batch_pairs=16)
    got = nearest_neighbors(seqs, converged, eng, k0=7)
    want = brute_nn(seqs, converged)
    assert got == want


def test_nearest_neighbors_isolated():
    # a sequence with nothing within its own length stays isolated
    seqs = ["A" * 10, "C" * 60, "C" * 61]
    eng = PairEngine(batch_pairs=4)
    got = nearest_neighbors(seqs, [False] * 3, eng, k0=3)
    assert got[0] == {}
    assert got[1] == {2: 1}
    assert got[2] == {1: 1}


def test_nearest_neighbors_ties():
    seqs = ["AAAAAAAA", "AAAAAAAT", "AAAAAAAC", "AAAATAAA"]
    eng = PairEngine(batch_pairs=4)
    got = nearest_neighbors(seqs, [False] * 4, eng, k0=3)
    want = brute_nn(seqs, [False] * 4)
    assert got == want
    assert got[0] == {1: 1, 2: 1, 3: 1}


def test_nearest_neighbors_2set_brute():
    rng = random.Random(2)
    targets = {f"c{i}": rand_seq(rng, 50 + i) for i in range(4)}
    queries = {}
    for i in range(12):
        base = targets[f"c{rng.randrange(4)}"]
        queries[f"r{i}"] = mutate(rng, base, rng.randrange(0, 5))
    eng = PairEngine(batch_pairs=16)
    got = nearest_neighbors_2set(queries, targets, eng, k0=7)
    for qa, qs in queries.items():
        ds = {ca: oracle.edit_distance(qs, cs) for ca, cs in targets.items()}
        ds = {ca: d for ca, d in ds.items() if 0 <= d <= len(qs)}
        if ds:
            m = min(ds.values())
            assert got[qa] == {ca: d for ca, d in ds.items() if d == m}, qa
        else:
            assert got[qa] == {}


def test_star_partition_is_partition():
    rng = random.Random(3)
    seqs = make_cluster_data(rng, n_clusters=3, per=6)
    converged = [False] * len(seqs)
    eng = PairEngine(batch_pairs=16)
    nn = nearest_neighbors(seqs, converged, eng, k0=7)
    edges = [(i, j) for i, d in enumerate(nn) for j in d]
    degrees = [1] * len(seqs)
    M, part = star_partition(seqs, degrees, edges)
    # proper partition invariants (partitions.py:590-591)
    all_nodes = set()
    total = 0
    for c, members in part.items():
        assert c not in members
        all_nodes.add(c)
        all_nodes |= members
        total += len(members) + 1
    assert all_nodes == set(range(len(seqs)))
    assert total == len(seqs)
    # weights recorded for centers
    for c, w in M.items():
        if part[c]:
            assert w == sum(degrees[x] for x in part[c] | {c})


def test_star_partition_simple_star():
    # nodes 1..4 all point to 0 => single partition centered at 0
    names = ["n0", "n1", "n2", "n3", "n4"]
    degrees = [1, 1, 1, 1, 1]
    edges = [(1, 0), (2, 0), (3, 0), (4, 0)]
    M, part = star_partition(names, degrees, edges)
    assert set(part) == {0}
    assert part[0] == {1, 2, 3, 4}
    assert M[0] == 5


def test_star_partition_two_cycle_center_by_degree():
    # 0 <-> 1, with 2,3 -> 0: center should be 0 (more direct weight)
    names = ["a", "b", "c", "d"]
    degrees = [1, 1, 1, 1]
    edges = [(0, 1), (1, 0), (2, 0), (3, 0)]
    M, part = star_partition(names, degrees, edges)
    assert set(part) == {0}
    assert part[0] == {1, 2, 3}


def test_greedy_bipartite():
    read_edges = {
        "r1": ["c1", "c2"],
        "r2": ["c1"],
        "r3": ["c2"],
        "r4": ["c2"],
        "r5": [],
    }
    got = greedy_bipartite_assignment(read_edges, ["c1", "c2", "c3"])
    # c2 has 3 reads -> wins first; then c1 keeps r2; c3 empty
    assert got["c2"] == {"r1", "r3", "r4"}
    assert got["c1"] == {"r2"}
    assert got["c3"] == set()

def test_nearest_neighbors_multi_slab(monkeypatch):
    """Tiny slab budget forces many slabs per round: the pair cache must
    carry certified results across slab boundaries (and its log-
    structured runs must merge correctly under interleaved lookups)."""
    import isocon_tpu.graph.nn as nn_mod

    monkeypatch.setattr(nn_mod, "_SLAB_ENTRIES", 8)
    rng = random.Random(5)
    seqs = make_cluster_data(rng, n_clusters=4, per=5)
    converged = [False] * len(seqs)
    eng = PairEngine(batch_pairs=16)
    got = nearest_neighbors(seqs, converged, eng, k0=7)
    want = brute_nn(seqs, converged)
    assert got == want


def test_nearest_neighbors_2set_multi_slab(monkeypatch):
    import isocon_tpu.graph.nn as nn_mod

    monkeypatch.setattr(nn_mod, "_SLAB_ENTRIES", 8)
    rng = random.Random(6)
    targets = {f"c{i}": rand_seq(rng, 50 + i) for i in range(5)}
    queries = {}
    for i in range(15):
        base = targets[f"c{rng.randrange(5)}"]
        queries[f"r{i}"] = mutate(rng, base, rng.randrange(0, 5))
    eng = PairEngine(batch_pairs=16)
    got = nearest_neighbors_2set(queries, targets, eng, k0=7)
    for qa, qs in queries.items():
        ds = {ca: oracle.edit_distance(qs, cs) for ca, cs in targets.items()}
        ds = {ca: d for ca, d in ds.items() if 0 <= d <= len(qs)}
        if ds:
            m = min(ds.values())
            assert got[qa] == {ca: d for ca, d in ds.items() if d == m}, qa
        else:
            assert got[qa] == {}
