"""End-invariant collapse + ends-ignored NN graph."""
import random

from isocon_tpu.graph.end_invariant import (
    collapse_candidates_under_ends_invariant,
    ends_ignored_nn_graph,
    invariant_edges,
    is_overlap,
)
from isocon_tpu.ops.engine import PairEngine


def rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def test_is_overlap():
    # suffix of text1 == prefix of text2 with small flanks
    assert is_overlap("AAACGT", "ACGTTT", 3)       # overlap ACGT, flanks 2/2
    assert not is_overlap("AAACGT", "ACGTTT", 1)   # flanks 2 > 1
    assert is_overlap("ACGT", "ACGT", 0)           # identical


def test_invariant_edges_substring():
    rng = random.Random(0)
    core = rand_seq(rng, 80)
    cands = {
        "c_full": "AAA" + core + "TT",   # core with 3+2 end bases
        "c_core": core,
        "c_other": rand_seq(rng, 80),
    }
    edges = invariant_edges(cands, threshold=5)
    assert ("c_core", "c_full") in edges and ("c_full", "c_core") in edges
    assert not any("c_other" in e for e in edges)


def test_collapse_keeps_highest_support():
    rng = random.Random(1)
    core = rand_seq(rng, 100)
    cands = {"big": "AA" + core, "small": core}
    support = {"big": 10, "small": 2}
    part = collapse_candidates_under_ends_invariant(cands, support, 15)
    assert set(part) == {"big"}
    assert part["big"] == {"small"}


def test_collapse_unrelated_stay():
    rng = random.Random(2)
    cands = {"a": rand_seq(rng, 90), "b": rand_seq(rng, 91)}
    part = collapse_candidates_under_ends_invariant(cands, {"a": 3, "b": 3}, 15)
    assert set(part) == {"a", "b"}
    assert part["a"] == set() and part["b"] == set()


def test_ends_ignored_nn_graph():
    rng = random.Random(3)
    base = rand_seq(rng, 200)
    # c2 = c1 with 2 SNVs; c3 = c1 shifted ends (5bp trimmed); c4 unrelated
    bl = list(base)
    bl[50] = {"A": "C", "C": "G", "G": "T", "T": "A"}[bl[50]]
    bl[120] = {"A": "C", "C": "G", "G": "T", "T": "A"}[bl[120]]
    c2 = "".join(bl)
    c3 = base[5:-4]
    cands = {"c1": base, "c2": c2, "c3": c3, "c4": rand_seq(rng, 200)}
    eng = PairEngine(batch_pairs=16)
    g = ends_ignored_nn_graph(cands, ignore_ends_len=15, engine=eng)
    assert g["c1"]["c2"] == 2
    assert g["c2"]["c1"] == 2
    assert g["c1"]["c3"] == 0      # pure end difference -> distance 0
    assert "c4" not in g["c1"] and g["c4"] == {}


def test_ends_ignored_graph_engine_matches_oracle():
    """The batched HW prefilter must not change the resulting graph."""
    rng = random.Random(9)
    cands = {}
    base = rand_seq(rng, 150)
    cands["a"] = base
    bl = list(base); bl[70] = {"A": "C", "C": "G", "G": "T", "T": "A"}[bl[70]]
    cands["b"] = "".join(bl)
    cands["c"] = base[4:-3]
    cands["d"] = rand_seq(rng, 150)
    eng = PairEngine(batch_pairs=16)
    with_engine = ends_ignored_nn_graph(cands, 15, engine=eng)
    without = ends_ignored_nn_graph(cands, 15, engine=None)
    assert with_engine == without
