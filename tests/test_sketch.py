"""Approximate sketch-retrieval NN graph (the minimap-equivalent path)."""
import random

from isocon_tpu.graph.sketch import approximate_matches, approximate_nn_graph
from isocon_tpu.ops.engine import PairEngine


def rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def mutate(rng, s, n_ops):
    s = list(s)
    for _ in range(n_ops):
        op = rng.choice("SID")
        pos = rng.randrange(len(s))
        if op == "S":
            s[pos] = rng.choice("ACGT")
        elif op == "I":
            s.insert(pos, rng.choice("ACGT"))
        elif len(s) > 1:
            del s[pos]
    return "".join(s)


def test_sketch_retrieves_true_neighbors():
    rng = random.Random(0)
    clusters = []
    seqs = []
    for c in range(4):
        center = rand_seq(rng, 300)
        for _ in range(4):
            seqs.append(mutate(rng, center, rng.randrange(1, 5)))
            clusters.append(c)
    cands = approximate_matches(seqs, topn=5)
    # every sequence's top-5 sketch candidates include a same-cluster member
    for i, cl in enumerate(cands):
        assert any(clusters[j] == clusters[i] for j in cl), i


def test_approximate_nn_graph_matches_exact_minimum():
    rng = random.Random(1)
    center_a = rand_seq(rng, 200)
    center_b = rand_seq(rng, 210)
    seqs = sorted(
        {mutate(rng, center_a, rng.randrange(1, 4)) for _ in range(5)}
        | {mutate(rng, center_b, rng.randrange(1, 4)) for _ in range(5)}
    )
    eng = PairEngine(batch_pairs=16)
    conv = [False] * len(seqs)
    nn = approximate_nn_graph(seqs, conv, eng, topn=6)
    from isocon_tpu.ops import oracle

    for i, ds in enumerate(nn):
        assert ds, "every read should find an approximate neighbor"
        # the approximate minimum is the true global minimum here (top-6
        # covers the whole cluster)
        true_min = min(
            oracle.edit_distance(seqs[i], seqs[j])
            for j in range(len(seqs)) if j != i
        )
        assert min(ds.values()) == true_min, i
