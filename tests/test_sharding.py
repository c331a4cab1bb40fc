"""Multi-device sharding: same answers as single-device (SURVEY.md sec 4)."""
import random

import numpy as np
import pytest

import jax

from isocon_tpu.ops.encode import pad_batch
from isocon_tpu.ops.engine import PairEngine
from isocon_tpu.ops import oracle


def rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def mutate(rng, s, k):
    s = list(s)
    for _ in range(k):
        op = rng.choice("SID")
        p = rng.randrange(len(s))
        if op == "S":
            s[p] = rng.choice("ACGT")
        elif op == "I":
            s.insert(p, rng.choice("ACGT"))
        elif len(s) > 1:
            del s[p]
    return "".join(s)


needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_devices
def test_sharded_engine_matches_local():
    from isocon_tpu.parallel.mesh import make_mesh
    from isocon_tpu.parallel.sharding import Sharder

    rng = random.Random(0)
    pairs = []
    for _ in range(24):
        a = rand_seq(rng, rng.randrange(60, 200))
        b = mutate(rng, a, rng.randrange(0, 20))
        pairs.append((a, b))
    local = PairEngine(batch_pairs=16)
    sharded = PairEngine(batch_pairs=16, sharder=Sharder(make_mesh(8)))
    ed1, _ = local.edit_distances(pairs)
    ed2, _ = sharded.edit_distances(pairs)
    assert (ed1 == ed2).all()

    scores = [(2, -2, 2, 0)] * len(pairs)
    a1 = local.align_pairs(pairs, scores)
    a2 = sharded.align_pairs(pairs, scores)
    assert a1 == a2


@needs_devices
def test_2d_blocked_distance_matrix():
    from jax.sharding import Mesh
    from isocon_tpu.parallel.sharding import nn_round_sharded_2d

    rng = random.Random(1)
    seqs = []
    for c in range(4):
        center = rand_seq(rng, 120)
        for _ in range(4):
            seqs.append(mutate(rng, center, rng.randrange(1, 6)))
    seqs = sorted(set(seqs))
    while len(seqs) % 8:
        seqs.append(rand_seq(rng, 120))
    codes, lens = pad_batch(seqs, 256)

    mesh2d = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("rows", "cols"))
    mins = np.asarray(
        nn_round_sharded_2d(mesh2d, codes, lens, Wp=128, L=256)
    )
    for i, s in enumerate(seqs):
        want = min(
            oracle.edit_distance(s, o) for j, o in enumerate(seqs) if j != i
        )
        if want <= 60:  # certified band
            assert mins[i] == want, (i, mins[i], want)
