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


needs_2_devices = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs 2 virtual devices"
)


@needs_2_devices
def test_sharded_pallas_pool_paths():
    """The pooled Pallas fast paths (Myers ED + affine SG) run under a
    shard_map mesh (interpret mode on CPU) and match the local engine."""
    from isocon_tpu.parallel.mesh import make_mesh
    from isocon_tpu.parallel.sharding import Sharder

    rng = random.Random(3)
    pairs = []
    for _ in range(40):
        a = rand_seq(rng, rng.randrange(150, 250))
        b = mutate(rng, a, rng.randrange(0, 12))
        pairs.append((a, b))

    sharded = PairEngine(batch_pairs=128, sharder=Sharder(make_mesh(2)),
                         use_pallas=True, ed_batch=512)
    sharded.pallas_L0 = 256   # keep interpret-mode shapes small
    sharded.batch_pairs = 256
    local = PairEngine(batch_pairs=16)

    ed1, _ = local.edit_distances(pairs)
    ed2, _ = sharded.edit_distances(pairs)
    np.testing.assert_array_equal(ed1, ed2)

    scores = [(2, -2, 2, 0)] * len(pairs)
    a1 = local.align_pairs(pairs, scores)
    a2 = sharded.align_pairs(pairs, scores)
    assert a1 == a2


@needs_2_devices
def test_sharded_pooled_wavefront_hw_and_escalation():
    """HW-mode and band-escalation batches stay on the pooled
    device-resident path under a sharder (pool replicated, index vectors
    sharded): results must match the local engine, with no host-assembled
    [B, L] planes in any sharded ED call."""
    from isocon_tpu.parallel.mesh import make_mesh
    from isocon_tpu.parallel.sharding import Sharder

    rng = random.Random(11)
    pairs = []
    for _ in range(20):
        a = rand_seq(rng, rng.randrange(150, 250))
        b = mutate(rng, a, rng.randrange(0, 12))
        pairs.append((a, b))
    # high-divergence pairs: uncertified at Wp=128, forcing a Wp>=256
    # escalation round through the pooled wavefront
    for _ in range(4):
        a = rand_seq(rng, 200)
        b = mutate(rng, a, 90)
        pairs.append((a, b))

    sharded = PairEngine(batch_pairs=128, sharder=Sharder(make_mesh(2)),
                         use_pallas=True, ed_batch=512)
    sharded.pallas_L0 = 256
    sharded.batch_pairs = 256
    sharded.myers_sub = 0     # disable the Myers path: every NW round must
    local = PairEngine(batch_pairs=16)  # run the pooled wavefront

    ed1, _ = local.edit_distances(pairs)
    ed2, _ = sharded.edit_distances(pairs)
    np.testing.assert_array_equal(ed1, ed2)

    hw1, ej1 = local.edit_distances(pairs, hw_mode=True)
    hw2, ej2 = sharded.edit_distances(pairs, hw_mode=True)
    np.testing.assert_array_equal(hw1, hw2)
    np.testing.assert_array_equal(ej1, ej2)


def test_local_pallas_pool_paths_fused_collect():
    """The non-sharded engine Pallas fast paths (interpret mode on CPU),
    including the single-buffer fused align download, match the oracle
    engine."""
    rng = random.Random(5)
    pairs = []
    for _ in range(24):
        a = rand_seq(rng, rng.randrange(150, 250))
        b = mutate(rng, a, rng.randrange(0, 12))
        pairs.append((a, b))

    fast = PairEngine(batch_pairs=128, use_pallas=True, ed_batch=512,
                      interpret=True)
    fast.native_cpu = False   # force the kernel paths (CPU default is the
    fast.pallas_L0 = 256      # native C++ fast path, which would bypass them)
    fast.batch_pairs = 256
    local = PairEngine(batch_pairs=16)

    ed1, _ = local.edit_distances(pairs)
    ed2, _ = fast.edit_distances(pairs)
    np.testing.assert_array_equal(ed1, ed2)

    scores = [(2, -2, 2, 0)] * len(pairs)
    a1 = local.align_pairs(pairs, scores)
    a2 = fast.align_pairs(pairs, scores)
    assert a1 == a2

    # pooled wavefront path: HW (infix) mode ships pool indices too
    hw1, ej1 = local.edit_distances(pairs, hw_mode=True)
    hw2, ej2 = fast.edit_distances(pairs, hw_mode=True)
    np.testing.assert_array_equal(hw1, hw2)
    np.testing.assert_array_equal(ej1, ej2)


def _noisy_copy(rng, s, error_rate):
    out = []
    for ch in s:
        r = rng.random()
        if r < error_rate * 0.4:
            out.append(rng.choice([c for c in "ACGT" if c != ch]))
        elif r < error_rate * 0.7:
            out.append(ch)
            out.append(rng.choice("ACGT"))
        elif r < error_rate:
            pass
        else:
            out.append(ch)
    return "".join(out)


@needs_devices
def test_sharded_pipeline_matches_local(tmp_path):
    """Full pipeline: --devices 8 must produce final_candidates.fa
    identical to the single-device run (SURVEY.md sec 4: same-answer
    checks 1-chip vs N-device sharded runs)."""
    from isocon_tpu.cli import main as cli_main
    from isocon_tpu.io import read_fasta

    rng = random.Random(7)
    base = "".join(rng.choice("ACGT") for _ in range(260))
    bl = list(base)
    for pos in (30, 130, 230):
        bl[pos] = {"A": "C", "C": "G", "G": "T", "T": "A"}[bl[pos]]
    iso_a, iso_b = base, "".join(bl)
    read_file = str(tmp_path / "reads.fa")
    with open(read_file, "w") as fh:
        for i in range(12):
            fh.write(">ra_%d\n%s\n" % (i, _noisy_copy(rng, iso_a, 0.01)))
        for i in range(12):
            fh.write(">rb_%d\n%s\n" % (i, _noisy_copy(rng, iso_b, 0.01)))

    outputs = {}
    for tag, ndev in (("local", 1), ("sharded", 8)):
        out = str(tmp_path / ("out_" + tag))
        cli_main([
            "pipeline", "-fl_reads", read_file, "-outfolder", out,
            "--batch_pairs", "32", "--devices", str(ndev),
        ])
        cands = sorted(
            (acc.split("_support_")[-1], seq)
            for acc, seq in read_fasta(out + "/final_candidates.fa")
        )
        info = sorted(
            tuple(l.split()) for l in open(out + "/cluster_info.tsv")
            if l.strip()
        )
        outputs[tag] = (cands, info)
    assert outputs["local"] == outputs["sharded"]
    assert {s for _sup, s in outputs["local"][0]} == {iso_a, iso_b}


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
