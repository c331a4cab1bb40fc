"""Index-based engine API: parity with the string API and the oracle.

The index surface (``add_seqs`` + ``edit_distances_idx`` /
``align_pairs_idx``) must be decision-identical to the string API -- it
is the same machinery with batch assembly turned into rowmap gathers.
"""
import numpy as np
import pytest

from isocon_tpu.ops import oracle
from isocon_tpu.ops.engine import PairEngine


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    alpha = "ACGT"
    seqs = []
    for _ in range(48):
        L = int(rng.integers(40, 400))
        seqs.append("".join(alpha[c] for c in rng.integers(0, 4, L)))
    # include a duplicate and a mutated near-pair
    seqs.append(seqs[0])
    t = list(seqs[1])
    t[5] = "A" if t[5] != "A" else "C"
    seqs.append("".join(t))
    ia = rng.integers(0, len(seqs), 120)
    ib = rng.integers(0, len(seqs), 120)
    return seqs, ia, ib


def test_add_seqs_dedups(data):
    seqs, _, _ = data
    eng = PairEngine(batch_pairs=64)
    ids = eng.add_seqs(seqs)
    assert ids[len(seqs) - 2] == ids[0]  # duplicate string -> same id
    ids2 = eng.add_seqs(seqs[:3])
    assert (ids2 == ids[:3]).all()
    assert (eng.table_lens(ids) == np.array([len(s) for s in seqs])).all()


@pytest.mark.parametrize("native", [True, False])
def test_edit_distances_idx_matches_oracle(data, native, monkeypatch):
    seqs, ia, ib = data
    if not native:
        monkeypatch.setenv("ISOCON_NO_NATIVE", "1")
    eng = PairEngine(batch_pairs=64)
    ids = eng.add_seqs(seqs)
    eds, _ = eng.edit_distances_idx(ids[ia], ids[ib])
    want = np.array(
        [oracle.edit_distance(seqs[a], seqs[b]) for a, b in zip(ia, ib)])
    assert (eds == want).all()


def test_edit_distances_idx_k_cap(data):
    seqs, ia, ib = data
    eng = PairEngine(batch_pairs=64)
    ids = eng.add_seqs(seqs)
    rng = np.random.default_rng(3)
    caps = rng.integers(0, 200, len(ia))
    eds, _ = eng.edit_distances_idx(ids[ia], ids[ib], k_cap=caps)
    want = np.array(
        [oracle.edit_distance(seqs[a], seqs[b]) for a, b in zip(ia, ib)])
    want = np.where(want <= caps, want, -1)
    assert (eds == want).all()


def test_hw_mode_idx_matches_string(data):
    seqs, ia, ib = data
    eng = PairEngine(batch_pairs=64)
    ids = eng.add_seqs(seqs)
    h_idx, e_idx = eng.edit_distances_idx(ids[ia[:30]], ids[ib[:30]],
                                          hw_mode=True)
    pairs = [(seqs[a], seqs[b]) for a, b in zip(ia[:30], ib[:30])]
    h_str, e_str = eng.edit_distances(pairs, hw_mode=True)
    assert (h_idx == h_str).all()
    assert (e_idx == e_str).all()


@pytest.mark.parametrize("native", [True, False])
def test_align_pairs_idx_matches_string(data, native, monkeypatch):
    seqs, ia, ib = data
    if not native:
        monkeypatch.setenv("ISOCON_NO_NATIVE", "1")
    eng = PairEngine(batch_pairs=64)
    ids = eng.add_seqs(seqs)
    scores = [(2, -2, 2, 0)] * 25
    al_idx = eng.align_pairs_idx(ids[ia[:25]], ids[ib[:25]], scores)
    pairs = [(seqs[a], seqs[b]) for a, b in zip(ia[:25], ib[:25])]
    al_str = eng.align_pairs(pairs, scores)
    assert al_idx == al_str
    for (a, b), (a1, a2, _st) in zip(pairs, al_idx):
        assert a1.replace("-", "") == a
        assert a2.replace("-", "") == b


def test_align_pairs_idx_ed_hint(data):
    seqs, ia, ib = data
    eng = PairEngine(batch_pairs=64)
    ids = eng.add_seqs(seqs)
    eds, _ = eng.edit_distances_idx(ids[ia[:20]], ids[ib[:20]])
    scores = [(2, -2, 2, 0)] * 20
    al_h = eng.align_pairs_idx(ids[ia[:20]], ids[ib[:20]], scores,
                               ed_hint=[int(d) for d in eds])
    al_n = eng.align_pairs_idx(ids[ia[:20]], ids[ib[:20]], scores)
    assert al_h == al_n


def test_empty_and_self_pairs():
    eng = PairEngine(batch_pairs=64)
    ids = eng.add_seqs(["", "ACGT", "ACGT" * 30])
    eds, ej = eng.edit_distances_idx(ids[[0, 1, 2, 1]], ids[[1, 0, 2, 1]])
    assert list(eds) == [4, 4, 0, 0]
    eds2, _ = eng.edit_distances_idx(ids[[0]], ids[[1]], k_cap=[3])
    assert eds2[0] == -1


def test_pair_cache_runs_match_flat():
    from isocon_tpu.graph.nn import _PairCache

    rng = np.random.default_rng(11)
    ref = {}
    cache = _PairCache()
    for _round in range(25):
        keys = np.unique(rng.integers(0, 100000, rng.integers(1, 400)))
        have, _ = cache.lookup(keys)
        fresh = keys[~have]
        vals = rng.integers(0, 1000, fresh.size)
        for k, v in zip(fresh.tolist(), vals.tolist()):
            ref[k] = v
        cache.insert(fresh, vals)
        probe = np.unique(rng.integers(0, 100000, 500))
        pres, got = cache.lookup(probe)
        for k, p, g in zip(probe.tolist(), pres.tolist(), got.tolist()):
            assert p == (k in ref)
            if p:
                assert g == ref[k]
    # geometric merging keeps the run count logarithmic
    assert len(cache.runs) <= 20
    # compacting view agrees with the reference dict
    ks = cache.keys
    vs = cache.vals
    assert dict(zip(ks.tolist(), vs.tolist())) == ref


def test_kernel_retry_transient(monkeypatch):
    monkeypatch.setattr(PairEngine, "_RETRY_DELAYS", (0.01,))
    calls = {"n": 0}

    def flaky(x):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("INTERNAL: remote_compile: HTTP 500")
        return x + 1

    assert PairEngine._kernel_retry(flaky, 41) == 42
    assert calls["n"] == 2


def test_kernel_retry_nontransient_raises(monkeypatch):
    monkeypatch.setattr(PairEngine, "_RETRY_DELAYS", (0.01,))

    def broken(_x):
        raise ValueError("band escalation failed")

    with pytest.raises(ValueError):
        PairEngine._kernel_retry(broken, 0)


def test_kernel_retry_persistent_raises(monkeypatch):
    monkeypatch.setattr(PairEngine, "_RETRY_DELAYS", (0.01, 0.01))
    calls = {"n": 0}

    def always(_x):
        calls["n"] += 1
        raise RuntimeError("INTERNAL: remote_compile down")

    with pytest.raises(RuntimeError):
        PairEngine._kernel_retry(always, 0)
    assert calls["n"] == 3


def test_reserve_pool_rows():
    eng = PairEngine(batch_pairs=64)
    eng.reserve_pool_rows(8000)       # below the 16384 ladder: ignored
    assert eng._pool_reserve == 0
    eng.reserve_pool_rows(40000)
    pool = eng._get_pool(256)
    assert pool.min_rows == 40000
    # the device R ladder starts at the reserved step (4096 * 4^k)
    R = 4096
    while R < pool.min_rows:
        R *= 4
    assert R == 65536
    # reservation also lifts pools that already exist
    eng2 = PairEngine(batch_pairs=64)
    p0 = eng2._get_pool(256)
    assert p0.min_rows == 0
    eng2.reserve_pool_rows(40000)
    assert p0.min_rows == 40000
