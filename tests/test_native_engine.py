"""The native C++ CPU fast path must be bit-identical to the kernel path.

The engine dispatches to native/{myers_ed,affine_sg,traceback}.cc when the
backend is CPU; ISOCON_NO_NATIVE=1 forces the lax.scan kernels.  Both must
produce the same distances, endpoints and aligned strings (both are
pinned to the numpy oracle independently -- this test closes the
triangle at the engine level, band escalation included).
"""
import random

import numpy as np
import pytest

from isocon_tpu.native import native_available
from isocon_tpu.ops import oracle
from isocon_tpu.ops.engine import PairEngine

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain"
)


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


@pytest.fixture(scope="module")
def pair_set():
    rng = random.Random(3)
    pairs = []
    for _ in range(30):
        a = rand_seq(rng, rng.randrange(50, 300))
        b = mutate(rng, a, rng.randrange(0, 25))
        pairs.append((a, b))
    # unrelated pair (huge distance) and identical pair
    pairs.append((rand_seq(rng, 120), rand_seq(rng, 150)))
    pairs.append((pairs[0][0], pairs[0][0]))
    return pairs


def kernel_engine():
    import os

    os.environ["ISOCON_NO_NATIVE"] = "1"
    try:
        eng = PairEngine(batch_pairs=16)
    finally:
        del os.environ["ISOCON_NO_NATIVE"]
    assert not eng.native_cpu
    return eng


def test_native_ed_matches_kernels_and_oracle(pair_set):
    nat = PairEngine(batch_pairs=16)
    assert nat.native_cpu
    ker = kernel_engine()
    ed_n, ej_n = nat.edit_distances(pair_set)
    ed_k, ej_k = ker.edit_distances(pair_set)
    assert (ed_n == ed_k).all()
    assert (ej_n == ej_k).all()
    for (a, b), d in zip(pair_set, ed_n):
        assert d == oracle.edit_distance(a, b)


def test_native_ed_k_cap(pair_set):
    nat = PairEngine(batch_pairs=16)
    caps = [5] * len(pair_set)
    ed, _ = nat.edit_distances(pair_set, k_cap=caps)
    for (a, b), d in zip(pair_set, ed):
        true = oracle.edit_distance(a, b)
        assert d == (true if true <= 5 else -1)


def test_native_hw_matches_kernels(pair_set):
    nat = PairEngine(batch_pairs=16)
    ker = kernel_engine()
    caps = [30] * len(pair_set)
    ed_n, ej_n = nat.edit_distances(pair_set, k_cap=caps, hw_mode=True)
    ed_k, ej_k = ker.edit_distances(pair_set, k_cap=caps, hw_mode=True)
    assert (ed_n == ed_k).all()
    # end_j only meaningful where a distance was reported
    assert (ej_n[ed_n >= 0] == ej_k[ed_n >= 0]).all()


def test_native_align_matches_kernels(pair_set):
    nat = PairEngine(batch_pairs=16)
    ker = kernel_engine()
    schedules = [(2, -2, 2, 0), (2, -3, 3, 1), (2, -4, 2, 0)]
    scores = [schedules[i % 3] for i in range(len(pair_set))]
    a_n = nat.align_pairs(pair_set, scores)
    a_k = ker.align_pairs(pair_set, scores)
    assert a_n == a_k
    # spot-check the triple against the oracle
    for (a, b), (ma, mi, go, ge), got in list(zip(pair_set, scores, a_n))[:8]:
        assert got == oracle.align_semi_global(a, b, ma, mi, go, ge)


def test_small_round_native_fallback(monkeypatch):
    """Accelerator engines route tiny ED rounds (<=256 HW / <=64 NW) to
    _ed_native instead of paying a device round-trip (engine.py
    edit_distances); results must match the oracle and the device path
    must never be entered."""
    rng = random.Random(23)
    pairs = []
    for _ in range(5):
        b = "".join(rng.choice("ACGT") for _ in range(400))
        a = b[30:370]  # infix with clean HW distance 0
        al = list(a)
        for p in rng.sample(range(len(al)), 4):
            al[p] = rng.choice([c for c in "ACGT" if c != al[p]])
        pairs.append(("".join(al), b))

    eng = PairEngine(batch_pairs=128, use_pallas=True, ed_batch=512,
                     interpret=True)
    eng.pallas_L0 = 512
    eng.native_cpu = False  # force past the CPU-backend early return

    def boom(*a, **kw):
        raise AssertionError("device path entered for a tiny round")

    monkeypatch.setattr(eng, "_launch_batch", boom)
    eds, ejs = eng.edit_distances(pairs, hw_mode=True)
    for (a, b), d, ej in zip(pairs, eds, ejs):
        want, _s0, e0, _ops = oracle.edit_distance_hw(a, b)
        assert d == want, (d, want)
        assert ej == e0 + 1


def test_pool_nibble_pack_roundtrip():
    from isocon_tpu.ops.engine import _pack_nibbles, _pool_full_put

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 8, 4096).astype(np.int8)
    packed = _pack_nibbles(arr)
    assert packed.nbytes == arr.nbytes // 2
    out = np.asarray(_pool_full_put(arr))
    np.testing.assert_array_equal(out, arr)


def test_myers_sub_floor():
    """Mosaic requires (32p+s)*sub sublane slice starts provably 8-aligned:
    sub < 8 fails to compile (hit at Lb=8192 with 5.5 kb reads).  The
    sizing rule must never emit 1 <= sub < 8; myers_sub < 8 must disable
    the path via the sub_L <= myers_sub gate."""
    for Lb in (2048, 4096, 8192, 16384, 32768):
        s = PairEngine.myers_sub_for(Lb, 16)
        assert s >= 8, (Lb, s)
        assert s <= 16
    assert PairEngine.myers_sub_for(2048, 16) == 16
    assert PairEngine.myers_sub_for(8192, 16) == 8
    # myers_sub < 8 (odd ed_batch configs): result exceeds myers_sub, so
    # the gate rejects the Myers path instead of compiling sub<8
    assert PairEngine.myers_sub_for(2048, 4) > 4


def test_ed_wavefront_tail_shrink():
    """Mid-size wavefront ED rounds drop to the smallest power-of-two
    batch shape >= the chunk (floor 512) instead of padding to the 8192
    full-batch target (advisor r3: 4x dummy grid blocks + 4x download)."""
    import random

    from isocon_tpu.ops.engine import PairEngine

    rng = random.Random(41)

    def rs(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    eng = PairEngine(batch_pairs=128, use_pallas=True, ed_batch=65536,
                     interpret=False)
    eng.pallas_L0 = 256
    eng.batch_pairs = 8192  # accelerator full-batch target
    pairs = [(rs(180), rs(180)) for _ in range(300)]
    # Wp=2048 is outside the Myers window map -> pooled wavefront path
    handle = eng._launch_batch(pairs, list(range(300)), 256, 2048,
                               hw_mode=False)
    (kind, _small), B, _ed, _ej, qlen, _tlen = handle
    assert kind == "wave"
    assert B == 300
    assert qlen.shape[0] == 512, qlen.shape  # not 8192
