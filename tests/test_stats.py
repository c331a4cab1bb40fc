"""Statistical test machinery: variants, support, Raghavan bound."""
import math

import pytest

from isocon_tpu.ops import oracle
from isocon_tpu.stats.raghavan import correction_factor, raghavan_upper_pvalue_bound
from isocon_tpu.stats.test import statistical_test
from isocon_tpu.stats.variants import (
    get_empirical_error_probabilities,
    get_support,
    get_variant_coordinates,
)


def test_raghavan_bound_edge_cases():
    probs = {"r%d" % i: 0.01 for i in range(20)}
    assert raghavan_upper_pvalue_bound(probs, []) == 1.0
    # many supporting reads with tiny probabilities -> significant
    p = raghavan_upper_pvalue_bound(probs, ["r0", "r1", "r2", "r3", "r4"])
    assert 0 < p < 1e-4
    # one support out of many at moderate prob -> not significant
    probs2 = {"r%d" % i: 0.2 for i in range(20)}
    p2 = raghavan_upper_pvalue_bound(probs2, ["r0"])
    assert p2 > 0.05


def test_raghavan_monotone_in_support():
    probs = {"r%d" % i: 0.05 for i in range(30)}
    last = 1.1
    for k in (1, 3, 6, 10):
        p = raghavan_upper_pvalue_bound(probs, ["r%d" % i for i in range(k)])
        assert p < last
        last = p


def test_raghavan_fast_path_matches_decimal():
    """Property test (VERDICT item 5): the float64 log-space fast path must
    make the same accept/reject decisions as the prec-100 Decimal
    evaluation on random edges, and agree to high relative accuracy."""
    import random

    from isocon_tpu.stats.raghavan import _decimal_bound

    rng = random.Random(0)
    for trial in range(300):
        n = rng.randrange(2, 60)
        probs = {
            "r%d" % i: 10 ** rng.uniform(-8, -0.05) for i in range(n)
        }
        k = rng.randrange(0, n + 1)
        supp = ["r%d" % i for i in range(k)]
        p_fast = raghavan_upper_pvalue_bound(probs, supp)
        # recompute the Decimal answer on the same m/y
        import math as _m

        lp = {a: -_m.log10(p) for a, p in probs.items()}
        mx = max(lp.values())
        w = {a: v / mx for a, v in lp.items()}
        m = sum(w[a] * probs[a] for a in probs)
        y = sum(w[a] for a in supp)
        if y == 0:
            assert p_fast == 1.0
            continue
        if y == m:
            assert p_fast == 0.5
            continue
        p_dec = _decimal_bound(m, y)
        if p_dec == 0.0 or p_fast == 0.0:
            assert p_dec == p_fast == 0.0, (trial, p_fast, p_dec)
        else:
            assert abs(_m.log10(p_fast) - _m.log10(p_dec)) < 1e-6, (
                trial, p_fast, p_dec,
            )
        # decision equality at a few thresholds
        for thr in (0.01, 1e-5, 0.3):
            assert (p_fast < thr) == (p_dec < thr) or (
                abs(_m.log10(max(p_fast, 1e-320)) - _m.log10(thr)) < 1e-6
            )


def test_raghavan_near_threshold_uses_decimal():
    """Within 10x of the threshold the Decimal path re-evaluates."""
    probs = {"r%d" % i: 0.2 for i in range(20)}
    supp = ["r0", "r1", "r2"]
    p_plain = raghavan_upper_pvalue_bound(probs, supp)
    p_thr = raghavan_upper_pvalue_bound(probs, supp, threshold=p_plain,
                                        factor=1.0)
    # both paths agree (fast vs Decimal) -- exercises the fallback branch
    assert p_plain > 0
    assert abs(math.log10(p_thr) - math.log10(p_plain)) < 1e-9


def test_correction_factor():
    # one substitution on a length-10 reference
    delta = {3: ("S", "A", 1)}
    assert correction_factor(10, delta) == math.comb(30, 1)
    delta = {3: ("I", "A", 1)}
    assert correction_factor(10, delta) == 4 * 11
    delta = {3: ("D", "-", 2)}
    assert correction_factor(10, delta) == math.comb(10, 1)


def _align(a, b):
    return oracle.align_semi_global(a, b, 2, -3, 3, 1)


def test_variant_coordinates_substitution():
    t = "ACGTACGTAC"
    c = "ACGTCCGTAC"  # S at pos 4
    a_t, a_c, _ = _align(t, c)
    variants = [(i, pt, pc) for i, (pt, pc) in enumerate(zip(a_t, a_c)) if pt != pc]
    vt, vc, c2t, t2c = get_variant_coordinates(t, c, a_t, a_c, variants)
    assert vt == {4: ("S", "C", 1)}
    assert vc == {4: ("S", "C", 1)}


def test_variant_coordinates_homopolymer_deletion():
    t = "ACGGGGTA"
    c = "ACGGGTA"  # deletion in a 4-G homopolymer
    a_t, a_c, _ = _align(t, c)
    variants = [(i, pt, pc) for i, (pt, pc) in enumerate(zip(a_t, a_c)) if pt != pc]
    vt, vc, c2t, t2c = get_variant_coordinates(t, c, a_t, a_c, variants)
    (pos, (typ, ch, u_v)), = vt.items()
    assert typ == "D"
    assert u_v == 4  # homopolymer invariant length

def test_support_counts_exact_matchers():
    t = "ACGTACGTACGTACGT"
    c = "ACGTACCTACGTACGT"  # S at pos 6 (G->C)
    a_t, a_c, _ = _align(t, c)
    variants = [(i, pt, pc) for i, (pt, pc) in enumerate(zip(a_t, a_c)) if pt != pc]
    vt, vc, c2t, t2c = get_variant_coordinates(t, c, a_t, a_c, variants)
    # read matching c exactly supports; read matching t does not
    r_c = c
    r_t = t
    aln_c_rc = oracle.align_semi_global(c, r_c, 2, -2, 2, 0)
    aln_c_rt = oracle.align_semi_global(c, r_t, 2, -2, 2, 0)
    aln_t_rt = oracle.align_semi_global(t, r_t, 2, -2, 2, 0)
    reads_to_c = {"rc": (aln_c_rc[0], aln_c_rc[1], aln_c_rc[2]),
                  "rt_misassigned": (aln_c_rt[0], aln_c_rt[1], aln_c_rt[2])}
    reads_to_t = {"rt": (aln_t_rt[0], aln_t_rt[1], aln_t_rt[2])}
    supp = get_support(reads_to_c, vc, reads_to_t, vt, c2t)
    assert "rc" in supp
    assert "rt" not in supp and "rt_misassigned" not in supp


def test_empirical_probabilities():
    errors = {"r1": (2, 1, 3), "r2": (0, 0, 0)}
    vt = {4: ("S", "C", 1)}
    probs = get_empirical_error_probabilities(100, errors, vt)
    assert probs["r1"] == (3 / 100.0) / 3.0
    # floor: max(subs, delta)=1
    assert probs["r2"] == (1 / 100.0) / 3.0


def test_statistical_test_separates_true_variant():
    """A candidate with strong read support at its variants gets a tiny
    p-value; one with no support gets p ~ 1."""
    t = "ACGTACGTACGTACGTACGTACGTACGT"
    bl = list(t)
    bl[10] = "A" if bl[10] != "A" else "C"
    c = "".join(bl)
    a_t, a_c, _ = _align(t, c)
    aln_tc = (a_t, a_c)
    b_c, b_t, _ = _align(c, t)
    aln_ct = (b_c, b_t)

    def read_aln(ref, read):
        r = oracle.align_semi_global(ref, read, 2, -2, 2, 0)
        return (r[0], r[1], r[2])

    reads_to_c = {"s%d" % i: read_aln(c, c) for i in range(8)}
    reads_to_t = {"n%d" % i: read_aln(t, t) for i in range(8)}
    out = statistical_test("c", "t", c, t, reads_to_c, reads_to_t,
                           aln_tc, aln_ct, {}, 43)
    c_acc, t_acc, p_value, factor, k, N_t, var_types = out
    assert k == 8            # the 8 c-reads support the variant
    assert N_t == 16
    assert p_value < 1e-8
    assert var_types.startswith("(S,")

    # now: nobody supports the variant
    reads_to_c2 = {"m%d" % i: read_aln(c, t) for i in range(8)}
    out2 = statistical_test("c", "t", c, t, reads_to_c2, reads_to_t,
                            aln_tc, aln_ct, {}, 43)
    assert out2[4] == 0      # no support
    assert out2[2] == 1.0    # p-value 1.0


def test_read_errors_batch_matches_scalar():
    """The batched padded-matrix error counter must agree with the
    per-pair implementation on ragged, end-gapped alignments."""
    import random

    from isocon_tpu.alnutils import (read_errors_batch,
                                     read_errors_from_alignment)

    rng = random.Random(3)
    pairs = []
    for _ in range(60):
        L = rng.randrange(1, 120)
        a = []
        b = []
        for _k in range(L):
            r = rng.random()
            if r < 0.12:
                a.append("-")
                b.append(rng.choice("ACGT"))
            elif r < 0.24:
                a.append(rng.choice("ACGT"))
                b.append("-")
            elif r < 0.4:
                a.append(rng.choice("ACGT"))
                b.append(rng.choice("ACGT"))
            else:
                c = rng.choice("ACGT")
                a.append(c)
                b.append(c)
        # end gap runs on either side
        lg, rg = rng.randrange(0, 5), rng.randrange(0, 5)
        a = ["-"] * lg + a + [rng.choice("ACGT")] * rg
        b = [rng.choice("ACGT")] * lg + b + ["-"] * rg
        pairs.append(("".join(a), "".join(b)))
    pairs.append(("----", "ACGT"))
    pairs.append(("ACGT", "----"))
    want = [read_errors_from_alignment(a, b) for a, b in pairs]
    got = read_errors_batch(pairs)
    assert got == want
