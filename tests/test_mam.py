"""MAM construction vs the reference's embedded test vectors
(functions.py:803-892, reconstructed) plus correction behavior tests."""
import random

from isocon_tpu.correct.mam import (
    create_multialignment_format,
    create_multialignment_matrix,
    create_position_frequency_matrix,
    position_query_to_alignment,
)
from isocon_tpu.correct.consensus import correct_strings, correct_to_consensus
from isocon_tpu.ops import oracle


def test_positioning_reference_vectors():
    # functions.py:803-832
    cases = [
        (("ACGGA", "ACGGA", 0),
         (["-", "A", "-", "C", "-", "G", "-", "G", "-", "A", "-"], 0, 10)),
        (("TACGGA", "-ACGGA", 0),
         (["T", "A", "-", "C", "-", "G", "-", "G", "-", "A", "-"], 0, 10)),
        (("ACGGATTT", "ACGGA---", 0),
         (["-", "A", "-", "C", "-", "G", "-", "G", "-", "A", "TTT"], 0, 10)),
        (("ACG", "ACG", 0),
         (["-", "A", "-", "C", "-", "G", "-"], 0, 6)),
        (("GGA", "GGA", 2),
         (["-", "G", "-", "G", "-", "A", "-"], 4, 10)),
        (("ACGGCC-", "ACGG--A", 0),
         (["-", "A", "-", "C", "-", "G", "-", "G", "CC", "-", "-"], 0, 10)),
        (("ACGGCC", "ACGG--", 0),
         (["-", "A", "-", "C", "-", "G", "-", "G", "CC"], 0, 8)),
        (("AC-GA", "ACGGA", 0),
         (["-", "A", "-", "C", "-", "-", "-", "G", "-", "A", "-"], 0, 10)),
    ]
    for (q, t, t_start), want in cases:
        assert position_query_to_alignment(q, t, t_start) == tuple(want)


POSITIONED = {
    "q1": (["-", "A", "-", "C", "-", "G", "ACCG", "G", "-", "A", "TTT"], 0, 10),
    "q2": (["-", "A", "-", "C", "-", "G", "AG", "G", "-", "A", "TTT"], 0, 10),
    "q3": (["-", "A", "-", "C", "-", "G", "A", "G", "-", "A", "TTT"], 0, 10),
    "q4": (["-", "A", "-", "C", "-", "G", "CC", "G", "-", "A", "-"], 0, 10),
    "q5": (["-", "A", "-", "C", "-", "G", "-", "G", "-", "A", "T"], 0, 10),
    "q6": (["G", "A", "-", "C", "-", "G", "C", "G", "-", "A", "-"], 0, 10),
}


# NOTE: the reference's embedded vectors (functions.py:849-892) test the
# DELETED create_multialignment_format (no '-' wrapping of max insertions) --
# SURVEY.md section 4 flags them as stale.  These vectors encode the LIVE
# create_multialignment_format_NEW semantics (functions.py:727-767): max
# insertions wrapped as "-"+ins+"-", shorter insertions placed by substring
# match / deletion-free threading / left-shift.  Row placements spot-verified
# by hand against that code path.


def test_alignment_matrix_full_region():
    want = {
        "q1": list("-A-C-G-ACCG-G-A-TTT-"),
        "q2": list("-A-C-G-A--G-G-A-TTT-"),
        "q3": list("-A-C-G-A----G-A-TTT-"),
        "q4": list("-A-C-G--CC--G-A-----"),
        "q5": list("-A-C-G------G-A-T---"),
        "q6": list("GA-C-G--C---G-A-----"),
    }
    got = create_multialignment_format(POSITIONED, 0, 10)
    assert got == want


def test_alignment_matrix_subregion():
    want = {
        "q1": list("C-G-ACCG-G"),
        "q2": list("C-G-A--G-G"),
        "q3": list("C-G-A----G"),
        "q4": list("C-G--CC--G"),
        "q5": list("C-G------G"),
        "q6": list("C-G--C---G"),
    }
    got = create_multialignment_format(POSITIONED, 3, 7)
    assert got == want


def test_alignment_matrix_partial_coverage():
    # rows not covering [start, stop] are dropped (functions.py:703-708)
    positioned = {
        "q1": (["-", "A", "-", "C", "-", "G", "ACCG", "G", "-", "A", "TTT"], 0, 10),
        "q2": (["-", "A", "-", "C", "-", "G", "AG", "G", "-", "A", "TTT"], 3, 13),
        "q3": (["-", "A", "-", "C", "-", "G", "A", "G", "-", "A", "TTT"], -2, 8),
        "q4": (["-", "A", "-", "C", "-", "G", "CC", "G", "A", "A", "-"], 0, 10),
        "q5": (["-", "A", "-", "C", "-", "G", "-", "G", "-", "A", "T"], 20, 30),
        "q6": (["G", "A", "-", "C", "-", "G", "C", "G", "-", "A", "-"], 0, 10),
    }
    want = {
        "q1": list("-C-G-ACCG-G-----"),
        "q3": list("-GAG------A-TTT-"),
        "q4": list("-C-G--CC--G----A"),
        "q6": list("-C-G--C---G-----"),
    }
    got = create_multialignment_format(positioned, 2, 8)
    assert got == want


def _make_partition(center, members):
    """Build {seq: (ed, m_aln, s_aln, degree)} via oracle alignments."""
    part = {center: (0, center, center, 1)}
    for s, deg in members:
        a1, a2, (mat, mis, ind) = oracle.align_semi_global(center, s, 2, -2, 2, 0)
        part[s] = (mis + ind, a1, a2, deg)
    return part


def test_mam_roundtrip_property():
    """Every row of the MAM strips back to its own sequence
    (the reference asserts this at correction_module.py:273-275)."""
    rng = random.Random(0)
    center = "".join(rng.choice("ACGT") for _ in range(60))
    members = []
    for _ in range(5):
        s = list(center)
        for _ in range(rng.randrange(1, 4)):
            p = rng.randrange(len(s))
            op = rng.choice("SID")
            if op == "S":
                s[p] = rng.choice("ACGT")
            elif op == "I":
                s.insert(p, rng.choice("ACGT"))
            else:
                del s[p]
        members.append(("".join(s), 1))
    part = _make_partition(center, members)
    mam = create_multialignment_matrix(center, part)
    for s in part:
        assert "".join(c for c in mam[s] if c != "-") == s


def test_correction_moves_member_toward_majority():
    # center supported by 3 identical copies; one member has 2 substitutions
    center = "ACGTACGTACGTACGTACGT"
    bad = "ACGTACTTACGTACGAACGT"  # subs at pos 6 and 15
    part = _make_partition(center, [(bad, 1)])
    part[center] = (0, center, center, 3)
    corrected = correct_to_consensus(center, part, {bad: ["r_bad"]}, 1)
    # ceil(2 * 0.5) = 1 position corrected; freq ties extend to both
    assert "r_bad" in corrected
    got = corrected["r_bad"]
    assert got == center  # both positions have equal minority freq -> both fixed


def test_correction_skips_converged_and_small():
    center = "ACGTACGTAC"
    part = {center: (0, center, center, 2)}
    assert correct_to_consensus(center, part, {center: ["a", "b"]}, 1) == {}
    # N_t <= 2: no correction
    other = "ACGTACTTAC"
    part2 = _make_partition(center, [(other, 1)])
    assert correct_to_consensus(center, part2, {other: ["x"]}, 1) == {}


def test_correct_strings_wrapper():
    center = "ACGTACGTACGTACGTACGT"
    bad = "ACGTACTTACGTACGTACGT"
    part = _make_partition(center, [(bad, 1)])
    part[center] = (0, center, center, 3)
    got, got_qual = correct_strings({center: part}, {center: ["c1"], bad: ["r1"]}, 1)
    assert got == {"r1": center}
    assert got_qual == {}


def test_correct_strings_quality_variant():
    """correct_to_consensus_ccs_qual fixes the low-quality minority base
    (correction_module.py:161-256)."""
    from isocon_tpu.io.ccs import CCS

    center = "ACGTACGTACGTACGTACGT"
    bad = "ACGTACTTACGTACGTACGT"  # sub at pos 6 (G->T)
    part = _make_partition(center, [(bad, 1)])
    part[center] = (0, center, center, 3)
    ccs = {
        "c1": CCS("c1", center, [40] * len(center), 10),
        "c2": CCS("c2", center, [40] * len(center), 10),
        "c3": CCS("c3", center, [40] * len(center), 10),
        "r1": CCS("r1", bad, [40] * 6 + [5] + [40] * 13, 10),
    }
    got, got_qual = correct_strings(
        {center: part}, {center: ["c1", "c2", "c3"], bad: ["r1"]}, 1,
        ccs_dict=ccs,
    )
    assert got == {"r1": center}
    assert len(got_qual["r1"]) == len(center)


def test_dense_mam_matches_reference_impl():
    """Dense numpy MAM rows == per-string MAM rows on random partitions."""
    import numpy as np

    from isocon_tpu.correct.dense import build_dense_mam

    rng = random.Random(7)
    for trial in range(20):
        center = "".join(rng.choice("ACGT") for _ in range(rng.randrange(30, 90)))
        members = []
        for _ in range(rng.randrange(2, 7)):
            s = list(center)
            for _ in range(rng.randrange(0, 6)):
                p = rng.randrange(len(s))
                op = rng.choice("SIID")  # insertion-heavy: stresses slots
                if op == "S":
                    s[p] = rng.choice("ACGT")
                elif op == "I":
                    s.insert(p, rng.choice("ACGT"))
                elif len(s) > 2:
                    del s[p]
            members.append(("".join(s), rng.randrange(1, 3)))
        part = _make_partition(center, members)
        want = create_multialignment_matrix(center, part)
        accs, mat, degs = build_dense_mam(center, part)
        assert sorted(want) == accs
        for k, acc in enumerate(accs):
            assert mat[k].tobytes().decode() == "".join(want[acc]), (
                trial, acc,
            )
        # PFM equality
        from isocon_tpu.correct.dense import dense_pfm
        from isocon_tpu.correct.mam import create_position_frequency_matrix

        pfm = create_position_frequency_matrix(want, part)
        dpfm = dense_pfm(mat, degs)
        for j, col in enumerate(pfm):
            for ci, ch in enumerate("ACGT-"):
                assert col[ch] == dpfm[j][ci], (trial, j, ch)


def test_dense_correction_matches_oracle():
    """correct_to_consensus dense path == per-string oracle on random
    partitions (decision-level equality incl. tie extension)."""
    import os

    from isocon_tpu.correct.consensus import _correct_to_consensus_oracle
    from isocon_tpu.correct.dense import correct_to_consensus_dense

    rng = random.Random(11)
    for trial in range(15):
        center = "".join(rng.choice("ACGT") for _ in range(rng.randrange(40, 100)))
        members = []
        n_mem = rng.randrange(2, 8)
        for _ in range(n_mem):
            s = list(center)
            for _ in range(rng.randrange(0, 7)):
                p = rng.randrange(len(s))
                op = rng.choice("SSID")
                if op == "S":
                    s[p] = rng.choice("ACGT")
                elif op == "I":
                    s.insert(p, rng.choice("ACGT"))
                elif len(s) > 2:
                    del s[p]
            members.append(("".join(s), rng.choice([1, 1, 1, 2, 3])))
        part = _make_partition(center, members)
        part[center] = (0, center, center, rng.choice([1, 2]))
        seq_to_acc = {s: ["acc_%d" % i] for i, s in enumerate(part)}
        want = _correct_to_consensus_oracle(center, part, seq_to_acc, 1)
        got = correct_to_consensus_dense(center, part, seq_to_acc)
        assert got == want, (trial, got, want)
