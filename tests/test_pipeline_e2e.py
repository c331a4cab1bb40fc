"""End-to-end pipeline on synthetic data with known ground truth.

The reference's only system test is "the pipeline completes" on 200
simulated reads (.travis.yml, SURVEY.md section 4); here we go further:
simulated noisy reads from known isoforms must reconstruct exactly those
isoform sequences.
"""
import os
import random

import pytest

from isocon_tpu.cli import main as cli_main
from isocon_tpu.io import read_fasta


def rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def noisy_copy(rng, s, error_rate):
    out = []
    for ch in s:
        r = rng.random()
        if r < error_rate * 0.4:        # substitution
            out.append(rng.choice([c for c in "ACGT" if c != ch]))
        elif r < error_rate * 0.7:      # insertion
            out.append(ch)
            out.append(rng.choice("ACGT"))
        elif r < error_rate:            # deletion
            pass
        else:
            out.append(ch)
    return "".join(out)


@pytest.fixture(scope="module")
def synthetic(tmp_path_factory):
    rng = random.Random(42)
    base = rand_seq(rng, 300)
    # two isoforms: 3 well-separated SNVs apart
    iso_a = base
    bl = list(base)
    for pos in (40, 150, 260):
        bl[pos] = {"A": "C", "C": "G", "G": "T", "T": "A"}[bl[pos]]
    iso_b = "".join(bl)
    reads = {}
    for i in range(14):
        reads["read_a_%d" % i] = noisy_copy(rng, iso_a, 0.01)
    for i in range(14):
        reads["read_b_%d" % i] = noisy_copy(rng, iso_b, 0.01)
    d = tmp_path_factory.mktemp("e2e")
    read_file = os.path.join(str(d), "reads.fa")
    with open(read_file, "w") as fh:
        for acc, seq in sorted(reads.items()):
            fh.write(">%s\n%s\n" % (acc, seq))
    return read_file, str(d), iso_a, iso_b


def test_pipeline_reconstructs_isoforms(synthetic):
    read_file, d, iso_a, iso_b = synthetic
    out = os.path.join(d, "out")
    cli_main([
        "pipeline", "-fl_reads", read_file, "-outfolder", out,
        "--batch_pairs", "32",
    ])
    final = os.path.join(out, "final_candidates.fa")
    assert os.path.exists(final)
    cands = {seq for _acc, seq in read_fasta(final)}
    assert iso_a in cands and iso_b in cands, (
        "true isoforms not reconstructed; got %d candidates" % len(cands)
    )
    assert len(cands) == 2, "spurious candidates survived the filter"
    # cluster_info.tsv assigns every surviving read
    info = os.path.join(out, "cluster_info.tsv")
    assert os.path.exists(info)
    rows = [l.split("\t") for l in open(info) if l.strip()]
    assert len(rows) >= 20
    # the reference's per-round scratch spills exist for mid-run
    # inspection (isocon_statistical_test.py:257-263,280-282)
    assert os.path.exists(os.path.join(out, "temp_candidates_step_1.fa"))
    assert os.path.exists(os.path.join(out, "remaining_to_align.fa"))


def test_get_candidates_subcommand(synthetic):
    read_file, d, iso_a, iso_b = synthetic
    out = os.path.join(d, "out_gc")
    cli_main([
        "get_candidates", "-fl_reads", read_file, "-outfolder", out,
        "--batch_pairs", "32",
    ])
    conv = os.path.join(out, "candidates_converged.fa")
    assert os.path.exists(conv)
    cands = {seq for _acc, seq in read_fasta(conv)}
    assert iso_a in cands and iso_b in cands


def test_stat_filter_subcommand(synthetic):
    read_file, d, iso_a, iso_b = synthetic
    out = os.path.join(d, "out_sf")
    cand_file = os.path.join(d, "cands.fa")
    with open(cand_file, "w") as fh:
        fh.write(">cand_a_support_10\n%s\n" % iso_a)
        fh.write(">cand_b_support_10\n%s\n" % iso_b)
        fh.write(">cand_weak_support_1\n%s\n" % (iso_a[:150] + iso_b[150:]))
    cli_main([
        "stat_filter", "-fl_reads", read_file, "-candidates", cand_file,
        "-outfolder", out, "--batch_pairs", "32",
    ])
    final = os.path.join(out, "final_candidates.fa")
    cands = {seq for _acc, seq in read_fasta(final)}
    assert iso_a in cands and iso_b in cands
    # the low-support chimera was dropped before testing
    assert len(cands) == 2


def test_nontargeted_mode(synthetic):
    """--nontargeted (sketch prefilter) reconstructs the same isoforms."""
    read_file, d, iso_a, iso_b = synthetic
    out = os.path.join(d, "out_nt")
    cli_main([
        "get_candidates", "-fl_reads", read_file, "-outfolder", out,
        "--batch_pairs", "32", "--nontargeted",
    ])
    cands = {seq for _acc, seq in read_fasta(os.path.join(out, "candidates_converged.fa"))}
    assert iso_a in cands and iso_b in cands
