"""Regression oracles on the bundled reference datasets (VERDICT item 3).

The reference's only CI is "the pipeline completes" on
``test/data/simulated_pacbio_reads_n_200.fa`` (``.travis.yml:22``); edlib/
parasail are not installable here so the reference itself cannot run.
These tests instead pin isocon_tpu's OWN output on the real 2 kb data as a
committed snapshot (``tests/golden/``): any semantic drift anywhere in the
9-module pipeline changes the candidate set and fails.

With the native C++ CPU fast path the n_200 runs take ~10 s each and run
in the default suite; the larger n_500 one stays behind ISOCON_RUN_SLOW=1.
Regenerate the snapshots with scripts/regen_golden.sh after an
*intentional* semantic change.
"""
import os
import re

import pytest

from isocon_tpu.cli import main as cli_main
from isocon_tpu.io import read_fasta

REF_DATA = "/root/reference/test/data"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

slow = pytest.mark.skipif(
    not os.environ.get("ISOCON_RUN_SLOW"),
    reason="minutes-long CPU run; set ISOCON_RUN_SLOW=1",
)


def support_and_seqs(path):
    """{(support, sequence)} multiset key from a candidates fasta."""
    out = []
    for acc, seq in read_fasta(path):
        m = re.search(r"support_(\d+)", acc)
        out.append((int(m.group(1)) if m else -1, seq))
    return sorted(out)


def test_n200_get_candidates_matches_golden(tmp_path):
    out = str(tmp_path / "out")
    cli_main([
        "get_candidates",
        "-fl_reads", os.path.join(REF_DATA, "simulated_pacbio_reads_n_200.fa"),
        "-outfolder", out, "--batch_pairs", "64",
    ])
    got = support_and_seqs(os.path.join(out, "candidates_converged.fa"))
    want = support_and_seqs(
        os.path.join(GOLDEN, "n200_candidates_converged.fa"))
    assert got == want


def test_n200_pipeline_matches_golden(tmp_path):
    out = str(tmp_path / "out")
    cli_main([
        "pipeline",
        "-fl_reads", os.path.join(REF_DATA, "simulated_pacbio_reads_n_200.fa"),
        "-outfolder", out, "--batch_pairs", "64",
    ])
    got = support_and_seqs(os.path.join(out, "final_candidates.fa"))
    want = support_and_seqs(os.path.join(GOLDEN, "n200_final_candidates.fa"))
    assert got == want


@slow
def test_n500_pipeline_matches_golden(tmp_path):
    """Full pipeline on n_500 (~30 s CPU): candidates_converged AND
    final_candidates both pinned."""
    out = str(tmp_path / "out")
    cli_main([
        "pipeline",
        "-fl_reads", os.path.join(REF_DATA, "simulated_pacbio_reads_n_500.fa"),
        "-outfolder", out, "--batch_pairs", "64",
    ])
    got = support_and_seqs(os.path.join(out, "candidates_converged.fa"))
    want = support_and_seqs(
        os.path.join(GOLDEN, "n500_candidates_converged.fa"))
    assert got == want
    got = support_and_seqs(os.path.join(out, "final_candidates.fa"))
    want = support_and_seqs(os.path.join(GOLDEN, "n500_final_candidates.fa"))
    assert got == want


@slow
def test_n2000_pipeline_matches_golden(tmp_path):
    """Full pipeline on the largest bundled dataset (~4 min CPU); the
    committed snapshot is byte-identical between the CPU and TPU backends
    (verified 2026-08-19)."""
    out = str(tmp_path / "out")
    cli_main([
        "pipeline",
        "-fl_reads",
        os.path.join(REF_DATA, "simulated_pacbio_reads_n_2000.fa"),
        "-outfolder", out, "--batch_pairs", "64",
    ])
    got = support_and_seqs(os.path.join(out, "final_candidates.fa"))
    want = support_and_seqs(
        os.path.join(GOLDEN, "n2000_final_candidates.fa"))
    assert got == want


@slow
def test_n1000_get_candidates_matches_golden(tmp_path):
    golden = os.path.join(GOLDEN, "n1000_candidates_converged.fa")
    out = str(tmp_path / "out")
    cli_main([
        "get_candidates",
        "-fl_reads",
        os.path.join(REF_DATA, "simulated_pacbio_reads_n_1000.fa"),
        "-outfolder", out, "--batch_pairs", "64",
    ])
    got = support_and_seqs(os.path.join(out, "candidates_converged.fa"))
    assert got == support_and_seqs(golden)
