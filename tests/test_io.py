"""IO: fasta/fastq parsers, BAM round-trip, CCS quality handling."""
import io
import os

from isocon_tpu.io import read_fasta, read_fastx, write_fasta
from isocon_tpu.io.bam import read_bam, read_ccs_bam, write_bam
from isocon_tpu.io.ccs import CCS, fix_quality_values, reverse_complement


def test_read_fasta_space_munging():
    data = ">acc one two\nACGT\nACGT\n>acc2\nTTTT\n"
    got = list(read_fasta(io.StringIO(data)))
    assert got == [("acc_one_two", "ACGTACGT"), ("acc2", "TTTT")]


def test_read_fastx_mixed():
    data = "@r1 x\nACGT\n+\nIIII\n>r2 y\nGGGG\nCCCC\n@r3\nAC\nGT\n+\nII\nII\n"
    got = list(read_fastx(io.StringIO(data)))
    assert got[0] == ("r1_x", "ACGT", "IIII")
    assert got[1] == ("r2_y", "GGGGCCCC", None)
    assert got[2] == ("r3", "ACGT", "IIII")


def test_write_fasta(tmp_path):
    p = str(tmp_path / "x.fa")
    write_fasta(p, {"b": "TT", "a": "AA"}, sort=True)
    assert open(p).read() == ">a\nAA\n>b\nTT\n"


def test_bam_roundtrip(tmp_path):
    p = str(tmp_path / "t.bam")
    recs = [
        ("m1/100/ccs", "ACGTACGTA", [30, 31, 32, 33, 34, 35, 36, 37, 38],
         {"np": 12}),
        ("m1/101/ccs", "GGTT", [40, 41, 42, 43], {"np": 5, "RG": "grp1"}),
    ]
    write_bam(p, recs)
    got = list(read_bam(p))
    assert len(got) == 2
    assert got[0].name == "m1/100/ccs"
    assert got[0].seq == "ACGTACGTA"
    assert got[0].qual == [30, 31, 32, 33, 34, 35, 36, 37, 38]
    assert got[0].tags["np"] == 12
    assert got[1].tags["RG"] == "grp1"

    ccs = read_ccs_bam(p)
    assert set(ccs) == {"m1/100", "m1/101"}
    assert ccs["m1/100"].np == 12
    assert ccs["m1/100"].seq == "ACGTACGTA"


def test_fix_quality_values():
    # homopolymer runs sorted ascending within the run (ccs_info.py:131-150)
    seq = "AAACGG"
    quals = [9, 3, 7, 5, 8, 2]
    assert fix_quality_values(seq, quals) == [3, 7, 9, 5, 2, 8]


def test_reverse_complement():
    assert reverse_complement("ACGTN") == "NACGT"


def test_ccs_read_aln_to_coord():
    ccs = CCS("r", "TTACGTAA", [10, 11, 12, 13, 14, 15, 16, 17], 3)
    # aligned read is the infix ACGT starting at ccs coord 2
    assert ccs.read_aln_to_ccs_coord("AC-GT", 0) == 2
    assert ccs.read_aln_to_ccs_coord("AC-GT", 3) == 5
