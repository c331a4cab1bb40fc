"""--ccs BAM path end-to-end: quality values from a PacBio-style ccs.bam
drive the phase-2 statistical test (isocon_statistical_test.py:191-197)."""
import os
import random

import pytest

from isocon_tpu.cli import main as cli_main
from isocon_tpu.io import read_fasta
from isocon_tpu.io.bam import write_bam
from isocon_tpu.io.ccs import reverse_complement


def rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def noisy(rng, s, rate=0.01):
    out = []
    for ch in s:
        r = rng.random()
        if r < rate * 0.4:
            out.append(rng.choice([c for c in "ACGT" if c != ch]))
        elif r < rate * 0.7:
            out.append(ch)
            out.append(rng.choice("ACGT"))
        elif r < rate:
            pass
        else:
            out.append(ch)
    return "".join(out)


def test_pipeline_with_ccs_bam(tmp_path):
    rng = random.Random(11)
    base = rand_seq(rng, 260)
    bl = list(base)
    for pos in (60, 200):
        bl[pos] = {"A": "C", "C": "G", "G": "T", "T": "A"}[bl[pos]]
    iso2 = "".join(bl)

    reads = {}
    for i in range(12):
        strand = "+" if i % 2 == 0 else "-"
        seq = noisy(rng, base if i < 6 else iso2)
        # flnc accession convention: movie/zmw/start_end plus strand tag
        acc = "m1/%d/0_%d_CCS strand=%s;fiveseen=1" % (100 + i, len(seq), strand)
        reads[acc] = (seq, strand)

    read_file = str(tmp_path / "flnc.fa")
    with open(read_file, "w") as fh:
        for acc, (seq, _s) in sorted(reads.items()):
            fh.write(">%s\n%s\n" % (acc, seq))

    # ccs.bam: full ccs sequences with 3bp extra flanks; strand=- reads are
    # stored as the reverse complement (the pipeline re-orients them)
    bam_records = []
    for acc, (seq, strand) in sorted(reads.items()):
        ccs_seq = "ACG" + seq + "TTA"
        if strand == "-":
            ccs_seq = reverse_complement(ccs_seq)
        qual = [rng.randrange(25, 80) for _ in ccs_seq]
        name = "/".join(acc.split(" ")[0].split("/")[:2]) + "/ccs"
        bam_records.append((name, ccs_seq, qual, {"np": 10}))
    bam_file = str(tmp_path / "ccs.bam")
    write_bam(bam_file, bam_records)

    out = str(tmp_path / "out")
    cli_main([
        "pipeline", "-fl_reads", read_file, "-outfolder", out,
        "--ccs", bam_file, "--batch_pairs", "32",
    ])
    final = os.path.join(out, "final_candidates.fa")
    cands = {s for _a, s in read_fasta(final)}
    assert base in cands and iso2 in cands
    assert len(cands) == 2
