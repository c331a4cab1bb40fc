#!/usr/bin/env python
"""Convert a PacBio ccs.bam to fastq, reconciled with flnc read accessions.

Standalone tool equivalent of the reference's ``scrips/ccs_bam_to_fastq.py``
(without the pysam dependency): for every full-length-non-chimeric read in
the flnc fasta, find its CCS record, orient it (reverse-complement when the
accession carries ``strand=-``), slice it to the flnc sequence and emit
sequence + per-base qualities as fastq.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from isocon_tpu.io import read_fasta
from isocon_tpu.io.bam import read_ccs_bam
from isocon_tpu.io.ccs import ccs_dict_from_bam


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("flnc", help="full-length non-chimeric reads (fasta)")
    p.add_argument("ccs_bam", help="ccs.bam with base qualities")
    p.add_argument("outfile", help="output fastq")
    args = p.parse_args()

    X = {acc: seq for acc, seq in read_fasta(args.flnc)}
    raw = read_ccs_bam(args.ccs_bam)
    X_ids = {"/".join(acc.split("/")[:2]): acc for acc in X}
    ccs_dict = ccs_dict_from_bam(raw, X_ids, X)

    with open(args.outfile, "w") as out:
        for acc in sorted(X):
            ccs = ccs_dict[acc]
            qual = "".join(chr(q + 33) for q in ccs.qual)
            out.write("@{0}\n{1}\n+\n{2}\n".format(acc, ccs.seq, qual))
    print("wrote", len(X), "records to", args.outfile)


if __name__ == "__main__":
    main()
