#!/usr/bin/env python
"""Split reads into per-cluster fastq/fasta files using cluster_info.tsv.

Standalone tool equivalent of the reference's ``scrips/cluster_to_fastq.py``:
reads the pipeline's read->candidate assignment and writes one file per
cluster into the output folder.
"""
import argparse
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from isocon_tpu.io import read_fastx


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("reads", help="fasta/fastq with the original reads")
    p.add_argument("clusters", help="cluster_info.tsv from the pipeline")
    p.add_argument("outfolder")
    args = p.parse_args()

    os.makedirs(args.outfolder, exist_ok=True)
    clusters = defaultdict(list)
    with open(args.clusters) as fh:
        for line in fh:
            items = line.strip().split()
            if len(items) >= 2:
                clusters[items[1]].append(items[0])

    reads = {}
    for name, seq, qual in read_fastx(args.reads):
        reads[name] = (seq, qual)

    for i, (c_acc, members) in enumerate(sorted(clusters.items())):
        is_fq = any(reads.get(m, ("", None))[1] for m in members)
        ext = "fastq" if is_fq else "fa"
        path = os.path.join(args.outfolder, "cluster_{0}.{1}".format(i, ext))
        with open(path, "w") as out:
            for m in members:
                if m not in reads:
                    continue
                seq, qual = reads[m]
                if is_fq and qual:
                    out.write("@{0}\n{1}\n+\n{2}\n".format(m, seq, qual))
                else:
                    out.write(">{0}\n{1}\n".format(m, seq))
    print("wrote", len(clusters), "cluster files to", args.outfolder)


if __name__ == "__main__":
    main()
