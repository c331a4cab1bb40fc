"""10k-100k-read FULL-pipeline benchmark (BASELINE.json config 2).

Generates a deterministic synthetic dataset (26 isoforms per gene
family: 13 exon-combination variants x 2 SNV haplotypes, ~1% read
noise), runs the complete `pipeline` (phase 1 candidates + phase 2
statistical filter), and prints one JSON line with per-phase wall-clock
(from the run's own logfile), engine counters, a host-vs-device split
(host_other_seconds = wall - engine ed/align time: the graph/stats/IO
work that must not grow superlinearly), and isoform precision/recall
over final_candidates.fa.

Family count scales with read depth (one family per 10k reads, override
with ISOCON_BENCH_FAMILIES): a 50k-read amplicon experiment covers more
genes, not 25x deeper coverage of one, so per-read NN windows stay at
realistic cluster sizes while every host structure (pair cache, engine
table, partition, stat filter) sees the full read count.  Family 0 uses
the round-2 fixed exon lengths, so `bench_10k.py 10000` reproduces the
BENCH_10K workload exactly; further families draw their exon lengths
from the same seeded rng.

Usage: python scripts/bench_10k.py [n_reads] [outdir]
"""
from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, ".")

N_READS = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/isocon_bench10k"
FAMILIES = int(os.environ.get("ISOCON_BENCH_FAMILIES",
                              max(1, N_READS // 10000)))

COMBOS = [
    (0, 1, 2, 3, 4, 5), (0, 1, 2, 3, 4), (0, 1, 2, 4, 5),
    (0, 2, 3, 4, 5), (0, 1, 3, 4, 5), (0, 1, 2, 3, 5),
    (0, 2, 4, 5), (0, 1, 3, 5), (0, 2, 3, 4), (0, 1, 2, 4),
    (0, 3, 4, 5), (0, 1, 4, 5), (0, 2, 3, 5),
]


def make_family(rng, exon_lens):
    """26 isoforms: 13 exon-combination variants x 2 SNV haplotypes."""
    exons = [
        "".join(rng.choice("ACGT") for _ in range(ln))
        for ln in exon_lens
    ]
    isoforms = []
    for combo in COMBOS:
        seq = "".join(exons[e] for e in combo)
        isoforms.append(seq)
        # second haplotype: 3 SNVs spread across the isoform
        bl = list(seq)
        for frac in (0.2, 0.5, 0.8):
            p = int(len(bl) * frac)
            bl[p] = {"A": "C", "C": "G", "G": "T", "T": "A"}[bl[p]]
        isoforms.append("".join(bl))
    return isoforms


def make_isoforms(rng, families=1):
    isoforms = make_family(rng, (350, 200, 300, 250, 400, 150))
    for _f in range(1, families):
        lens = tuple(int(rng.randrange(120, 450)) for _ in range(6))
        isoforms.extend(make_family(rng, lens))
    return isoforms


def noisy_copy(rng, s, error_rate=0.01):
    out = []
    for ch in s:
        r = rng.random()
        if r < error_rate * 0.4:
            out.append(rng.choice([c for c in "ACGT" if c != ch]))
        elif r < error_rate * 0.7:
            out.append(ch)
            out.append(rng.choice("ACGT"))
        elif r < error_rate:
            pass
        else:
            out.append(ch)
    return "".join(out)


def main():
    rng = random.Random(123)
    isoforms = make_isoforms(rng, FAMILIES)
    os.makedirs(OUT, exist_ok=True)
    read_file = os.path.join(OUT, "reads_%d.fa" % N_READS)
    if not os.path.exists(read_file):
        with open(read_file, "w") as fh:
            for i in range(N_READS):
                iso = isoforms[i % len(isoforms)]
                fh.write(">read_%d\n%s\n" % (i, noisy_copy(rng, iso)))

    from isocon_tpu.cli import main as cli_main
    from isocon_tpu.io import read_fasta

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_e2e_n200 import parse_logfile

    outdir = os.path.join(OUT, "out")
    t0 = time.perf_counter()
    cli_main([
        "pipeline", "-fl_reads", read_file, "-outfolder", outdir,
    ])
    dt = time.perf_counter() - t0

    rec = parse_logfile(os.path.join(outdir, "logfile.txt"))
    phase1 = {seq for _a, seq in read_fasta(
        os.path.join(outdir, "candidates_converged.fa"))}
    finals = {seq for _a, seq in read_fasta(
        os.path.join(outdir, "final_candidates.fa"))}
    recovered = sum(1 for iso in isoforms if iso in finals)
    true_pos = sum(1 for seq in finals if seq in set(isoforms))
    out = {
        "n_reads": N_READS,
        "families": FAMILIES,
        "pipeline_seconds": round(dt, 1),
        "phase1_seconds": rec.get("phase1_seconds"),
        "phase2_seconds": rec.get("phase2_seconds"),
        "engine": {k: rec[k] for k in
                   ("ed_pairs", "ed_seconds", "ed_calls",
                    "ed_max_collect_seconds", "align_pairs",
                    "align_seconds", "align_calls") if k in rec},
        "phase1_candidates": len(phase1),
        "final_candidates": len(finals),
        "isoforms_recovered": recovered,
        "isoforms_total": len(isoforms),
        "recall": round(recovered / len(isoforms), 4),
        "precision": round(true_pos / max(len(finals), 1), 4),
    }
    # host-vs-device split: everything the engine cannot attribute to
    # kernel batches (graph bookkeeping, partitioning, stats, IO) -- the
    # term that must stay ~linear in n_reads (round-4 VERDICT #3)
    if "ed_seconds" in rec and "align_seconds" in rec:
        out["host_other_seconds"] = round(
            dt - rec["ed_seconds"] - rec["align_seconds"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
