"""10k-read FULL-pipeline benchmark (BASELINE.json config 2).

Generates a deterministic synthetic 10,000-read dataset (26 isoforms of a
2-exon-structure gene family, ~1% read noise), runs the complete
`pipeline` (phase 1 candidates + phase 2 statistical filter), and prints
one JSON line with per-phase wall-clock (from the run's own logfile),
engine counters, and isoform precision/recall over final_candidates.fa.
Targets: phase 1 < 300 s on the TPU; phase 2 exercises the stat-filter
loop at ~1.6k-candidate scale (round-3 VERDICT #6).

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


def make_isoforms(rng):
    """26 isoforms: 13 exon-combination variants x 2 SNV haplotypes."""
    exons = [
        "".join(rng.choice("ACGT") for _ in range(ln))
        for ln in (350, 200, 300, 250, 400, 150)
    ]
    combos = [
        (0, 1, 2, 3, 4, 5), (0, 1, 2, 3, 4), (0, 1, 2, 4, 5),
        (0, 2, 3, 4, 5), (0, 1, 3, 4, 5), (0, 1, 2, 3, 5),
        (0, 2, 4, 5), (0, 1, 3, 5), (0, 2, 3, 4), (0, 1, 2, 4),
        (0, 3, 4, 5), (0, 1, 4, 5), (0, 2, 3, 5),
    ]
    isoforms = []
    for combo in combos:
        seq = "".join(exons[e] for e in combo)
        isoforms.append(seq)
        # second haplotype: 3 SNVs spread across the isoform
        bl = list(seq)
        for frac in (0.2, 0.5, 0.8):
            p = int(len(bl) * frac)
            bl[p] = {"A": "C", "C": "G", "G": "T", "T": "A"}[bl[p]]
        isoforms.append("".join(bl))
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
    isoforms = make_isoforms(rng)
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
    print(json.dumps({
        "n_reads": N_READS,
        "pipeline_seconds": round(dt, 1),
        "phase1_seconds": rec.get("phase1_seconds"),
        "phase2_seconds": rec.get("phase2_seconds"),
        "engine": {k: rec[k] for k in
                   ("ed_pairs", "ed_seconds", "ed_calls", "align_pairs",
                    "align_seconds", "align_calls") if k in rec},
        "phase1_candidates": len(phase1),
        "final_candidates": len(finals),
        "isoforms_recovered": recovered,
        "isoforms_total": len(isoforms),
        "recall": round(recovered / len(isoforms), 4),
        "precision": round(true_pos / max(len(finals), 1), 4),
    }))


if __name__ == "__main__":
    main()
