"""Viral-strain stress benchmark (BASELINE.json config 4).

An HIV-like amplicon experiment: K near-identical haplotypes of ONE
~2 kb master sequence (each haplotype 1..2K SNVs from the master, so
some pairs differ by as little as 2 positions), with strongly skewed
abundances (geometric mix, rarest strains near the support floor).
This is the hardest regime for the hypothesis test: every candidate
pair is within a handful of variants, so phase 2's p-value
discrimination -- not phase 1's clustering -- decides the output.

Prints one JSON line: wall-clock per phase, engine counters, and
strain-level recall/precision over final_candidates.fa.  A correct run
recovers every haplotype whose read support clears
min_candidate_support, and emits NO false haplotypes.

Usage: python scripts/bench_viral.py [n_reads] [n_strains] [outdir]
"""
from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, ".")

N_READS = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
N_STRAINS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/isocon_bench_viral"
L_MASTER = 2000


def make_strains(rng):
    master = "".join(rng.choice("ACGT") for _ in range(L_MASTER))
    strains = [master]
    for k in range(1, N_STRAINS):
        bl = list(master)
        # strain k: 2k SNVs at deterministic spread positions; adjacent
        # strains differ by as few as 2 positions
        for s in range(2 * k):
            p = (97 * (s + 1) + 211 * k) % L_MASTER
            bl[p] = {"A": "C", "C": "G", "G": "T", "T": "A"}[bl[p]]
        strains.append("".join(bl))
    return strains


def abundances(rng, n_strains, n_reads):
    """Geometric mix (each strain ~70% of the previous), floored so the
    rarest strain still clears the default support threshold."""
    w = [0.7 ** k for k in range(n_strains)]
    tot = sum(w)
    counts = [max(8, int(n_reads * x / tot)) for x in w]
    # trim the dominant strain so the total matches
    counts[0] -= sum(counts) - n_reads
    return counts


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
    rng = random.Random(77)
    strains = make_strains(rng)
    counts = abundances(rng, N_STRAINS, N_READS)
    os.makedirs(OUT, exist_ok=True)
    read_file = os.path.join(OUT, "reads_%d_%d.fa" % (N_READS, N_STRAINS))
    if not os.path.exists(read_file):
        with open(read_file, "w") as fh:
            i = 0
            for k, (strain, c) in enumerate(zip(strains, counts)):
                for _ in range(c):
                    fh.write(">read_%d_strain_%d\n%s\n"
                             % (i, k, noisy_copy(rng, strain)))
                    i += 1

    from isocon_tpu.cli import main as cli_main
    from isocon_tpu.io import read_fasta

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_e2e_n200 import parse_logfile

    outdir = os.path.join(OUT, "out")
    t0 = time.perf_counter()
    cli_main(["pipeline", "-fl_reads", read_file, "-outfolder", outdir])
    dt = time.perf_counter() - t0

    rec = parse_logfile(os.path.join(outdir, "logfile.txt"))
    finals = {seq for _a, seq in read_fasta(
        os.path.join(outdir, "final_candidates.fa"))}
    truth = set(strains)
    recovered = sum(1 for s in strains if s in finals)
    true_pos = sum(1 for s in finals if s in truth)
    print(json.dumps({
        "n_reads": N_READS,
        "n_strains": N_STRAINS,
        "strain_counts": counts,
        "pipeline_seconds": round(dt, 1),
        "phase1_seconds": rec.get("phase1_seconds"),
        "phase2_seconds": rec.get("phase2_seconds"),
        "engine": {k: rec[k] for k in
                   ("ed_pairs", "ed_seconds", "align_pairs",
                    "align_seconds") if k in rec},
        "final_candidates": len(finals),
        "strains_recovered": recovered,
        "recall": round(recovered / N_STRAINS, 4),
        "precision": round(true_pos / max(len(finals), 1), 4),
    }))


if __name__ == "__main__":
    main()
