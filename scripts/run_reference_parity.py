#!/usr/bin/env python
"""Run the reference IsoCon (/root/reference) with isocon_tpu's kernels
shimmed in as `edlib`/`parasail`, then diff its output against the
isocon_tpu pipeline on the same input.

Real edlib/parasail are uninstallable here (zero egress), so the golden
snapshots in tests/golden/ pin isocon_tpu's own output.  This script
closes the remaining gap: it executes the reference's OWN pipeline
logic (its Python, unmodified) on top of our alignment kernels, so any
disagreement isolates a divergence in pipeline/stats logic rather than
kernel tie-breaks.  Agreement means: reference logic + our kernels ==
our framework, end to end.

Compatibility shims (the reference is 2018-era code, read-only):
  * tests/refshims/{edlib,parasail,pysam}.py on sys.path
  * networkx 1.x API restored: Graph.node view, nx.weakly_connected_
    component_subgraphs (the repo ships networkx 3.x)

Usage: python scripts/run_reference_parity.py [reads.fa] [workdir]
Prints one JSON line with both outputs' candidate sets and the verdict.
"""
from __future__ import annotations

import json
import os
import runpy
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("ISOCON_REFERENCE", "/root/reference")

# The parity oracle is a CPU-correctness check; run it on the CPU backend
# unless explicitly pointed at the accelerator.  env JAX_PLATFORMS=cpu is
# NOT sufficient when the axon tunnel variable is set (its sitecustomize
# registration overrides the platform choice), so pin via jax.config.
if os.environ.get("ISOCON_PARITY_TPU") != "1":
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except ImportError:
        pass
READS = (sys.argv[1] if len(sys.argv) > 1 else
         os.path.join(REFERENCE, "test/data/simulated_pacbio_reads_n_200.fa"))
WORK = sys.argv[2] if len(sys.argv) > 2 else "/tmp/isocon_ref_parity"


def patch_networkx() -> None:
    import networkx as nx

    if not hasattr(nx.Graph, "node"):
        nx.Graph.node = property(lambda self: self.nodes)
    if not hasattr(nx, "weakly_connected_component_subgraphs"):
        nx.weakly_connected_component_subgraphs = (
            lambda G, copy=True: (G.subgraph(c).copy()
                                  for c in nx.weakly_connected_components(G)))


def run_reference(outdir: str) -> None:
    sys.path.insert(0, os.path.join(REPO, "tests", "refshims"))
    sys.path.insert(1, REFERENCE)
    sys.path.insert(2, REPO)
    patch_networkx()
    argv_save = sys.argv
    sys.argv = ["IsoCon", "pipeline", "-fl_reads", READS,
                "-outfolder", outdir, "--nr_cores", "1"]
    try:
        runpy.run_path(os.path.join(REFERENCE, "IsoCon"),
                       run_name="__main__")
    except SystemExit as e:
        if e.code not in (0, None):
            raise
    finally:
        sys.argv = argv_save


def run_ours(outdir: str) -> None:
    sys.path.insert(0, REPO)
    from isocon_tpu.cli import main as cli_main

    cli_main(["pipeline", "-fl_reads", READS, "-outfolder", outdir])


def read_candidates(path: str):
    """{sequence: accession} from a final_candidates.fa."""
    from isocon_tpu.io import read_fasta

    return {seq: acc for acc, seq in read_fasta(path)}


def main() -> None:
    os.makedirs(WORK, exist_ok=True)
    ref_out = os.path.join(WORK, "reference")
    our_out = os.path.join(WORK, "isocon_tpu")
    step = sys.argv[3] if len(sys.argv) > 3 else "all"
    if step in ("all", "reference"):
        os.makedirs(ref_out, exist_ok=True)
        run_reference(ref_out)
    if step in ("all", "ours"):
        os.makedirs(our_out, exist_ok=True)
        run_ours(our_out)

    ref = read_candidates(os.path.join(ref_out, "final_candidates.fa"))
    ours = read_candidates(os.path.join(our_out, "final_candidates.fa"))
    only_ref = sorted(ref[s] for s in set(ref) - set(ours))
    only_ours = sorted(ours[s] for s in set(ours) - set(ref))
    print(json.dumps({
        "reads": READS,
        "reference_candidates": len(ref),
        "isocon_tpu_candidates": len(ours),
        "common_sequences": len(set(ref) & set(ours)),
        "only_reference": only_ref,
        "only_isocon_tpu": only_ours,
        "sequences_equal": not only_ref and not only_ours,
    }))


if __name__ == "__main__":
    main()
