#!/usr/bin/env python
"""Standalone ends-ignored nearest-neighbor graph tool.

Rebuilds the reference's end-invariant CLI
(``end_invariant_functions.py:1067-1132``): given a candidate fasta with
``_support_N`` accessions, writes the ends-ignored NN edge list as a TSV
(acc1, support1, acc2, support2, adjusted_ed), prints edge statistics, and
reports the candidate count after end-invariant partitioning.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from isocon_tpu.io import read_fasta
from isocon_tpu.graph.end_invariant import ends_ignored_nn_graph
from isocon_tpu.graph.partition import star_partition
from isocon_tpu.ops.engine import PairEngine


def main():
    parser = argparse.ArgumentParser(
        description="Print nearest_neighbor graph allowing for mismatches "
                    "in ends.")
    parser.add_argument("candidate_transcripts", type=str,
                        help="Path to the consensus fasta file")
    parser.add_argument("outfile", type=str, help="Outfile of results")
    parser.add_argument("--ignore_ends_len", type=int, default=15)
    parser.add_argument("--neighbor_search_depth", type=int, default=2 ** 32)
    args = parser.parse_args()

    candidates = {acc: seq
                  for acc, seq in read_fasta(args.candidate_transcripts)}
    support = {}
    for acc in candidates:
        try:
            support[acc] = int(acc.split("_support_")[1].split("_")[0])
        except (IndexError, ValueError):
            support[acc] = 1
    assert len({s for s in candidates.values()}) == len(candidates), \
        "candidate sequences must be unique"

    engine = PairEngine()
    depth = (args.neighbor_search_depth
             if args.neighbor_search_depth < 2 ** 31 else None)
    graph = ends_ignored_nn_graph(candidates, args.ignore_ends_len,
                                  engine=engine,
                                  neighbor_search_depth=depth)

    edges = 0
    tot_ed = 0
    with open(args.outfile, "w") as out:
        for acc1 in sorted(graph):
            for acc2 in sorted(graph[acc1]):
                edges += 1
                tot_ed += graph[acc1][acc2]
                out.write("{0}\t{1}\t{2}\t{3}\t{4}\n".format(
                    acc1, support[acc1], acc2, support[acc2],
                    graph[acc1][acc2]))
    print("Number of edges:", edges)
    print("Total edit distance:", tot_ed)
    if edges > 0:
        print("Avg ed (ed/edges):", tot_ed / float(edges))

    accs = sorted(candidates)
    idx = {a: i for i, a in enumerate(accs)}
    edge_list = [(idx[a], idx[b]) for a in graph for b in graph[a]]
    degrees = [support[a] for a in accs]
    _m, partition = star_partition(accs, degrees, edge_list, tiebreak="ends")
    print("candidates after edge invariants:", len(partition))


if __name__ == "__main__":
    main()
