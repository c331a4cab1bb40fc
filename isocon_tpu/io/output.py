"""Result writers and run log (``input_output/write_output.py``)."""
from __future__ import annotations

import datetime
import os
from typing import Dict


def logger(message: str, logfile, timestamp: bool = True) -> None:
    if logfile is None:
        return
    if timestamp:
        logfile.write(str(datetime.datetime.now()) + "\t" + message + "\n")
    else:
        logfile.write(message + "\n")
    logfile.flush()


def devlog(params, message: str) -> None:
    """Developer log under ``--verbose`` (the reference's develop_logfile,
    ``IsoCon:284``); no-op otherwise."""
    logger(message, getattr(params, "develop_logfile", None))


def print_candidates_from_nearest_neighbors(path: str, C: Dict[str, str]) -> None:
    """Phase-1 candidate fasta, sorted by accession
    (``write_output.py:47-60``)."""
    with open(path, "w") as fh:
        for c_acc, c_seq in sorted(C.items()):
            fh.write(">{0}\n{1}\n".format(c_acc, c_seq))


def print_candidates(
    out_file_name: str,
    C: Dict[str, str],
    significance_values: Dict[str, tuple],
    read_partition: Dict[str, dict],
    X: Dict[str, str],
    final: bool = False,
    reads_to_consensus_tsv: str = "",
) -> None:
    """Final/intermediate candidate fasta + cluster_info.tsv
    (``write_output.py:18-44``).  Accession format when final:
    ``{c_acc}_{support}_{p_value}_{N_t}_{delta_size}``."""
    if final and reads_to_consensus_tsv:
        with open(reads_to_consensus_tsv, "w") as tsv:
            for c_acc in read_partition:
                for x_acc in read_partition[c_acc]:
                    tsv.write(
                        "{0}\t{1}\t{2}\t{3}\n".format(
                            x_acc, c_acc, len(X[x_acc]), len(C[c_acc])
                        )
                    )
    with open(out_file_name, "w") as out:
        for c_acc, seq in sorted(C.items(), key=lambda x: len(x[1]), reverse=True):
            (c_acc_, t_acc, p_value, corr_factor, support, N_t, delta_size) = (
                significance_values[c_acc]
            )
            if final:
                out.write(
                    ">{0}\n{1}\n".format(
                        c_acc
                        + "_"
                        + str(support)
                        + "_"
                        + str(p_value)
                        + "_"
                        + str(N_t)
                        + "_"
                        + str(delta_size),
                        seq,
                    )
                )
            else:
                out.write(">{0}\n{1}\n".format(c_acc, seq))


def print_reads(path: str, reads: Dict[str, str]) -> None:
    with open(path, "w") as fh:
        for acc, seq in reads.items():
            fh.write(">{0}\n{1}\n".format(acc, seq))
