"""Fasta/fastq ingestion.

Behavioral contract with the reference parsers:

* fasta accessions have spaces replaced by underscores
  (``input_output/fasta_parser.py:8``).
* fastq records keep the raw header minus the leading ``@`` and have spaces
  replaced by underscores (matching how the pipeline invokes readfq,
  ``input_output/fastq_parser.py:16`` / ``isocon_statistical_test.py:178``);
  quality is returned as the raw ascii string.
* multi-line sequences are concatenated with surrounding whitespace stripped.
"""
from __future__ import annotations

from typing import Iterator, Optional, Tuple


def _open(path_or_handle):
    if isinstance(path_or_handle, str):
        return open(path_or_handle, "r"), True
    return path_or_handle, False


def read_fasta(path_or_handle) -> Iterator[Tuple[str, str]]:
    """Yield (accession, sequence) from a fasta file.

    Accession munging matches ``fasta_parser.py:8``: full header line,
    stripped, spaces -> underscores.
    """
    fh, close = _open(path_or_handle)
    try:
        accession = None
        chunks = []
        for line in fh:
            if not line.strip():
                continue
            if line[0] == ">":
                if accession is not None:
                    yield accession, "".join(chunks)
                accession = line[1:].strip().replace(" ", "_")
                chunks = []
            else:
                chunks.append(line.strip())
        if accession is not None:
            yield accession, "".join(chunks)
    finally:
        if close:
            fh.close()


def read_fastx(path_or_handle) -> Iterator[Tuple[str, str, Optional[str]]]:
    """Yield (name, seq, qual-or-None) from a fasta or fastq stream.

    A fresh implementation of the readfq contract (``fastq_parser.py:5-34``):
    tolerates multi-line sequences and qualities; yields qual=None for fasta
    records.  Names have spaces replaced with underscores.
    """
    fh, close = _open(path_or_handle)
    try:
        lines = (l.rstrip("\n") for l in fh)
        header = None
        for l in lines:
            if l and l[0] in ">@":
                header = l
                break
        while header is not None:
            name = header[1:].replace(" ", "_")
            seq_chunks = []
            nxt = None          # next header, or "+" separator for fastq
            for l in lines:
                if l and l[0] in ">@+":
                    nxt = l
                    break
                seq_chunks.append(l.strip())
            seq = "".join(seq_chunks)
            if nxt is not None and nxt[0] == "+":
                qual_chunks = []
                qlen = 0
                for l in lines:
                    qual_chunks.append(l)
                    qlen += len(l)
                    if qlen >= len(seq):
                        break
                qual = "".join(qual_chunks)
                if qlen >= len(seq):
                    yield name, seq, qual
                else:       # truncated file: degrade to a fasta record
                    yield name, seq, None
                    break
                header = None
                for l in lines:
                    if l and l[0] in ">@":
                        header = l
                        break
            else:
                yield name, seq, None
                header = nxt
    finally:
        if close:
            fh.close()


def write_fasta(path: str, records, sort: bool = False) -> None:
    """Write an iterable/dict of (acc, seq) as fasta, one line per sequence."""
    if hasattr(records, "items"):
        records = records.items()
    if sort:
        records = sorted(records)
    with open(path, "w") as fh:
        for acc, seq in records:
            fh.write(">{0}\n{1}\n".format(acc, seq))
