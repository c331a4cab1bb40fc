"""Import-only ``pysam`` stub.

The reference's isocon_get_candidates.py / isocon_statistical_test.py
import pysam at module scope but only touch it on the CCS/BAM flag
paths, which the fasta parity run never takes.  Any actual use raises.
"""


def __getattr__(name):  # PEP 562
    raise RuntimeError(
        "pysam stub: the reference parity run does not support BAM/CCS "
        "paths (attribute %r requested)" % name)
