"""isocon_tpu — a TPU-native amplicon consensus engine.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
ksahlin/IsoCon (Sahlin et al., Nature Communications 9:4601, 2018):
reconstructing highly similar consensus sequences (transcript isoforms,
viral strains) from long noisy amplicon reads.

Layering (bottom up):

* ``ops``       — batched pairwise DP kernels (banded edit distance,
                  affine semi-global alignment with traceback) as
                  anti-diagonal wavefronts over padded int8 read tensors,
                  with Pallas TPU kernels and portable lax.scan versions.
* ``graph``     — nearest-neighbor graph search (k-escalation over
                  length-sorted windows), star partitioning, end-invariant
                  candidate collapse.
* ``correct``   — multi-alignment matrix + position frequency matrix +
                  majority-vote consensus correction.
* ``stats``     — variant extraction, per-read error probabilities and the
                  Raghavan weighted-Bernoulli p-value upper bound.
* ``pipeline``  — phase drivers: candidate generation (correction loop to
                  convergence) and statistical filtering to final candidates.
* ``parallel``  — device-mesh sharding of the pairwise work matrix.
* ``io``        — fasta/fastq/BAM ingestion and result writers.

The reference implementation being matched lives outside this repo and is
cited throughout as e.g. ``isocon_get_candidates.py:85`` (file:line in
ksahlin/IsoCon).
"""

__version__ = "0.1.0"
