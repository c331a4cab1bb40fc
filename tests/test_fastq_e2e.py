"""Fastq end-to-end: the quality-value statistical path through `pipeline`.

The reference builds CCS records straight from fastq qualities when the
input is .fq (``isocon_statistical_test.py:177-189``) and then scores
variants with per-base quality probabilities instead of the empirical
error profile.  This drives a synthetic .fq with crafted qualities
through the full CLI and asserts (a) the true isoforms are reconstructed
and (b) the quality path -- not the empirical path -- was taken.
"""
import os
import random

from isocon_tpu.cli import main as cli_main
from isocon_tpu.io import read_fasta
from isocon_tpu.stats import variants as V

from test_pipeline_e2e import noisy_copy, rand_seq


def test_fastq_pipeline_uses_quality_path(tmp_path, monkeypatch):
    rng = random.Random(17)
    base = rand_seq(rng, 300)
    iso_a = base
    bl = list(base)
    for pos in (40, 150, 260):
        bl[pos] = {"A": "C", "C": "G", "G": "T", "T": "A"}[bl[pos]]
    iso_b = "".join(bl)

    read_file = str(tmp_path / "reads.fq")
    with open(read_file, "w") as fh:
        for tag, iso in (("a", iso_a), ("b", iso_b)):
            for i in range(14):
                seq = noisy_copy(rng, iso, 0.01)
                # crafted qualities: mostly high, sprinkled mid-range so
                # the per-base probabilities are non-degenerate
                qual = "".join(
                    chr(33 + rng.choice((20, 30, 40))) for _ in seq
                )
                fh.write("@read_%s_%d\n%s\n+\n%s\n" % (tag, i, seq, qual))

    calls = {"quality": 0, "empirical": 0}
    real_c = V.get_read_ccs_probabilities_c
    real_t = V.get_read_ccs_probabilities_t
    real_emp = V.get_empirical_error_probabilities

    def spy_c(*a, **kw):
        calls["quality"] += 1
        return real_c(*a, **kw)

    def spy_t(*a, **kw):
        calls["quality"] += 1
        return real_t(*a, **kw)

    def spy_emp(*a, **kw):
        calls["empirical"] += 1
        return real_emp(*a, **kw)

    monkeypatch.setattr(V, "get_read_ccs_probabilities_c", spy_c)
    monkeypatch.setattr(V, "get_read_ccs_probabilities_t", spy_t)
    monkeypatch.setattr(V, "get_empirical_error_probabilities", spy_emp)

    out = str(tmp_path / "out")
    cli_main([
        "pipeline", "-fl_reads", read_file, "-outfolder", out,
        "--batch_pairs", "32",
    ])

    final = os.path.join(out, "final_candidates.fa")
    assert os.path.exists(final)
    cands = {seq for _acc, seq in read_fasta(final)}
    assert iso_a in cands and iso_b in cands, (
        "true isoforms not reconstructed from fastq; got %d" % len(cands)
    )
    assert len(cands) == 2
    # the statistical tests must have scored variants through the
    # fastq-derived CCS qualities, never the empirical fallback
    assert calls["quality"] > 0, "quality-value path never taken"
    assert calls["empirical"] == 0, "empirical path used despite fastq input"
