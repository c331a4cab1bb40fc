"""Standalone tools (scripts/)."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return subprocess.run(
        [sys.executable] + args, capture_output=True, text=True, cwd=REPO,
        env=env,
    )


def test_cluster_to_fastq(tmp_path):
    reads = tmp_path / "reads.fq"
    reads.write_text("@r1\nACGT\n+\nIIII\n@r2\nGGTT\n+\nJJJJ\n@r3\nAAAA\n+\nKKKK\n")
    info = tmp_path / "cluster_info.tsv"
    info.write_text("r1\tc1\t4\t4\nr2\tc1\t4\t4\nr3\tc2\t4\t4\n")
    out = tmp_path / "clusters"
    r = run(["scripts/cluster_to_fastq.py", str(reads), str(info), str(out)])
    assert r.returncode == 0, r.stderr
    files = sorted(os.listdir(out))
    assert len(files) == 2
    c0 = (out / files[0]).read_text()
    assert "@r1" in c0 and "@r2" in c0


def test_estimate_read_depth():
    r = run(["scripts/estimate_read_depth.py", "--depths", "20", "50"])
    assert r.returncode == 0, r.stderr
    lines = [l for l in r.stdout.splitlines() if l and not l.startswith("depth")]
    assert len(lines) == 2
    for line in lines:
        depth, k = line.split("\t")
        assert int(k) >= 1


def test_ccs_bam_to_fastq(tmp_path):
    from isocon_tpu.io.bam import write_bam

    flnc = tmp_path / "flnc.fa"
    flnc.write_text(">m1/7/0_8_CCS strand=+;x=1\nACGTACGT\n")
    bam = tmp_path / "ccs.bam"
    write_bam(str(bam), [("m1/7/ccs", "GGACGTACGTTT", list(range(30, 42)),
                          {"np": 9})])
    out = tmp_path / "out.fq"
    r = run(["scripts/ccs_bam_to_fastq.py", str(flnc), str(bam), str(out)])
    assert r.returncode == 0, r.stderr
    content = out.read_text().splitlines()
    assert content[0].startswith("@m1/7/0_8_CCS")
    assert content[1] == "ACGTACGT"
    assert len(content[3]) == 8


def test_end_invariant_graph(tmp_path):
    """Standalone ends-ignored NN graph tool
    (end_invariant_functions.py:1067-1132)."""
    import random

    rng = random.Random(9)
    base = "".join(rng.choice("ACGT") for _ in range(200))
    # c2 = c1 with 5bp trimmed off one end (end-invariant), c3 distinct
    other = "".join(rng.choice("ACGT") for _ in range(200))
    cands = tmp_path / "cands.fa"
    cands.write_text(
        ">t1_support_10\n%s\n>t2_support_4\n%s\n>t3_support_7\n%s\n"
        % (base, base[5:], other)
    )
    out = tmp_path / "edges.tsv"
    r = run(["scripts/end_invariant_graph.py", str(cands), str(out)])
    assert r.returncode == 0, r.stderr
    rows = [l.split("\t") for l in out.read_text().splitlines()]
    pairs = {(a, b) for a, _s1, b, _s2, _ed in rows}
    assert ("t1_support_10", "t2_support_4") in pairs
    assert ("t2_support_4", "t1_support_10") in pairs
    assert not any("t3" in a or "t3" in b for a, b in pairs)
    assert "candidates after edge invariants: 2" in r.stdout
