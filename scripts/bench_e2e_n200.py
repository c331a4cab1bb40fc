"""One-process n_200 end-to-end benchmark with per-run attribution.

Runs the full pipeline (the reference's CI workload,
``/root/reference/.travis.yml:22``) twice in ONE process -- a cold run
(first pipeline after jax+tunnel init) and a warm run (same process,
compiled executables and device pools already live) -- and prints a JSON
record that attributes the wall-clock instead of reporting a bare number:

  init_seconds           process start -> jax backend initialized
  cold/warm:
    wall_seconds         run_pipeline() call wall-clock
    phase1_seconds       logfile "TIME ELAPSED FOR FINDING CANDIDATES"
    phase2_seconds       logfile "TIME ELAPSED FOR STATISTICAL TEST"
    ed_pairs/ed_seconds/ed_calls          engine counters (final line)
    align_pairs/align_seconds/align_calls
    other_seconds        wall - ed - align = host graph/stats/IO work

A link stall shows up as ed/align seconds far above their pair counts'
known rates (or a huge init_seconds); a real regression shows up in
other_seconds or in the pair counts themselves.  This is the evidence
BENCH's e2e number needs to be trusted (VERDICT r3 weakness #1).
"""
from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

_T_PROC0 = time.perf_counter()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

READS = "/root/reference/test/data/simulated_pacbio_reads_n_200.fa"

_ENGINE_RE = re.compile(
    r"engine: (\d+) EDs in ([\d.]+)s \((\d+) calls(?:, max collect "
    r"([\d.]+)s)?\), (\d+) alignments in ([\d.]+)s \((\d+) calls\)"
)


def parse_logfile(path: str) -> dict:
    rec: dict = {}
    engine_lines = []
    with open(path) as fh:
        for line in fh:
            if "TIME ELAPSED FOR FINDING CANDIDATES" in line:
                rec["phase1_seconds"] = round(float(line.rsplit(":", 1)[1]), 2)
            elif "TIME ELAPSED FOR STATISTICAL TEST" in line:
                rec["phase2_seconds"] = round(float(line.rsplit(":", 1)[1]), 2)
            elif "TOTAL TIME ELAPSED" in line:
                rec["total_seconds"] = round(float(line.rsplit(":", 1)[1]), 2)
            m = _ENGINE_RE.search(line)
            if m:
                engine_lines.append(m)
    if engine_lines:
        m = engine_lines[-1]  # final line = cumulative totals
        rec["ed_pairs"] = int(m.group(1))
        rec["ed_seconds"] = float(m.group(2))
        rec["ed_calls"] = int(m.group(3))
        if m.group(4) is not None:
            rec["ed_max_collect_seconds"] = float(m.group(4))
        rec["align_pairs"] = int(m.group(5))
        rec["align_seconds"] = float(m.group(6))
        rec["align_calls"] = int(m.group(7))
    return rec


def run_once(outfolder: str) -> dict:
    from isocon_tpu import cli

    t0 = time.perf_counter()
    cli.main(["pipeline", "-fl_reads", READS, "-outfolder", outfolder])
    wall = time.perf_counter() - t0
    assert os.path.exists(os.path.join(outfolder, "final_candidates.fa"))
    rec = parse_logfile(os.path.join(outfolder, "logfile.txt"))
    rec["wall_seconds"] = round(wall, 2)
    if "ed_seconds" in rec and "align_seconds" in rec:
        rec["other_seconds"] = round(
            wall - rec["ed_seconds"] - rec["align_seconds"], 2)
    return rec


def main() -> None:
    import jax

    jax.devices()  # force backend/tunnel init so it lands in init_seconds
    init_seconds = time.perf_counter() - _T_PROC0
    out = {"init_seconds": round(init_seconds, 2),
           "backend": jax.default_backend()}
    for tag in ("cold", "warm"):
        d = tempfile.mkdtemp(prefix="isocon_e2e_%s_" % tag)
        try:
            out[tag] = run_once(d)
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
