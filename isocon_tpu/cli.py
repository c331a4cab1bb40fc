"""Command-line driver (the reference's ``IsoCon`` executable script).

Subcommands: ``pipeline``, ``get_candidates``, ``stat_filter``
(``IsoCon:183-250``), same flags and defaults.
"""
from __future__ import annotations

import argparse
import os
import re
import shutil
import sys
from time import time

import contextlib

from .io import read_fasta, read_fastx
from .io.output import devlog, logger, print_candidates
from .ops.engine import PairEngine
from .params import Params
from .pipeline.candidates import find_candidate_transcripts
from .pipeline.stat_filter import stat_filter_candidates

KEEP_FILES = {
    "logfile.txt",
    "candidates_converged.fa",
    "final_candidates.fa",
    "not_converged.fa",
    "cluster_info.tsv",
}


def clean_dir(params) -> None:
    """``IsoCon:52-65``."""
    for name in os.listdir(params.outfolder):
        if name in KEEP_FILES:
            continue
        path = os.path.join(params.outfolder, name)
        try:
            if os.path.isfile(path):
                os.unlink(path)
            elif os.path.isdir(path):
                shutil.rmtree(path)
        except Exception as e:  # pragma: no cover
            print(e)


def initialize_logger(params) -> None:
    params.logfile = open(os.path.join(params.outfolder, "logfile.txt"), "w")
    for key, value in vars(params).items():
        if key in ("logfile", "develop_logfile"):
            continue
        logger("{0}:\t\t\t {1}".format(key, value), params.logfile,
               timestamp=False)
    logger("Starting.", params.logfile)


def make_engine(params) -> PairEngine:
    """Build the pair engine; ``--devices N`` is the rebuild's analog of
    the reference's ``--nr_cores`` (``IsoCon:197``): it builds an N-device
    mesh and shards every kernel batch over it."""
    from .parallel.distributed import initialize_from_env

    multihost = initialize_from_env()  # no-op without ISOCON_COORDINATOR
    ndev = getattr(params, "devices", 1)
    if params.device_mesh is None and (ndev > 1 or ndev == -1 or multihost):
        if ndev == -1 or multihost:
            # --devices -1: the full global mesh (all devices of all
            # processes when launched under the multi-host seam)
            from .parallel.distributed import make_global_mesh

            params.device_mesh = make_global_mesh()
        else:
            from .parallel.mesh import make_mesh

            params.device_mesh = make_mesh(ndev)
    sharder = None
    if params.device_mesh is not None:
        from .parallel.sharding import Sharder

        sharder = Sharder(params.device_mesh)
    # Hermetic accelerator-path testing: ISOCON_USE_PALLAS=1 forces the
    # pooled Pallas kernels (with ISOCON_PALLAS_INTERPRET=1 running them
    # in interpret mode so the full accelerator code path exercises on a
    # CPU-only host -- how /verify drives kernel changes end-to-end).
    use_pallas = params.use_pallas
    if os.environ.get("ISOCON_USE_PALLAS") == "1":
        use_pallas = True
    return PairEngine(
        batch_pairs=params.batch_pairs, sharder=sharder,
        use_pallas=use_pallas,
        interpret=os.environ.get("ISOCON_PALLAS_INTERPRET") == "1")


@contextlib.contextmanager
def maybe_profile(params):
    """Capture a JAX profiler (xprof) trace of the run under --profile.

    The trace splits on-device kernel time from host/transfer time — the
    rebuild's structured analog of the reference's wall-clock phase timers
    (SURVEY.md §5 tracing row).  View with xprof/tensorboard.
    """
    if not getattr(params, "profile", False):
        yield
        return
    import jax

    trace_dir = os.path.join(params.outfolder, "jax_trace")
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger("JAX profiler trace written to {0}".format(trace_dir),
               params.logfile)


def run_pipeline(params) -> None:
    total_start = time()
    initialize_logger(params)
    params.read_file = params.fl_reads
    engine = make_engine(params)

    with maybe_profile(params):
        t0 = time()
        candidate_file, read_partition, to_realign = find_candidate_transcripts(
            params.read_file, params, engine
        )
        logger(
            "TIME ELAPSED FOR FINDING CANDIDATES WITH nearest_neighborS:{0}".format(
                time() - t0
            ),
            params.logfile,
        )
        logger(engine.stats_line(), params.logfile)
        devlog(params, "phase1 " + engine.stats_line())
        t1 = time()
        stat_filter_candidates(
            params.read_file, candidate_file, read_partition, to_realign,
            params, engine,
        )
        logger(
            "TIME ELAPSED FOR STATISTICAL TEST OF CANDIDATES:{0}".format(
                time() - t1),
            params.logfile,
        )
        logger(engine.stats_line(), params.logfile)
        devlog(params, "phase2 " + engine.stats_line())
    if params.cleanup:
        clean_dir(params)
    logger("TOTAL TIME ELAPSED FOR IsoCon:{0}".format(time() - total_start),
           params.logfile)


def run_get_candidates(params) -> None:
    total_start = time()
    initialize_logger(params)
    params.read_file = params.fl_reads
    engine = make_engine(params)
    with maybe_profile(params):
        find_candidate_transcripts(params.read_file, params, engine)
    devlog(params, "phase1 " + engine.stats_line())
    logger(
        "TOTAL TIME ELAPSED FOR nearest_neighbor APPROACH:{0}".format(
            time() - total_start
        ),
        params.logfile,
    )
    if params.cleanup:
        clean_dir(params)


def run_stat_filter(params) -> None:
    """``IsoCon:85-130``: user-supplied candidates are pre-filtered on the
    ``support_(\\d+)`` tag, everything is realigned from scratch."""
    total_start = time()
    initialize_logger(params)
    engine = make_engine(params)
    all_candidates = {acc: seq for acc, seq in read_fasta(params.candidates)}
    pre_path = os.path.join(params.outfolder, "preprocessed_candidates.fa")
    with open(pre_path, "w") as fh:
        for acc, seq in all_candidates.items():
            m = re.search(r"support_(\d+)", acc)
            if m and int(m.group(1)) < params.min_candidate_support:
                continue
            fh.write(">{0}\n{1}\n".format(acc, seq))
    params.candidates = pre_path

    if os.stat(params.candidates).st_size == 0:
        out = os.path.join(params.outfolder, "final_candidates.fa")
        print_candidates(out, {}, {}, {}, {}, final=True,
                         reads_to_consensus_tsv=os.path.join(
                             params.outfolder, "cluster_info.tsv"))
        print("Candidate file is empty!")
        sys.exit(0)

    if params.is_fastq:
        to_realign = {acc: seq for acc, seq, _q in read_fastx(params.fl_reads)}
    else:
        to_realign = {acc: seq for acc, seq in read_fasta(params.fl_reads)}
    read_partition = {acc: {} for acc, _ in read_fasta(params.candidates)}
    # phase 2 interns each read + candidate once per realignment round
    engine.reserve_pool_rows(2 * len(set(to_realign.values())))
    with maybe_profile(params):
        stat_filter_candidates(
            params.fl_reads, params.candidates, read_partition, to_realign,
            params, engine,
        )
    logger(engine.stats_line(), params.logfile)
    devlog(params, "stat_filter " + engine.stats_line())
    if params.cleanup:
        clean_dir(params)
    logger("TOTAL TIME ELAPSED FOR STAT_FILTER:{0}".format(time() - total_start),
           params.logfile)


def _add_common(p, with_stats: bool) -> None:
    p.add_argument("--nr_cores", type=int, default=16)
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--neighbor_search_depth", type=int, default=2 ** 32)
    p.add_argument("--min_exon_diff", type=int, default=20)
    p.add_argument("--min_candidate_support", type=int, default=2)
    p.add_argument("--ignore_ends_len", type=int, default=15)
    p.add_argument("--cleanup", action="store_true")
    p.add_argument("--batch_pairs", type=int, default=128,
                   help="pairs per device batch (TPU engine)")
    p.add_argument("--devices", type=int, default=1,
                   help="shard kernel batches over an N-device mesh "
                        "(the reference's --nr_cores analog); -1 = all "
                        "devices of all processes (multi-host: set "
                        "ISOCON_COORDINATOR/NUM_PROCESSES/PROCESS_ID)")
    p.add_argument("--nontargeted", action="store_true",
                   help="approximate sketch-retrieval candidate search "
                        "(the reference's minimap mode)")
    p.add_argument("--profile", action="store_true",
                   help="capture a JAX profiler (xprof) trace of the run "
                        "into <outfolder>/jax_trace")
    if with_stats:
        p.add_argument("--p_value_threshold", type=float, default=0.01)
        p.add_argument("--min_test_ratio", type=int, default=5)
        p.add_argument("--max_phred_q_trusted", type=int, default=43)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        "isocon_tpu",
        description="TPU-native consensus/isoform reconstruction from long "
        "noisy amplicon reads (capabilities of ksahlin/IsoCon).",
    )
    sub = parser.add_subparsers(dest="which")

    pipe = sub.add_parser("pipeline")
    pipe.add_argument("-fl_reads", required=True, type=str)
    pipe.add_argument("-outfolder", required=True, type=str)
    pipe.add_argument("--ccs", type=str)
    _add_common(pipe, with_stats=True)
    pipe.add_argument("--prefilter_candidates", action="store_true")

    getc = sub.add_parser("get_candidates")
    getc.add_argument("-fl_reads", required=True, type=str)
    getc.add_argument("-outfolder", required=True, type=str)
    _add_common(getc, with_stats=False)
    getc.add_argument("--prefilter_candidates", action="store_true")

    statf = sub.add_parser("stat_filter")
    statf.add_argument("-fl_reads", required=True, type=str)
    statf.add_argument("-candidates", required=True, type=str)
    statf.add_argument("-outfolder", required=True, type=str)
    statf.add_argument("--ccs", type=str)
    _add_common(statf, with_stats=True)
    return parser


def main(argv=None) -> None:
    parser = build_parser()
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])
    if not args.which:
        parser.print_help()
        sys.exit(1)

    try:
        open(args.fl_reads, "r").close()
    except IOError:
        sys.exit("couldn't find read file: " + args.fl_reads)

    if args.fl_reads[-1] == "q":
        is_fastq = True
    elif args.fl_reads[-1] == "a":
        is_fastq = False
    else:
        sys.exit(
            args.fl_reads + " must end in 'a' (fasta/fa) or 'q' (fastq/fq)."
        )

    fields = {k: v for k, v in vars(args).items() if k != "which"}
    params = Params(**fields, is_fastq=is_fastq)
    params.ensure_outfolder()

    if args.which == "pipeline":
        run_pipeline(params)
    elif args.which == "get_candidates":
        run_get_candidates(params)
    elif args.which == "stat_filter":
        run_stat_filter(params)


if __name__ == "__main__":
    main()
