#!/usr/bin/env python
"""Sync the runtime XLA compilation cache into the repo's bundled seed.

Run after exercising the pipeline + bench on the real device so a fresh
container (driver bench, CI) starts with every stable-bucket executable
already compiled.  Only the TPU backend is seeded (CPU AOT entries embed
host CPU features and are cheap to recompile; see
isocon_tpu/ops/engine.py:enable_compilation_cache).

The runtime cache accumulates stale entries whenever a kernel file
changes (old keys are never looked up again).  ``--used-since`` keeps the
seed minimal: an entry counts as live if it was read or written after the
given time -- on this relatime filesystem the first cache hit after a
write bumps atime, so "run the full workload sweep, then sync with
--used-since <sweep start>" ships exactly the entries the sweep touched.

Usage: python scripts/update_xla_seed.py [--prune] [--used-since EPOCH]
  --prune             delete seed entries no longer eligible
  --used-since EPOCH  only entries with max(atime, mtime) >= EPOCH
                      (seconds since epoch, e.g. $(date -d '1 hour ago' +%s))
"""
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNTIME = os.environ.get(
    "ISOCON_XLA_CACHE", os.path.expanduser("~/.cache/isocon_tpu_xla"))


def main() -> None:
    prune = "--prune" in sys.argv
    since = 0.0
    if "--used-since" in sys.argv:
        since = float(sys.argv[sys.argv.index("--used-since") + 1])
    for backend in ("tpu",):
        src = os.path.join(RUNTIME, backend)
        dst = os.path.join(REPO, "xla_seed", backend)
        if not os.path.isdir(src):
            print(f"{backend}: no runtime cache at {src}")
            continue
        os.makedirs(dst, exist_ok=True)
        names = set()
        for name in os.listdir(src):
            st = os.stat(os.path.join(src, name))
            if max(st.st_atime, st.st_mtime) >= since:
                names.add(name)
        copied = 0
        for name in names:
            d = os.path.join(dst, name)
            s = os.path.join(src, name)
            if not os.path.exists(d) or os.path.getmtime(s) > os.path.getmtime(d):
                shutil.copy2(s, d)
                copied += 1
        removed = 0
        if prune:
            for name in set(os.listdir(dst)) - names:
                os.remove(os.path.join(dst, name))
                removed += 1
        total = sum(
            os.path.getsize(os.path.join(dst, n)) for n in os.listdir(dst))
        print(f"{backend}: {copied} copied, {removed} pruned, "
              f"{len(os.listdir(dst))} entries, {total / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
