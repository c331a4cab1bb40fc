#!/usr/bin/env python
"""Sync the runtime XLA compilation cache into the repo's bundled seed.

Run after exercising the pipeline + bench on the real device so a fresh
container (driver bench, CI) starts with every stable-bucket executable
already compiled.  Only the TPU backend is seeded (CPU AOT entries embed
host CPU features and are cheap to recompile; see
isocon_tpu/ops/engine.py:enable_compilation_cache).

Usage: python scripts/update_xla_seed.py [--prune]
  --prune  delete seed entries no longer present in the runtime cache
"""
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNTIME = os.environ.get(
    "ISOCON_XLA_CACHE", os.path.expanduser("~/.cache/isocon_tpu_xla"))


def main() -> None:
    prune = "--prune" in sys.argv
    for backend in ("tpu",):
        src = os.path.join(RUNTIME, backend)
        dst = os.path.join(REPO, "xla_seed", backend)
        if not os.path.isdir(src):
            print(f"{backend}: no runtime cache at {src}")
            continue
        os.makedirs(dst, exist_ok=True)
        names = set(os.listdir(src))
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
