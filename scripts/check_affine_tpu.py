"""Real-TPU correctness check of the pooled affine path vs the oracle.

Runs the engine's pallas1 path on mixed-length mutated pairs and compares
every alignment triple to the numpy oracle engine (native CPU path).
Usage: python scripts/check_affine_tpu.py [n_pairs]
"""
import random
import sys

sys.path.insert(0, ".")

import numpy as np

n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 200

import jax

from isocon_tpu.ops.engine import PairEngine

print("backend:", jax.default_backend())
rng = random.Random(42)


def rand_seq(n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def mutate(s, k):
    s = list(s)
    for _ in range(k):
        op = rng.choice("SID")
        p = rng.randrange(len(s))
        if op == "S":
            s[p] = rng.choice("ACGT")
        elif op == "I":
            s.insert(p, rng.choice("ACGT"))
        elif len(s) > 1:
            del s[p]
    return "".join(s)


pairs = []
for _ in range(n_pairs):
    ln = rng.choice([150, 300, 700, 1500, 1900])
    a = rand_seq(ln)
    b = mutate(a, rng.randrange(0, max(2, ln // 40)))
    pairs.append((a, b))
scores = [(2, -2, 2, 0) if rng.random() < 0.5 else (2, -3, 3, 1)
          for _ in pairs]

fast = PairEngine(batch_pairs=512)      # auto: pallas on TPU
assert fast.use_pallas, "expected the pallas path on this backend"
import os
os.environ["ISOCON_NO_NATIVE"] = ""     # oracle engine: native CPU kernels
from isocon_tpu.ops import oracle

eds_f, _ = fast.edit_distances(pairs)
al_f = fast.align_pairs(pairs, scores, ed_hint=eds_f)

bad = 0
for i, (a, b) in enumerate(pairs):
    ma, mi, go, ge = scores[i]
    want = oracle.align_semi_global(a, b, ma, -abs(mi), go, ge)
    want_ed = oracle.edit_distance(a, b)
    if eds_f[i] != want_ed:
        bad += 1
        print("ED MISMATCH", i, eds_f[i], want_ed)
    if al_f[i] != want:
        bad += 1
        print("ALIGN MISMATCH", i, len(a), len(b))
        if bad > 5:
            break
print("checked %d pairs, %d mismatches" % (n_pairs, bad))
sys.exit(1 if bad else 0)
