"""Dev check: compacted-parity affine kernel vs the scan reference."""
import random
import sys

import numpy as np

sys.path.insert(0, ".")

from isocon_tpu.ops.affine import ops_to_alignment, sg_align_with_ops
from isocon_tpu.ops.affine_pallas_c import sg_align_with_ops_pallas_c
from isocon_tpu.ops.encode import pad_batch

sys.path.insert(0, "tests")
from test_affine_pallas_c import make_pairs

rng = random.Random(11)
B, L, Wp = 128, 256, 256
pairs = make_pairs(rng, B, L)
q, qlen = pad_batch([a for a, _ in pairs], L)
t, tlen = pad_batch([b for _, b in pairs], L)
ma = np.full(B, 2, np.int16)
mi = np.array([(-1, -2, -4)[i % 3] for i in range(B)], np.int16)
go = np.full(B, 2, np.int16)
ge = np.array([0, 1] * (B // 2), np.int16)

ref = sg_align_with_ops(q, t, qlen, tlen, ma, mi, go, ge, Wp=Wp, L=L)
got = sg_align_with_ops_pallas_c(q, t, qlen, tlen, ma, mi, go, ge,
                                 Wp=Wp, L=L, interpret=True)
r_best, r_ei, r_ej, r_ops, r_fi, r_fj, r_ov = [np.asarray(x) for x in ref]
g_best, g_ei, g_ej, g_ops, g_fi, g_fj, g_ov = [np.asarray(x) for x in got]

bad = 0
for name, rv, gv in (("ov", r_ov, g_ov), ("best", r_best, g_best),
                     ("ei", r_ei, g_ei), ("ej", r_ej, g_ej),
                     ("fi", r_fi, g_fi), ("fj", r_fj, g_fj)):
    ok = ~r_ov if name != "ov" else np.ones(B, bool)
    n = int((np.asarray(rv)[ok] != np.asarray(gv)[ok]).sum())
    if n:
        idx = np.nonzero((np.asarray(rv) != np.asarray(gv)) & ok)[0][:8]
        print(f"{name}: {n} mismatches, first idx {idx.tolist()}",
              [(int(np.asarray(rv)[i]), int(np.asarray(gv)[i]))
               for i in idx[:4]])
        bad += n
if not bad:
    nal = 0
    for i in range(B):
        if r_ov[i]:
            continue
        a, b = pairs[i]
        want = ops_to_alignment(r_ops[i], a, b, int(r_ei[i]), int(r_ej[i]),
                                int(r_fi[i]), int(r_fj[i]))
        have = ops_to_alignment(g_ops[i], a, b, int(g_ei[i]), int(g_ej[i]),
                                int(g_fi[i]), int(g_fj[i]))
        if have != want:
            print("alignment mismatch at", i)
            print(" want", want[0][:80], "/", want[1][:80])
            print(" have", have[0][:80], "/", have[1][:80])
            nal += 1
            if nal > 3:
                break
    print("alignment mismatches:", nal)
print("DONE bad=", bad)
