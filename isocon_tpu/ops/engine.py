"""Host driver for the batched DP kernels.

Groups arbitrary pair lists into (padded-length, band-width) buckets, runs
the wavefront kernels in fixed-shape batches (so XLA compiles once per
bucket shape), certifies results with the band bound and escalates
uncertified pairs to wider bands -- the TPU analog of edlib's k-doubling.

This object replaces the reference's per-pair edlib fan-out over
``multiprocessing.Pool`` (``edlib_alignment_module.py:25-47``).
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

from . import oracle
from .encode import encode_seq
from .wavefront import banded_ed, band_certifies

_LEN_BUCKETS = [128, 256, 512, 1024, 1536, 2048, 3072, 4096, 6144, 8192]


def _len_bucket(n: int) -> int:
    for b in _LEN_BUCKETS:
        if n <= b:
            return b
    return int(2 ** math.ceil(math.log2(max(n, 1))))


class PairEngine:
    """Batched exact edit distances over explicit pair lists."""

    def __init__(self, batch_pairs: int = 256, w0: int = 128,
                 host_threshold: int = 0, sharder=None):
        self.batch_pairs = batch_pairs
        self.w0 = w0
        self.host_threshold = host_threshold  # pairs shorter than this -> numpy
        self.sharder = sharder  # optional parallel.Sharder for multi-device runs
        self._enc_cache: dict = {}

    def _enc(self, s: str) -> np.ndarray:
        e = self._enc_cache.get(s)
        if e is None:
            e = encode_seq(s)
            self._enc_cache[s] = e
        return e

    def clear_cache(self):
        self._enc_cache.clear()

    # ------------------------------------------------------------------
    def edit_distances(
        self,
        pairs: Sequence[Tuple[str, str]],
        k_cap: Optional[Sequence[int]] = None,
        hw_mode: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Exact (certified) edit distances for a list of string pairs.

        k_cap[i], when given, allows giving up on pair i once it is certain
        that ed > k_cap[i] (result then reported as -1, mirroring edlib's
        ``k`` cutoff contract).  Returns (ed[int32], end_j[int32]); end_j is
        only meaningful in hw_mode (exclusive end of the target span).
        """
        n_pairs = len(pairs)
        ed_out = np.full(n_pairs, -1, dtype=np.int32)
        ej_out = np.zeros(n_pairs, dtype=np.int32)
        if n_pairs == 0:
            return ed_out, ej_out
        caps = (
            np.asarray(k_cap, dtype=np.int64)
            if k_cap is not None
            else np.full(n_pairs, 2**31 - 1, dtype=np.int64)
        )

        todo = list(range(n_pairs))
        # trivial / host-sized pairs
        rest = []
        for i in todo:
            a, b = pairs[i]
            if not hw_mode and abs(len(a) - len(b)) > caps[i]:
                ed_out[i] = -1  # ed >= |len difference| > cap
            elif len(a) == 0 or len(b) == 0:
                d = max(len(a), len(b))
                ed_out[i] = d if d <= caps[i] else -1
                ej_out[i] = 0 if hw_mode else len(b)
                if hw_mode and len(a) == 0:
                    ed_out[i] = 0
            elif max(len(a), len(b)) <= self.host_threshold:
                if hw_mode:
                    d, s0, e0, _ = oracle.edit_distance_hw(a, b)
                    ed_out[i] = d if d <= caps[i] else -1
                    ej_out[i] = e0 + 1
                else:
                    d = oracle.edit_distance(a, b)
                    ed_out[i] = d if d <= caps[i] else -1
                    ej_out[i] = len(b)
            else:
                rest.append(i)

        Wp = self.w0
        while rest:
            next_round: List[int] = []
            # bucket by padded length
            buckets: dict = {}
            for i in rest:
                a, b = pairs[i]
                Lb = _len_bucket(max(len(a), len(b)))
                buckets.setdefault(Lb, []).append(i)
            for Lb, idxs in sorted(buckets.items()):
                for s in range(0, len(idxs), self.batch_pairs):
                    chunk = idxs[s : s + self.batch_pairs]
                    ed, ej, cert = self._run_batch(pairs, chunk, Lb, Wp, hw_mode)
                    for pos, i in enumerate(chunk):
                        if cert[pos]:
                            d = int(ed[pos])
                            ed_out[i] = d if d <= caps[i] else -1
                            ej_out[i] = int(ej[pos])
                        else:
                            # Uncertified => true ed exceeds the certified
                            # floor of this band; give up early when that
                            # already clears the caller's cutoff.
                            a, b = pairs[i]
                            floor = self._certified_floor(len(a), len(b), Wp,
                                                          hw_mode)
                            if floor >= caps[i]:
                                ed_out[i] = -1
                            else:
                                next_round.append(i)
            rest = next_round
            Wp *= 2
            if Wp > 4 * max(
                _len_bucket(max(len(pairs[i][0]), len(pairs[i][1]))) for i in range(n_pairs)
            ) + 256:
                raise RuntimeError("band escalation failed to terminate")
        return ed_out, ej_out

    @staticmethod
    def _certified_floor(n: int, m: int, Wp: int, hw_mode: bool) -> int:
        """Largest v such that any true distance <= v would have been
        certified by a band of width Wp (so an uncertified result implies
        ed > this floor)."""
        o_lo = -(Wp // 2 - 1)
        o_hi = o_lo + Wp - 1
        delta = m - n
        if hw_mode:
            return min(-o_lo, (o_hi - max(delta, 0)) // 2)
        if delta > o_hi or delta < o_lo:
            return -1
        return min(2 * o_hi - delta, -2 * o_lo + delta)

    def _run_batch(self, pairs, chunk, Lb, Wp, hw_mode):
        B = len(chunk)
        q = np.full((B, Lb), 5, dtype=np.int8)
        t = np.full((B, Lb), 6, dtype=np.int8)
        qlen = np.zeros(B, dtype=np.int32)
        tlen = np.zeros(B, dtype=np.int32)
        for pos, i in enumerate(chunk):
            a, b = pairs[i]
            ea, eb = self._enc(a), self._enc(b)
            q[pos, : len(ea)] = ea
            t[pos, : len(eb)] = eb
            qlen[pos] = len(ea)
            tlen[pos] = len(eb)
        # pad batch to full size for shape stability
        Bp = self.batch_pairs
        if B < Bp:
            q = np.pad(q, ((0, Bp - B), (0, 0)), constant_values=5)
            t = np.pad(t, ((0, Bp - B), (0, 0)), constant_values=6)
            qlen = np.pad(qlen, (0, Bp - B), constant_values=1)
            tlen = np.pad(tlen, (0, Bp - B), constant_values=1)
        if self.sharder is not None:
            ed, ej = self.sharder.banded_ed(q, t, qlen, tlen, Wp=Wp, L=Lb,
                                            hw_mode=hw_mode)
        else:
            ed, ej = banded_ed(q, t, qlen, tlen, Wp=Wp, L=Lb, hw_mode=hw_mode)
        ed = np.asarray(ed)[:B]
        ej = np.asarray(ej)[:B]
        cert = band_certifies(ed, qlen[:B], tlen[:B], Wp, hw_mode=hw_mode)
        return ed, ej, cert
