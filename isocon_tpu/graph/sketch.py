"""Approximate candidate retrieval via hashed k-mer profiles on the MXU.

TPU-native equivalent of the reference's dormant minimap path
(``minimap_alignment_module.py:146-269`` + ``get_best_alignments.py:5-119``,
reachable only through ``graphs.construct_approximate_nearest_neighbor_graph
:85-149``): instead of shelling out to the minimap binary and parsing PAF,
every sequence becomes a hashed k-mer count profile and candidate scoring
is one [N, D] x [D, N] matmul -- exactly the shape the MXU wants.  The
score mirrors minimap's heap key ``n_shared_minimizers - (len_max -
len_min)`` (``minimap_alignment_module.py:52,115``): estimated shared
k-mers minus the length difference.  Top-scoring candidates then get exact
distances from the wavefront engine, keeping only the minima per query
(``get_best_alignments.py:22-33`` keeps edlib minima, then parasail minima;
with a single exact engine one pass suffices).
"""
from __future__ import annotations

import functools
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.encode import encode_seq

KMER = 8
DIM = 512
TOPN = 20  # matches minimap_alignment_module.py:52 (top-20 heap)


def kmer_profile(seq: str, dim: int = DIM, k: int = KMER) -> np.ndarray:
    """Hashed k-mer count vector (float32 [dim])."""
    codes = encode_seq(seq).astype(np.int64)
    if len(codes) < k:
        return np.zeros(dim, dtype=np.float32)
    # pack k consecutive 2-bit-ish codes into an integer key
    keys = np.zeros(len(codes) - k + 1, dtype=np.int64)
    for i in range(k):
        keys = keys * 5 + codes[i : len(codes) - k + 1 + i]
    # multiply-shift hash into dim buckets (uint64 wrap-around arithmetic)
    with np.errstate(over="ignore"):
        h = keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    buckets = ((h >> np.uint64(40)) % np.uint64(dim)).astype(np.int64)
    prof = np.zeros(dim, dtype=np.float32)
    np.add.at(prof, buckets, 1.0)
    return prof


@functools.partial(jax.jit, static_argnames=("topn",))
def _topn_scores(profiles, lens, topn: int):
    """shared-kmer estimate minus length difference; [N, topn] indices."""
    # min(count_a, count_b) summed approximates shared k-mers; a dot product
    # of sqrt-ed counts is a cheaper MXU-friendly surrogate with the same
    # ranking behavior for near-duplicate amplicons.
    p = jnp.sqrt(profiles)
    sims = jnp.dot(p, p.T, preferred_element_type=jnp.float32)
    ldiff = jnp.abs(lens[:, None] - lens[None, :]).astype(jnp.float32)
    scores = sims - ldiff
    n = profiles.shape[0]
    scores = scores - 10 ** 9 * jnp.eye(n, dtype=jnp.float32)
    vals, idx = jax.lax.top_k(scores, topn)
    return vals, idx


def approximate_matches(
    seqs: Sequence[str], topn: int = TOPN
) -> List[List[int]]:
    """Per sequence, the indices of its topn sketch-similar neighbors."""
    n = len(seqs)
    if n <= 1:
        return [[] for _ in seqs]
    profiles = np.stack([kmer_profile(s) for s in seqs])
    lens = np.array([len(s) for s in seqs], dtype=np.int32)
    k = min(topn, n - 1)
    _vals, idx = _topn_scores(jnp.asarray(profiles), jnp.asarray(lens), k)
    idx = np.asarray(idx)
    return [list(map(int, idx[i])) for i in range(n)]


def approximate_nn_graph(
    unique_seqs: Sequence[str],
    converged: Sequence[bool],
    engine,
    topn: int = TOPN,
    edge_min_threshold: int = -1,
    edge_max_threshold: int = 2 ** 30,
) -> List[Dict[int, int]]:
    """Approximate min-ED neighbor sets: sketch retrieval + exact rescoring.

    Same output shape as ``graph.nn.nearest_neighbors``; edges outside
    (edge_min_threshold, edge_max_threshold) are dropped and edges are
    inserted symmetrically, mirroring ``get_best_alignments.py:22-45``.
    """
    n = len(unique_seqs)
    cands = approximate_matches(unique_seqs, topn)
    ids = engine.add_seqs(unique_seqs)
    keys = []
    for i in range(n):
        if converged[i]:
            continue
        for j in cands[i]:
            keys.append((i, j))
    karr = (np.asarray(keys, dtype=np.int64).reshape(-1, 2)
            if keys else np.empty((0, 2), dtype=np.int64))
    eds, _ = engine.edit_distances_idx(ids[karr[:, 0]], ids[karr[:, 1]])

    best: List[Dict[int, int]] = [dict() for _ in range(n)]
    per_query: Dict[int, Dict[int, int]] = {}
    for (i, j), d in zip(keys, eds):
        if d <= edge_min_threshold or d > edge_max_threshold or d < 0:
            continue
        per_query.setdefault(i, {})[j] = int(d)
    for i, ds in per_query.items():
        if not ds:
            continue
        m = min(ds.values())
        for j, d in ds.items():
            if d == m:
                best[i][j] = d
                # symmetric insertion (get_best_alignments.py:27-33 inserts
                # the reverse edge when absent)
                if not converged[j]:
                    best[j].setdefault(i, d)
    return best
