"""Sharded execution of the DP kernels over a device mesh.

The pair axis (batch dimension B) is block-sharded across the mesh's
``pairs`` axis with ``shard_map``; each device runs the same wavefront
program on its shard, and per-query reductions merge with mesh collectives
(``jax.lax.pmin`` / ``psum``) -- the TPU-native replacement for the
reference's fork-and-merge dict updates
(``nearest_neighbor_graph.py:65-79``).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
import warnings

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    from jax.experimental.shard_map import shard_map

from ..ops.affine import banded_sg_align
from ..ops.wavefront import banded_ed


class Sharder:
    """Runs engine batches sharded over a 1-D device mesh.

    ``interpret`` threads through to the Pallas fast paths: on the CPU
    backend (tests, dryrun) the TPU kernels run in interpret mode, so the
    sharded pooled paths are exercised without hardware.
    """

    def __init__(self, mesh, interpret=None):
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.n = mesh.devices.size
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        self.interpret = interpret
        # multi-host: results are all-gathered INSIDE shard_map (one tiled
        # collective per call) so every process reads the full result
        # locally and the engine's host loops stay unchanged
        self.multihost = jax.process_count() > 1
        self._jits = {}  # (kind, static...) -> jitted sharded fn

    def replicated_sharding(self):
        """Placement for engine pools: replicated over the mesh, so every
        device gathers pair rows locally (the pool is small next to HBM and
        read-only within a round)."""
        from jax.sharding import NamedSharding

        return NamedSharding(self.mesh, P())

    def _outspec(self, batch_axis: int = 0):
        """Result layout: pair-axis sharded single-host, replicated (post
        all-gather) multi-host."""
        if self.multihost:
            return P()
        spec = [None] * (batch_axis + 1)
        spec[batch_axis] = self.axis
        return P(*spec)

    def _gather(self, out, batch_axis: int = 0):
        """Inside-shard_map merge matching ``_outspec``."""
        if self.multihost:
            return jax.lax.all_gather(out, self.axis, axis=batch_axis,
                                      tiled=True)
        return out

    def _shard_in(self, x):
        """Host numpy -> global array sharded on the pair axis (every
        process passes the full array; non-addressable shards are built
        with make_array_from_callback on multi-host)."""
        if not self.multihost:
            return x
        from jax.sharding import NamedSharding

        from .distributed import make_array_global

        return make_array_global(np.asarray(x),
                                 NamedSharding(self.mesh, P(self.axis)))

    def myers_ed_pool(self, pool_flat, plen, ia, ib, *, L: int, sub: int,
                      win: int = 7):
        """Pool-gather bit-parallel Myers ED, pair axis sharded over the
        mesh (pool replicated; only int32 indices are sharded)."""
        key = ("myers_pool", L, sub, win)
        fn = self._jits.get(key)
        if fn is None:
            from ..ops.myers_pallas import myers_ed_pool

            interp = self.interpret

            @functools.partial(
                shard_map, mesh=self.mesh,
                in_specs=(P(), P(), P(self.axis), P(self.axis)),
                out_specs=self._outspec(), check_rep=False,
            )
            def run(pf, pl_, ias, ibs):
                return self._gather(
                    myers_ed_pool(pf, pl_, ias, ibs, L=L, sub=sub,
                                  win=win, interpret=interp))

            fn = self._jits[key] = jax.jit(run)
        assert ia.shape[0] % self.n == 0
        return fn(pool_flat, plen, self._shard_in(ia), self._shard_in(ib))

    def myers_hw_pool(self, pool_flat, plen, ia, ib, *, L: int, sub: int,
                      win: int = 7):
        """Pool-gather HW-mode (infix) bit-parallel Myers, pair axis
        sharded over the mesh (the ends-ignored candidate graph's distance
        pass under a mesh)."""
        key = ("myers_hw_pool", L, sub, win)
        fn = self._jits.get(key)
        if fn is None:
            from ..ops.myers_pallas import myers_hw_pool

            interp = self.interpret

            @functools.partial(
                shard_map, mesh=self.mesh,
                in_specs=(P(), P(), P(self.axis), P(self.axis)),
                out_specs=(self._outspec(), self._outspec()),
                check_rep=False,
            )
            def run(pf, pl_, ias, ibs):
                ed, ej = myers_hw_pool(pf, pl_, ias, ibs, L=L, sub=sub,
                                       win=win, interpret=interp)
                return self._gather(ed), self._gather(ej)

            fn = self._jits[key] = jax.jit(run)
        assert ia.shape[0] % self.n == 0
        return fn(pool_flat, plen, self._shard_in(ia), self._shard_in(ib))

    def sg_align_pool(self, pool_flat, plen, ia, ib, ma, mi, go, ge,
                      *, Wp: int, L: int):
        """Pooled Pallas affine SG alignment (packed opcodes), pair axis
        sharded; per-shard batch must satisfy the kernel's B % 128 == 0."""
        key = ("affine_pool", Wp, L)
        fn = self._jits.get(key)
        if fn is None:
            from ..ops.affine_pallas_c import sg_align_pool_pallas_c

            interp = self.interpret

            @functools.partial(
                shard_map, mesh=self.mesh,
                in_specs=(P(), P()) + tuple([P(self.axis)] * 6),
                out_specs=(self._outspec(1), self._outspec(0)),
                check_rep=False,
            )
            def run(pf, pl_, ias, ibs, mas, mis, gos, ges):
                scal, packed = sg_align_pool_pallas_c(
                    pf, pl_, ias, ibs, mas, mis, gos, ges, Wp=Wp, L=L,
                    interpret=interp)
                return self._gather(scal, 1), self._gather(packed, 0)

            fn = self._jits[key] = jax.jit(run)
        assert ia.shape[0] % (128 * self.n) == 0
        return fn(pool_flat, plen, *(self._shard_in(x)
                                     for x in (ia, ib, ma, mi, go, ge)))

    def banded_ed_pool(self, pool_flat, plen, ia, ib, *, Wp: int, L: int,
                       hw_mode: bool = False, small: bool = False,
                       kernel: str = "scan"):
        """Pool-gather banded wavefront ED (HW mode + band-escalation
        widths), pair axis sharded over the mesh with the pool replicated —
        no host-assembled [B, L] planes cross the link on any sharded ED
        call (the engine's escalation path stays device-resident)."""
        key = ("wave_pool", Wp, L, hw_mode, small, kernel)
        fn = self._jits.get(key)
        if fn is None:
            from ..ops.wavefront import banded_ed_pool

            interp = self.interpret

            @functools.partial(
                shard_map, mesh=self.mesh,
                in_specs=(P(), P(), P(self.axis), P(self.axis)),
                out_specs=(self._outspec(), self._outspec()),
                check_rep=False,
            )
            def run(pf, pl_, ias, ibs):
                ed, ej = banded_ed_pool(pf, pl_, ias, ibs, Wp=Wp, L=L,
                                        hw_mode=hw_mode, small=small,
                                        kernel=kernel, interpret=interp)
                return self._gather(ed), self._gather(ej)

            fn = self._jits[key] = jax.jit(run)
        assert ia.shape[0] % self.n == 0
        return fn(pool_flat, plen, self._shard_in(ia), self._shard_in(ib))

    def _pad(self, arr, B_pad):
        if arr.shape[0] == B_pad:
            return arr
        pad = [(0, B_pad - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
        return np.pad(arr, pad, constant_values=arr.ravel()[-1] if arr.size else 0)

    def banded_ed(self, q, t, qlen, tlen, *, Wp: int, L: int,
                  hw_mode: bool = False, small: bool = False):
        B = q.shape[0]
        B_pad = -(-B // self.n) * self.n
        q, t = self._pad(q, B_pad), self._pad(t, B_pad)
        qlen, tlen = self._pad(qlen, B_pad), self._pad(tlen, B_pad)

        key = ("banded_ed", Wp, L, hw_mode, small)
        fn = self._jits.get(key)
        if fn is None:

            @functools.partial(
                shard_map,
                mesh=self.mesh,
                in_specs=(P(self.axis), P(self.axis), P(self.axis),
                          P(self.axis)),
                out_specs=(self._outspec(), self._outspec()),
                check_rep=False,
            )
            def run(qs, ts, qls, tls):
                ed, ej = banded_ed(qs, ts, qls, tls, Wp=Wp, L=L,
                                   hw_mode=hw_mode, small=small)
                return self._gather(ed), self._gather(ej)

            fn = self._jits[key] = jax.jit(run)
        ed, ej = fn(*(self._shard_in(x) for x in (q, t, qlen, tlen)))
        return np.asarray(ed)[:B], np.asarray(ej)[:B]

    def banded_sg_align(self, q, t, qlen, tlen, ma, mi, go, ge, *, Wp: int, L: int):
        B = q.shape[0]
        B_pad = -(-B // self.n) * self.n
        q, t = self._pad(q, B_pad), self._pad(t, B_pad)
        qlen, tlen = self._pad(qlen, B_pad), self._pad(tlen, B_pad)
        ma, mi = self._pad(ma, B_pad), self._pad(mi, B_pad)
        go, ge = self._pad(go, B_pad), self._pad(ge, B_pad)

        key = ("banded_sg_align", Wp, L)
        fn = self._jits.get(key)
        if fn is None:

            @functools.partial(
                shard_map,
                mesh=self.mesh,
                in_specs=tuple([P(self.axis)] * 8),
                out_specs=tuple([self._outspec()] * 4),
                check_rep=False,
            )
            def run(qs, ts, qls, tls, mas, mis, gos, ges):
                outs = banded_sg_align(qs, ts, qls, tls, mas, mis, gos, ges,
                                       Wp=Wp, L=L)
                return tuple(self._gather(o) for o in outs)

            fn = self._jits[key] = jax.jit(run)
        best, ei, ej, dirs = fn(*(self._shard_in(x) for x in
                                  (q, t, qlen, tlen, ma, mi, go, ge)))
        return (np.asarray(best)[:B], np.asarray(ei)[:B], np.asarray(ej)[:B],
                np.asarray(dirs)[:B])

    def sg_align_with_ops(self, q, t, qlen, tlen, ma, mi, go, ge, *, Wp: int,
                          L: int):
        from ..ops.affine import sg_align_with_ops

        B = q.shape[0]
        B_pad = -(-B // self.n) * self.n
        q, t = self._pad(q, B_pad), self._pad(t, B_pad)
        qlen, tlen = self._pad(qlen, B_pad), self._pad(tlen, B_pad)
        ma, mi = self._pad(ma, B_pad), self._pad(mi, B_pad)
        go, ge = self._pad(go, B_pad), self._pad(ge, B_pad)

        key = ("sg_align_with_ops", Wp, L)
        fn = self._jits.get(key)
        if fn is None:

            @functools.partial(
                shard_map,
                mesh=self.mesh,
                in_specs=tuple([P(self.axis)] * 8),
                out_specs=tuple([self._outspec()] * 7),
                check_rep=False,
            )
            def run(qs, ts, qls, tls, mas, mis, gos, ges):
                outs = sg_align_with_ops(qs, ts, qls, tls, mas, mis, gos,
                                         ges, Wp=Wp, L=L)
                return tuple(self._gather(o) for o in outs)

            fn = self._jits[key] = jax.jit(run)
        outs = fn(*(self._shard_in(x) for x in
                    (q, t, qlen, tlen, ma, mi, go, ge)))
        return tuple(np.asarray(o)[:B] for o in outs)


def nn_round_sharded_2d(mesh2d, seqs, lens, *, Wp: int, L: int):
    """2-D blocked all-pairs distance minima (SURVEY.md section 5): a
    ("rows", "cols") mesh tiles the pairwise matrix; device (i, j) computes
    banded EDs of its row-block against its column-block, reduces row
    minima locally, then merges across the "cols" axis with pmin and
    gathers row blocks across "rows".

    seqs: [N, L] int8 codes (replicated input); lens: [N] int32.
    Returns [N] int32 min positive ED per sequence (2^30 where none in
    band).
    """
    ax_r, ax_c = mesh2d.axis_names
    R = mesh2d.shape[ax_r]
    C = mesh2d.shape[ax_c]
    N = seqs.shape[0]
    assert N % (R * C) == 0, "pad N to a multiple of the mesh size"
    nr = N // R   # rows per row-block
    nc = N // C   # cols per col-block

    @functools.partial(
        shard_map,
        mesh=mesh2d,
        in_specs=(P(), P()),
        out_specs=P(ax_r),
        check_rep=False,
    )
    def run(all_seqs, all_lens):
        i = jax.lax.axis_index(ax_r)
        j = jax.lax.axis_index(ax_c)
        rows = jax.lax.dynamic_slice(all_seqs, (i * nr, 0), (nr, L))
        rlens = jax.lax.dynamic_slice(all_lens, (i * nr,), (nr,))
        cols = jax.lax.dynamic_slice(all_seqs, (j * nc, 0), (nc, L))
        clens = jax.lax.dynamic_slice(all_lens, (j * nc,), (nc,))
        # all row x col pairs of this tile
        q = jnp.repeat(rows, nc, axis=0)
        ql = jnp.repeat(rlens, nc)
        t = jnp.tile(cols, (nr, 1))
        tl = jnp.tile(clens, nr)
        ed, _ = banded_ed(q, t, ql, tl, Wp=Wp, L=L)
        # mask the self-diagonal (ed == 0 to itself)
        ed = jnp.where(ed <= 0, 2 ** 30, ed)
        local_min = jnp.min(ed.reshape(nr, nc), axis=1)
        return jax.lax.pmin(local_min, ax_c)

    return jax.jit(run)(seqs, lens)


def nn_round_sharded(mesh, q, t, qlen, tlen, query_ids, n_queries: int,
                     *, Wp: int, L: int):
    """One sharded NN-search round: pair-sharded banded EDs followed by a
    per-query min merged across devices with a ``pmin`` collective.

    This is the multi-chip "training step" analog of the framework: the
    blocked pair-distance computation plus the collective reduction that the
    reference performs as host-side dict merges
    (``nearest_neighbor_graph.py:75-79``).
    """
    axis = mesh.axis_names[0]

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_rep=False,
    )
    def run(qs, ts, qls, tls, qids):
        ed, _ = banded_ed(qs, ts, qls, tls, Wp=Wp, L=L)
        # local per-query min over this shard's pairs
        local = jnp.full((n_queries,), 2 ** 30, jnp.int32)
        local = local.at[qids].min(ed)
        # merge across devices over ICI
        return jax.lax.pmin(local, axis)

    return jax.jit(run)(q, t, qlen, tlen, query_ids)
