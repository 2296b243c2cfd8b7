"""Sequence-data-parallel System stepping: N independent VIO sequences, one
sliding-window solve per device, ONE sharded device program per round.

The reference scales to multiple sequences by running multiple processes
(one run_euroc per sequence); here the per-sequence host state machines stay
independent Python objects while their steady-state window solves batch into
a single pjit-sharded program over a `Mesh` axis — the packed single-buffer
call boundary (utils/packing.PackedFn) makes the batching trivial: stack the
(L,) float payloads into (N, L), vmap the packed program, shard the leading
axis (BASELINE sequence-parallel configs[4-5]).

Usage:
    ests = [Estimator(cfg, dims, solve_async=True) for _ in range(N)]
    for e in ests: e._defer_dispatch = True
    coord = MultiSequenceSolver(mesh)
    # per frame: feed imu/features to each estimator (process_image defers
    # its dispatch), then
    coord.step(ests)   # one sharded solve for all N, results installed
"""

from __future__ import annotations

import numpy as np
import jax

from ..utils import perf


class _SliceHandle:
    """Pending view of one sequence's row of the batched output."""

    def __init__(self, pfn, out, row):
        self._pfn = pfn
        self._out = out
        self._row = row

    def collect(self):
        return self._pfn._unpack(
            np.asarray(self._out, dtype=np.float64)[self._row])


class MultiSequenceSolver:
    def __init__(self, mesh, axis: str = "seq"):
        self.mesh = mesh
        self.axis = axis
        self._batched = None  # compiled per PackedFn identity
        self._batched_for = None

    def step(self, estimators) -> int:
        """Batch all deferred dispatches into one sharded solve and install
        every result (collect_solve per estimator). Estimators without a
        deferred pending (e.g. still initializing) are skipped — they run
        their own path. Returns the number of sequences solved in the
        batch."""
        pend = [
            (e, e._solve_pending) for e in estimators
            if e._solve_pending is not None and e._solve_pending["handle"] is None
        ]
        if not pend:
            for e in estimators:
                e.collect_solve()
            return 0
        pfn = pend[0][1]["pfn"]
        n = len(pend)
        nd = int(self.mesh.devices.size)
        rows = []
        for _, p in pend:
            # each estimator builds its own PackedFn; the batch only needs
            # structural identity (same packing layout + program shapes —
            # true for same-config sequences)
            q = p["pfn"]
            assert (
                q._specs == pfn._specs and q._out_specs == pfn._out_specs
                and q._single == pfn._single
            ), "mixed solve programs in one batch"
            fbuf, _, _ = q.pack(p["args"])
            rows.append(fbuf)
        # pad to a device multiple so the leading axis shards evenly
        n_pad = (-n) % nd
        for _ in range(n_pad):
            rows.append(rows[0])
        fbufs = np.stack(rows)
        if self._batched is None or self._batched_for is not pfn:
            self._batched = pfn.batched(self.mesh, self.axis)
            self._batched_for = pfn
        with perf.phase("mseq.batched_solve"):
            out = self._batched(fbufs)
            if hasattr(out, "copy_to_host_async"):
                out.copy_to_host_async()
        for row, (e, p) in enumerate(pend):
            p["handle"] = _SliceHandle(pfn, out, row)
            e.collect_solve()
        return n
