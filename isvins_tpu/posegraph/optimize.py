"""Dense on-device pose-graph Gauss-Newton with per-pose covariance.

Replaces ceres SPARSE_NORMAL_CHOLESKY + ceres::Covariance
(pose_graph.cpp:260–351): for the active segment [first_looped..cur] the full
6K x 6K normal system is assembled from batched edge kernels (sequential
relative-pose edges, per-keyframe roll-pitch edges, Huber-weighted loop
edges) via one-hot einsum expansion, solved by dense Cholesky, and the
per-pose 6x6 covariance blocks are read off the dense inverse — on a TPU the
dense factorization of a few-thousand-dim system is MXU work and beats
sparse scalar pivoting by orders of magnitude.

Shapes are static per capacity bucket (power of two), masked to the active
count; the first pose is gauge-fixed like the reference (:299–302).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..factors.priors import relpose_residual_jacobians, rollpitch_residual_jacobians
from ..geom import quat_mul, quat_normalize, so3_exp_quat



def _atb(A, B):
    """A^T @ B via dot_general contracting dim 0 (no transpose materialized)."""
    return jax.lax.dot_general(
        A, B, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=A.dtype,
    )

def _huber_weight(r_norm_sq, delta: float):
    """sqrt of the IRLS weight for Huber loss rho(s) with s = ||r||^2."""
    r = jnp.sqrt(jnp.maximum(r_norm_sq, 1e-18))
    return jnp.sqrt(jnp.where(r <= delta, 1.0, delta / r))


@functools.partial(jax.jit, static_argnames=("K", "L", "iters"))
def _optimize_core(
    t, q, active,  # (K,3), (K,4), (K,) bool
    edge_dt, edge_dq, edge_sqrt, edge_valid,  # sequential k -> k+1
    rp_q, rp_sqrt, rp_valid,
    loop_i, loop_j, loop_dt, loop_dq, loop_w, loop_valid,  # (L,)
    fixed_mask,  # (K,) bool: gauge-fixed poses
    K: int, L: int, iters: int, huber_delta: float = 0.1,
):
    D = 6 * K
    dtype = t.dtype

    def build(tq, anneal=None):
        """anneal: None for the plain Huber(delta) weighting; else a scalar
        in (0,1] that RAISES each loop edge's Huber delta to
        max(delta, anneal * ||r_w||) — graduated non-convexity. With the
        reference's fixed Huber(0.1) on sqrt(w)-whitened loop residuals
        (pose_graph.cpp:271,335), a first loop closure that fires after
        meters of accumulated drift starts with ||r_w|| >> delta, its IRLS
        weight collapses to delta/||r_w||, and 10 GN iterations move the
        graph by <0.1% of the drift (measured on the loop e2e world:
        rmse_opt == rmse_vio to 4 digits). Annealing from the residual's own
        scale keeps the first iterations convex and recovers the robust
        estimator by the last iteration; false loops remain protected by the
        geometric verification gates AND the final-delta iterations."""
        tt, qq = tq

        # sequential edges k -> k+1
        def seq_edge(k):
            r, Ji, Jj = relpose_residual_jacobians(
                edge_dt[k], edge_dq[k], tt[k], qq[k], tt[k + 1], qq[k + 1]
            )
            S = edge_sqrt[k]
            m = (edge_valid[k] & active[k] & active[k + 1]).astype(dtype)
            return (S @ r) * m, (S @ Ji) * m, (S @ Jj) * m

        ks = jnp.arange(K - 1)
        r_s, Ji_s, Jj_s = jax.vmap(seq_edge)(ks)

        # roll-pitch edges
        def rp_edge(k):
            r, J = rollpitch_residual_jacobians(rp_q[k], qq[k])
            S = rp_sqrt[k]
            m = (rp_valid[k] & active[k]).astype(dtype)
            return (S @ r) * m, (S @ J) * m

        r_rp, J_rp = jax.vmap(rp_edge)(jnp.arange(K))

        # loop edges i(old) -> j(cur), sqrt_info = sqrt(w) I, Huber(0.1)
        def loop_edge(l):
            i, j = loop_i[l], loop_j[l]
            r, Ji, Jj = relpose_residual_jacobians(
                loop_dt[l], loop_dq[l], tt[i], qq[i], tt[j], qq[j]
            )
            s = jnp.sqrt(jnp.maximum(loop_w[l], 0.0))
            r_w = s * r
            rsq = jnp.sum(r_w * r_w)
            delta = huber_delta
            if anneal is not None:
                delta = jnp.maximum(delta, anneal * jnp.sqrt(rsq + 1e-18))
            hw = _huber_weight(rsq, delta)
            m = loop_valid[l].astype(dtype) * hw * s
            return r * m, Ji * m, Jj * m

        r_l, Ji_l, Jj_l = jax.vmap(loop_edge)(jnp.arange(L))

        # assemble H, b with one-hot expansion
        oh = lambda idx: jax.nn.one_hot(idx, K, dtype=dtype)

        def expand(Jb, onehot):
            out = jnp.einsum("nrk,nb->nrbk", Jb, onehot)
            return out.reshape(Jb.shape[0], Jb.shape[1], D)

        rows = []
        rows.append((r_s.reshape(-1), (expand(Ji_s, oh(ks)) + expand(Jj_s, oh(ks + 1))).reshape(-1, D)))
        rows.append((r_rp.reshape(-1), expand(J_rp, oh(jnp.arange(K))).reshape(-1, D)))
        rows.append((r_l.reshape(-1), (expand(Ji_l, oh(loop_i)) + expand(Jj_l, oh(loop_j))).reshape(-1, D)))
        J = jnp.concatenate([j for _, j in rows], axis=0)
        r = jnp.concatenate([rr for rr, _ in rows], axis=0)

        # gauge: zero columns of fixed poses
        colmask = jnp.repeat(~fixed_mask & active, 6).astype(dtype)
        J = J * colmask[None, :]
        H = _atb(J, J)
        b = -_atb(J, r)
        # unit diagonal for fixed/inactive dims so chol works
        H = H + jnp.diag(1.0 - colmask)
        cost = 0.5 * jnp.sum(r * r)
        return H, b, cost

    def step(i, tq):
        tt, qq = tq
        # GNC schedule: anneal 1.0 -> ~0 over the iterations, floored by the
        # plain delta inside build
        anneal = jnp.exp(-1.2 * i.astype(dtype))
        H, b, _ = build((tt, qq), anneal)
        Hd = H + 1e-8 * jnp.eye(D, dtype=dtype)
        dx = jax.scipy.linalg.cho_solve((jnp.linalg.cholesky(Hd), True), b)
        d = dx.reshape(K, 6)
        tt2 = tt + d[:, :3]
        qq2 = quat_normalize(quat_mul(qq, so3_exp_quat(d[:, 3:])))
        return tt2, qq2

    t2, q2 = jax.lax.fori_loop(0, iters, step, (t, q))
    # covariance at the solution: 6x6 diagonal blocks of H^{-1}
    H, _, cost = build((t2, q2))
    Hd = H + 1e-8 * jnp.eye(D, dtype=dtype)
    Hinv = jax.scipy.linalg.cho_solve(
        (jnp.linalg.cholesky(Hd), True), jnp.eye(D, dtype=dtype)
    )
    cov = Hinv.reshape(K, 6, K, 6)
    cov_blocks = jax.vmap(lambda k: cov[k, :, k, :])(jnp.arange(K))
    return t2, q2, cov_blocks, cost


def _next_pow2(n):
    # coarse capacity ladder, NOT per-pow2: every distinct (K, L) bucket is
    # a fresh multi-second XLA compile of the dense GN core, and a growing
    # pose graph used to walk 6+ buckets mid-stream (the 2-4 s frame-time
    # spikes of rounds 3-4 were exactly these compiles landing on the
    # streaming path). Two rungs cover a whole EuRoC-scale run and both are
    # prewarmable at startup; the masked padding costs only device FLOPs on
    # the (async) optimize path.
    for k in (64, 256, 1024, 4096):
        if n <= k:
            return k
    return 4096


class PendingOptimize:
    """A dispatched-but-not-collected pose-graph optimization (the TPU-native
    analogue of the reference's optimizeCS poll thread, pose_graph.cpp:425:
    the device computes while the host keeps streaming frames; results are
    applied with eventually-consistent drift semantics, :112–120).
    `finalize()` blocks on the device values (usually long since ready),
    writes opt poses/covariances/retro-updated edges back into the db, and
    returns (r_drift, t_drift, cost)."""

    def __init__(self, db, first_idx, cur_idx, n, t2, q2, cov, cost):
        self.db = db
        self.first_idx = first_idx
        self.cur_idx = cur_idx
        self._n = n
        self._t2, self._q2, self._cov, self._cost = t2, q2, cov, cost

    def finalize(self):
        from ..factors.priors import relpose_update_np
        from ..geom.hostmath import (mat_to_quat_np, quat_mul_np,
                                     quat_normalize_np, quat_to_mat_np)

        db, first_idx, cur_idx, n = self.db, self.first_idx, self.cur_idx, self._n
        t2 = np.array(self._t2)[:n]
        q2 = np.array(self._q2)[:n]
        cov = np.array(self._cov)[:n]
        if not (np.isfinite(t2).all() and np.isfinite(q2).all()):
            # a diverged solve must never poison the keyframe db (ceres
            # reports failure and the reference keeps streaming); keep the
            # previous optimized poses and drift
            import logging
            logging.getLogger(__name__).warning(
                "pose-graph optimization returned non-finite poses; "
                "discarding this solve (segment %d..%d)", first_idx, cur_idx)
            from ..geom.hostmath import quat_to_mat_np as _q2m
            r_keep = _q2m(db.opt_q[cur_idx]) @ _q2m(db.vio_q[cur_idx]).T
            t_keep = db.opt_t[cur_idx] - r_keep @ db.vio_t[cur_idx]
            return r_keep, t_keep, float("nan")
        sl = slice(first_idx, cur_idx + 1)

        # retro-update sequential edge measurements to the optimized poses
        # (numpy host twin: once per keyframe of the active segment per loop
        # closure — a jitted call per edge is a dispatch storm)
        for k in range(n - 1):
            gi = first_idx + k
            if not db.edge_valid[gi]:
                continue
            dt_new, dq_new = relpose_update_np(
                db.edge_dt[gi], db.edge_dq[gi],
                db.opt_t[gi], db.opt_q[gi],
                db.opt_t[gi + 1], db.opt_q[gi + 1],
                t2[k], q2[k],
                t2[k + 1], q2[k + 1],
            )
            db.edge_dt[gi] = dt_new
            db.edge_dq[gi] = dq_new

        db.opt_t[sl] = t2
        db.opt_q[sl] = q2
        db.cov[sl] = cov

        # drift: optimized vs vio pose of cur (pose_graph.cpp:386–394)
        R_cur = quat_to_mat_np(q2[-1])
        R_vio = quat_to_mat_np(db.vio_q[cur_idx])
        r_drift = R_cur @ R_vio.T
        t_drift = t2[-1] - r_drift @ db.vio_t[cur_idx]
        # re-apply the new drift to keyframes added after cur_idx (they were
        # written with the stale drift while this solve was in flight) —
        # the reference's trailing update loop, pose_graph.cpp:408–417
        q_drift = mat_to_quat_np(r_drift)
        for k in range(cur_idx + 1, db.n):
            db.opt_t[k] = r_drift @ db.vio_t[k] + t_drift
            db.opt_q[k] = quat_normalize_np(quat_mul_np(q_drift, db.vio_q[k]))
        return r_drift, t_drift, float(np.asarray(self._cost))


def optimize_pose_graph(db, first_idx: int, cur_idx: int, iters: int = 10,
                        dist_min_poses: int = 512, max_active: int = 4096,
                        async_dispatch: bool = False):
    """Optimize db poses [first_idx..cur_idx] in place (vio poses as initial
    values, first pose fixed), write optimized poses + covariances back, and
    return (r_drift (3,3), t_drift (3,), cost) — or, with
    `async_dispatch=True`, a PendingOptimize whose device values are still
    computing (call .finalize() later; the host stream keeps running in the
    meantime, like the reference's 2 s-poll optimizeCS thread).

    Mirrors optimizeCS (pose_graph.cpp:234–409) including the post-solve
    retro-update of sequential edge measurements and drift computation.

    Scaling: active segments with >= `dist_min_poses` poses are solved with
    the multi-device domain-decomposition path (`dd_pose_graph_solve`) when
    more than one device is available; segments longer than `max_active` are
    clamped to the most recent `max_active` poses (explicitly logged — the
    clamped head becomes the gauge; loops whose target falls before it are
    excluded for this solve)."""
    from ..geom.hostmath import mat_to_ypr_np, quat_to_mat_np

    n = cur_idx - first_idx + 1
    if n > max_active:
        import logging
        logging.getLogger(__name__).warning(
            "pose-graph active segment %d poses > max_active=%d; clamping to "
            "the most recent %d (older poses keep their current optimized "
            "values; loops ending before the clamp are excluded this solve)",
            n, max_active, max_active,
        )
        first_idx = cur_idx - max_active + 1
        n = max_active
    K = _next_pow2(n)
    sl = slice(first_idx, cur_idx + 1)

    t = np.zeros((K, 3))
    q = np.tile(np.array([1.0, 0, 0, 0]), (K, 1))
    t[:n] = db.vio_t[sl]
    q[:n] = db.vio_q[sl]
    active = np.zeros(K, bool)
    active[:n] = True
    fixed = np.zeros(K, bool)
    fixed[0] = True
    # poses of a loaded map (sequence 0) are held constant, like the
    # reference's `sequence == 0` gauge rule (pose_graph.cpp:299–302)
    fixed[:n] |= db.seq[sl] == 0

    edge_dt = np.zeros((K, 3))
    edge_dq = np.tile(np.array([1.0, 0, 0, 0]), (K, 1))
    edge_sqrt = np.zeros((K, 6, 6))
    edge_valid = np.zeros(K, bool)
    m = max(n - 1, 0)
    edge_dt[:m] = db.edge_dt[first_idx : first_idx + m]
    edge_dq[:m] = db.edge_dq[first_idx : first_idx + m]
    edge_sqrt[:m] = db.edge_sqrt[first_idx : first_idx + m]
    edge_valid[:m] = db.edge_valid[first_idx : first_idx + m]

    rp_q = np.tile(np.array([1.0, 0, 0, 0]), (K, 1))
    rp_sqrt = np.zeros((K, 2, 2))
    rp_valid = np.zeros(K, bool)
    rp_q[:n] = db.rp_q[sl]
    rp_sqrt[:n] = db.rp_sqrt[sl]
    rp_valid[:n] = db.rp_valid[sl]

    # loop edges among active kfs
    loops = [
        k for k in range(first_idx, cur_idx + 1)
        if db.loop_idx[k] >= first_idx and db.loop_idx[k] >= 0
    ]
    L = _next_pow2(max(len(loops), 1))
    loop_i = np.zeros(L, np.int32)
    loop_j = np.zeros(L, np.int32)
    loop_dt = np.zeros((L, 3))
    loop_dq = np.tile(np.array([1.0, 0, 0, 0]), (L, 1))
    loop_w = np.zeros(L)
    loop_valid = np.zeros(L, bool)
    for li, k in enumerate(loops):
        loop_i[li] = db.loop_idx[k] - first_idx
        loop_j[li] = k - first_idx
        loop_dt[li] = db.loop_dt[k]
        loop_dq[li] = db.loop_dq[k]
        loop_w[li] = db.loop_weight[k]
        loop_valid[li] = True

    # solve precision: f32 on accelerator backends (the dense 6K x 6K
    # factorization is MXU work; f64 on TPU is emulated and the estimator's
    # mixed-precision policy applies here too — position magnitudes are
    # O(100 m), f32 keeps ~1e-5 m of headroom), f64 on CPU
    sdtype = np.float64 if jax.default_backend() == "cpu" else np.float32
    t = t.astype(sdtype)
    q = q.astype(sdtype)
    edge_dt = edge_dt.astype(sdtype)
    edge_dq = edge_dq.astype(sdtype)
    edge_sqrt = edge_sqrt.astype(sdtype)
    rp_q = rp_q.astype(sdtype)
    rp_sqrt = rp_sqrt.astype(sdtype)
    loop_dt = loop_dt.astype(sdtype)
    loop_dq = loop_dq.astype(sdtype)
    loop_w = loop_w.astype(sdtype)

    n_dev = len(jax.devices())
    if n >= dist_min_poses and n_dev > 1:
        # domain-decomposition multi-device solve (parallel/dd_solver.py):
        # contiguous pose segments per device + a small replicated interface,
        # exact to the dense path but with all O(D^3) work device-local
        from ..parallel import make_mesh
        from ..parallel.dd_solver import dd_pose_graph_solve

        nd = 1 << (n_dev.bit_length() - 1)  # largest pow2 <= n_dev
        nd = min(nd, L, K // 4, 8)  # pow2: K, L, edge families shard evenly
        mesh = make_mesh(nd, axis="edges")
        e_i = np.minimum(np.arange(K, dtype=np.int32), K - 2)
        e_j = e_i + 1
        ev = np.zeros(K, bool)
        ev[: K - 1] = edge_valid[: K - 1] & active[: K - 1] & active[1:]
        t2, q2, cov, cost = dd_pose_graph_solve(
            mesh,
            jnp.asarray(t), jnp.asarray(q), jnp.asarray(active), jnp.asarray(fixed),
            jnp.asarray(e_i), jnp.asarray(e_j),
            jnp.asarray(np.concatenate([edge_dt[: K - 1], np.zeros((1, 3))])),
            jnp.asarray(np.concatenate([edge_dq[: K - 1], [[1.0, 0, 0, 0]]])),
            jnp.asarray(np.concatenate([edge_sqrt[: K - 1], np.zeros((1, 6, 6))])),
            jnp.asarray(ev),
            jnp.arange(K, dtype=jnp.int32), jnp.asarray(rp_q),
            jnp.asarray(rp_sqrt), jnp.asarray(rp_valid & active),
            jnp.asarray(loop_i), jnp.asarray(loop_j), jnp.asarray(loop_dt),
            jnp.asarray(loop_dq), jnp.asarray(loop_w), jnp.asarray(loop_valid),
            iters=iters, with_cov=True,
        )
    else:
        t2, q2, cov, cost = _optimize_core(
            jnp.asarray(t), jnp.asarray(q), jnp.asarray(active),
            jnp.asarray(edge_dt), jnp.asarray(edge_dq), jnp.asarray(edge_sqrt),
            jnp.asarray(edge_valid),
            jnp.asarray(rp_q), jnp.asarray(rp_sqrt), jnp.asarray(rp_valid),
            jnp.asarray(loop_i), jnp.asarray(loop_j), jnp.asarray(loop_dt),
            jnp.asarray(loop_dq), jnp.asarray(loop_w), jnp.asarray(loop_valid),
            jnp.asarray(fixed), K=K, L=L, iters=iters,
        )
    pending = PendingOptimize(db, first_idx, cur_idx, n, t2, q2, cov, cost)
    if async_dispatch:
        return pending
    return pending.finalize()
