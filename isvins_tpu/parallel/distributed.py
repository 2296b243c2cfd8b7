"""Distributed pose-graph Gauss-Newton over a device mesh.

The scaling deliverable of SURVEY.md §2.3 / BASELINE configs[4]: the graph's
edges (sequential VIO edges, roll-pitch edges, loop edges) are sharded across
devices with `shard_map`; each device assembles the partial normal equations
for its edge shard, the global (6K, 6K) system is reduced with `lax.psum`
over the mesh (ICI collectives), and the replicated dense Cholesky solve +
state update run identically on every device. Gauss-Newton iterations stay
entirely on-device inside one jitted program — the host only launches it.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..factors.priors import relpose_residual_jacobians, rollpitch_residual_jacobians
from ..geom import quat_mul, quat_normalize, so3_exp_quat


def _edge_rows(tt, qq, e_i, e_j, e_dt, e_dq, e_sqrt, e_valid, K, dtype):
    """Relative-pose edges (generic: sequential or loop) -> local H, b."""
    D = 6 * K

    def one(k):
        i, j = e_i[k], e_j[k]
        r, Ji, Jj = relpose_residual_jacobians(
            e_dt[k], e_dq[k], tt[i], qq[i], tt[j], qq[j]
        )
        S = e_sqrt[k]
        m = e_valid[k].astype(dtype)
        return (S @ r) * m, (S @ Ji) * m, (S @ Jj) * m

    ks = jnp.arange(e_i.shape[0])
    r, Ji, Jj = jax.vmap(one)(ks)
    oh = lambda idx: jax.nn.one_hot(idx, K, dtype=dtype)
    expand = lambda Jb, o: jnp.einsum("nrk,nb->nrbk", Jb, o).reshape(
        Jb.shape[0], Jb.shape[1], D
    )
    J = expand(Ji, oh(e_i)) + expand(Jj, oh(e_j))
    Jf = J.reshape(-1, D)
    rf = r.reshape(-1)
    return Jf.T @ Jf, -(Jf.T @ rf), 0.5 * jnp.sum(rf * rf)


def _rp_rows(tt, qq, rp_i, rp_q, rp_sqrt, rp_valid, K, dtype):
    D = 6 * K

    def one(k):
        i = rp_i[k]
        r, J = rollpitch_residual_jacobians(rp_q[k], qq[i])
        S = rp_sqrt[k]
        m = rp_valid[k].astype(dtype)
        return (S @ r) * m, (S @ J) * m

    ks = jnp.arange(rp_i.shape[0])
    r, J = jax.vmap(one)(ks)
    oh = jax.nn.one_hot(rp_i, K, dtype=dtype)
    Jfull = jnp.einsum("nrk,nb->nrbk", J, oh).reshape(-1, D)
    rf = r.reshape(-1)
    return Jfull.T @ Jfull, -(Jfull.T @ rf), 0.5 * jnp.sum(rf * rf)


def distributed_pose_graph_solve(
    mesh: Mesh,
    t, q, active, fixed,  # (K,3), (K,4), (K,), (K,) — replicated
    e_i, e_j, e_dt, e_dq, e_sqrt, e_valid,  # (E,...) sharded over mesh
    rp_i, rp_q, rp_sqrt, rp_valid,  # (Krp,...) sharded
    iters: int = 10,
):
    """Run GN with edge-sharded Hessian assembly + psum reduction.
    E and Krp must be divisible by the mesh size (pad with invalid edges).
    Returns (t_opt, q_opt, cost)."""
    axis = mesh.axis_names[0]
    K = t.shape[0]
    D = 6 * K
    dtype = t.dtype

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(), P(), P(),
            P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
            P(axis), P(axis), P(axis), P(axis),
        ),
        out_specs=(P(), P(), P()),
    )
    def run(t, q, active, fixed, e_i, e_j, e_dt, e_dq, e_sqrt, e_valid,
            rp_i, rp_q, rp_sqrt, rp_valid):
        colmask = jnp.repeat(~fixed & active, 6).astype(dtype)

        def build(tt, qq):
            H1, b1, c1 = _edge_rows(
                tt, qq, e_i, e_j, e_dt, e_dq, e_sqrt, e_valid, K, dtype
            )
            H2, b2, c2 = _rp_rows(tt, qq, rp_i, rp_q, rp_sqrt, rp_valid, K, dtype)
            # reduce partial normal equations over the mesh (ICI collective)
            H = jax.lax.psum(H1 + H2, axis)
            b = jax.lax.psum(b1 + b2, axis)
            c = jax.lax.psum(c1 + c2, axis)
            H = H * colmask[:, None] * colmask[None, :] + jnp.diag(1.0 - colmask)
            b = b * colmask
            return H, b, c

        def step(_, tq):
            tt, qq = tq
            H, b, _ = build(tt, qq)
            dx = jax.scipy.linalg.cho_solve(
                (jnp.linalg.cholesky(H + 1e-8 * jnp.eye(D, dtype=dtype)), True), b
            )
            d = dx.reshape(K, 6)
            return tt + d[:, :3], quat_normalize(quat_mul(qq, so3_exp_quat(d[:, 3:])))

        t2, q2 = jax.lax.fori_loop(0, iters, step, (t, q))
        _, _, cost = build(t2, q2)
        return t2, q2, cost

    return run(t, q, active, fixed, e_i, e_j, e_dt, e_dq, e_sqrt, e_valid,
               rp_i, rp_q, rp_sqrt, rp_valid)
