"""Distributed (shard_map + psum) pose-graph solve on the 8-device virtual
CPU mesh vs the single-device optimizer."""

import numpy as np
import jax
import jax.numpy as jnp

import isvins_tpu  # noqa: F401
from isvins_tpu.parallel import make_mesh
from isvins_tpu.parallel.distributed import distributed_pose_graph_solve
from isvins_tpu.geom import quat_conj, quat_mul, quat_normalize, quat_rotate, mat_to_quat

from test_posegraph import _circle_kfs


def _drifted_loop_db(n=40):
    """KeyframeDB with a drifted circle, GT sequential edges, one loop edge —
    the same setting as test_pose_graph_optimize_closes_loop."""
    from isvins_tpu.posegraph import KeyframeDB

    t_gt, q_gt = _circle_kfs(n)
    db = KeyframeDB(64, 8, 8)
    drift_rate = 0.004
    for k in range(n):
        dyaw = drift_rate * k
        Rz = np.array([[np.cos(dyaw), -np.sin(dyaw), 0],
                       [np.sin(dyaw), np.cos(dyaw), 0], [0, 0, 1]])
        t_v = Rz @ t_gt[k] + np.array([0.002, 0.001, 0.0]) * k
        q_v = np.asarray(quat_normalize(quat_mul(
            jnp.asarray(mat_to_quat(jnp.asarray(Rz))), jnp.asarray(q_gt[k]))))
        db.add(ts=float(k), vio_t=t_v, vio_q=q_v, opt_t=t_v, opt_q=q_v)
    for k in range(n - 1):
        qi = jnp.asarray(q_gt[k])
        db.edge_dt[k] = np.asarray(quat_rotate(quat_conj(qi), jnp.asarray(t_gt[k + 1] - t_gt[k])))
        db.edge_dq[k] = np.asarray(quat_normalize(quat_mul(quat_conj(qi), jnp.asarray(q_gt[k + 1]))))
        db.edge_sqrt[k] = np.eye(6) * 30.0
        db.edge_valid[k] = True
    k = n - 1
    qi = jnp.asarray(q_gt[0])
    db.loop_idx[k] = 0
    db.loop_dt[k] = np.asarray(quat_rotate(quat_conj(qi), jnp.asarray(t_gt[k] - t_gt[0])))
    db.loop_dq[k] = np.asarray(quat_normalize(quat_mul(quat_conj(qi), jnp.asarray(q_gt[k]))))
    db.loop_weight[k] = 500.0
    return db, t_gt


def test_optimize_pose_graph_distributed_route_matches_dense():
    """The production router: the same graph solved by the dense single-device
    core and by the edge-sharded multi-device path must agree (poses and
    covariance blocks)."""
    from isvins_tpu.posegraph import optimize_pose_graph

    n = 40
    db_a, t_gt = _drifted_loop_db(n)
    db_b, _ = _drifted_loop_db(n)

    r_a, t_a, cost_a = optimize_pose_graph(db_a, 0, n - 1, iters=8,
                                           dist_min_poses=10**9)
    r_b, t_b, cost_b = optimize_pose_graph(db_b, 0, n - 1, iters=8,
                                           dist_min_poses=2)
    np.testing.assert_allclose(db_b.opt_t[:n], db_a.opt_t[:n], atol=1e-6)
    np.testing.assert_allclose(db_b.cov[:n], db_a.cov[:n], atol=1e-6)
    np.testing.assert_allclose(t_b, t_a, atol=1e-6)
    np.testing.assert_allclose(cost_b, cost_a, rtol=1e-6, atol=1e-9)
    # and both actually closed the loop
    err = np.linalg.norm(db_b.opt_t[:n] - t_gt, axis=1).max()
    assert err < 0.25, err


def test_keyframe_db_grows_past_capacity():
    from isvins_tpu.posegraph import KeyframeDB

    db = KeyframeDB(8, 4, 4)
    for k in range(20):
        db.add(ts=float(k), vio_t=np.array([k, 0.0, 0.0]),
               vio_q=np.array([1.0, 0, 0, 0]))
    assert db.n == 20 and db.K >= 20
    assert db.ts[19] == 19.0 and db.vio_t[7, 0] == 7.0
    # grown region carries well-formed defaults
    assert db.loop_idx[19] == -1
    assert db.seq[19] == 1
    np.testing.assert_array_equal(db.edge_dq[19], [1.0, 0, 0, 0])
    assert db.kp_desc.shape[0] == db.K


def test_distributed_pose_graph_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    n = 40
    t_gt, q_gt = _circle_kfs(n)
    rng = np.random.default_rng(3)

    # drifted initial values
    t_vio = t_gt + np.cumsum(rng.normal(size=(n, 3)) * 0.01, axis=0)
    q_vio = q_gt.copy()

    K = 64  # padded pose capacity
    t0 = np.zeros((K, 3)); t0[:n] = t_vio
    q0 = np.tile([1.0, 0, 0, 0], (K, 1)); q0[:n] = q_vio
    active = np.zeros(K, bool); active[:n] = True
    fixed = np.zeros(K, bool); fixed[0] = True

    # edges: sequential GT relatives + one loop, padded to a multiple of 8
    E = 64
    e_i = np.zeros(E, np.int32); e_j = np.ones(E, np.int32)
    e_dt = np.zeros((E, 3)); e_dq = np.tile([1.0, 0, 0, 0], (E, 1))
    e_sqrt = np.zeros((E, 6, 6)); e_valid = np.zeros(E, bool)
    for k in range(n - 1):
        qi = jnp.asarray(q_gt[k])
        e_i[k], e_j[k] = k, k + 1
        e_dt[k] = np.asarray(quat_rotate(quat_conj(qi), jnp.asarray(t_gt[k + 1] - t_gt[k])))
        e_dq[k] = np.asarray(quat_normalize(quat_mul(quat_conj(qi), jnp.asarray(q_gt[k + 1]))))
        e_sqrt[k] = np.eye(6) * 30.0
        e_valid[k] = True
    # loop edge last -> 0
    k = n - 1
    qi = jnp.asarray(q_gt[0])
    e_i[n - 1], e_j[n - 1] = 0, k
    e_dt[n - 1] = np.asarray(quat_rotate(quat_conj(qi), jnp.asarray(t_gt[k] - t_gt[0])))
    e_dq[n - 1] = np.asarray(quat_normalize(quat_mul(quat_conj(qi), jnp.asarray(q_gt[k]))))
    e_sqrt[n - 1] = np.eye(6) * 20.0
    e_valid[n - 1] = True

    Krp = 8
    rp_i = np.zeros(Krp, np.int32)
    rp_q = np.tile([1.0, 0, 0, 0], (Krp, 1))
    rp_sqrt = np.zeros((Krp, 2, 2))
    rp_valid = np.zeros(Krp, bool)

    mesh = make_mesh(8)
    t2, q2, cost = distributed_pose_graph_solve(
        mesh,
        jnp.asarray(t0), jnp.asarray(q0), jnp.asarray(active), jnp.asarray(fixed),
        jnp.asarray(e_i), jnp.asarray(e_j), jnp.asarray(e_dt), jnp.asarray(e_dq),
        jnp.asarray(e_sqrt), jnp.asarray(e_valid),
        jnp.asarray(rp_i), jnp.asarray(rp_q), jnp.asarray(rp_sqrt), jnp.asarray(rp_valid),
        iters=10,
    )
    t2 = np.asarray(t2)[:n]
    # the optimum is GT translated to the (drift-affected) fixed anchor
    t_opt = t_gt + (t_vio[0] - t_gt[0])
    err_before = np.linalg.norm(t_vio - t_opt, axis=1).max()
    err_after = np.linalg.norm(t2 - t_opt, axis=1).max()
    assert err_after < 0.1 * err_before, (err_before, err_after)
    assert np.isfinite(float(cost))

    # single-mesh (1 device) run must agree
    mesh1 = make_mesh(1)
    t2b, q2b, costb = distributed_pose_graph_solve(
        mesh1,
        jnp.asarray(t0), jnp.asarray(q0), jnp.asarray(active), jnp.asarray(fixed),
        jnp.asarray(e_i), jnp.asarray(e_j), jnp.asarray(e_dt), jnp.asarray(e_dq),
        jnp.asarray(e_sqrt), jnp.asarray(e_valid),
        jnp.asarray(rp_i), jnp.asarray(rp_q), jnp.asarray(rp_sqrt), jnp.asarray(rp_valid),
        iters=10,
    )
    np.testing.assert_allclose(np.asarray(t2b)[:n], t2, atol=1e-8)
    np.testing.assert_allclose(float(costb), float(cost), atol=1e-12)


def test_distributed_sharded_covariance_matches_single_device():
    """with_cov=True shards the H^{-1} block-column solves across the mesh
    (each device computes only its own poses' 6x6 diagonal blocks, then
    all_gathers); the result must equal the 1-device dense inverse."""
    rng = np.random.default_rng(7)
    K = 16
    E = 16
    t0 = np.cumsum(rng.normal(size=(K, 3)) * 0.05, axis=0)
    q0 = np.tile([1.0, 0, 0, 0], (K, 1))
    active = np.ones(K, bool)
    fixed = np.zeros(K, bool); fixed[0] = True
    e_i = np.minimum(np.arange(E), K - 2).astype(np.int32)
    e_j = e_i + 1
    e_dt = rng.normal(size=(E, 3)) * 0.05
    e_dq = np.tile([1.0, 0, 0, 0], (E, 1))
    e_sqrt = np.tile(np.eye(6)[None] * 15.0, (E, 1, 1))
    e_valid = np.ones(E, bool); e_valid[K - 1:] = False
    Krp = 16
    rp_i = (np.arange(Krp) % K).astype(np.int32)
    rp_q = np.tile([1.0, 0, 0, 0], (Krp, 1))
    rp_sqrt = np.tile(np.eye(2)[None] * 4.0, (Krp, 1, 1))
    rp_valid = np.ones(Krp, bool)

    args = (
        jnp.asarray(t0), jnp.asarray(q0), jnp.asarray(active), jnp.asarray(fixed),
        jnp.asarray(e_i), jnp.asarray(e_j), jnp.asarray(e_dt), jnp.asarray(e_dq),
        jnp.asarray(e_sqrt), jnp.asarray(e_valid),
        jnp.asarray(rp_i), jnp.asarray(rp_q), jnp.asarray(rp_sqrt),
        jnp.asarray(rp_valid),
    )
    t4, q4, cov4, c4 = distributed_pose_graph_solve(
        make_mesh(4), *args, iters=4, with_cov=True)
    t1, q1, cov1, c1 = distributed_pose_graph_solve(
        make_mesh(1), *args, iters=4, with_cov=True)
    np.testing.assert_allclose(np.asarray(t4), np.asarray(t1), atol=1e-9)
    np.testing.assert_allclose(np.asarray(cov4), np.asarray(cov1),
                               rtol=1e-7, atol=1e-12)
    assert np.asarray(cov4).shape == (K, 6, 6)
    # covariance must be symmetric PSD per block
    c = np.asarray(cov4)
    np.testing.assert_allclose(c, np.swapaxes(c, 1, 2), atol=1e-10)
    assert (np.linalg.eigvalsh(c) > -1e-12).all()


# ---------------------------------------------------------------- dd solver
def _dd_problem(rng, K=32, E=32, L=8):
    t0 = np.cumsum(rng.normal(size=(K, 3)) * 0.05, axis=0)
    q0 = np.tile([1.0, 0, 0, 0], (K, 1))
    active = np.ones(K, bool)
    fixed = np.zeros(K, bool); fixed[0] = True
    e_i = np.minimum(np.arange(E), K - 2).astype(np.int32)
    e_j = e_i + 1
    e_dt = rng.normal(size=(E, 3)) * 0.05
    e_dq = np.tile([1.0, 0, 0, 0], (E, 1))
    e_sqrt = np.tile(np.eye(6)[None] * 15.0, (E, 1, 1))
    e_valid = np.ones(E, bool); e_valid[K - 1:] = False
    rp_i = (np.arange(K) % K).astype(np.int32)
    rp_q = np.tile([1.0, 0, 0, 0], (K, 1))
    rp_sqrt = np.tile(np.eye(2)[None] * 4.0, (K, 1, 1))
    rp_valid = np.ones(K, bool)
    loop_i = rng.integers(0, K // 2, L).astype(np.int32)
    loop_j = rng.integers(K // 2, K - 1, L).astype(np.int32)
    loop_dt = rng.normal(size=(L, 3)) * 0.05
    loop_dq = np.tile([1.0, 0, 0, 0], (L, 1))
    loop_w = np.ones(L) * 100.0
    loop_valid = np.ones(L, bool)
    return tuple(map(jnp.asarray, (
        t0, q0, active, fixed, e_i, e_j, e_dt, e_dq, e_sqrt, e_valid,
        rp_i, rp_q, rp_sqrt, rp_valid,
        loop_i, loop_j, loop_dt, loop_dq, loop_w, loop_valid)))


def test_dd_solver_matches_dense_all_mesh_sizes():
    """The domain-decomposition solver is the exact Schur factorization of
    the dense path's H + eps*I: poses and covariances must agree with the
    dense (replicated-Cholesky) solver to roundoff at every mesh size."""
    from isvins_tpu.parallel.dd_solver import dd_pose_graph_solve

    args = _dd_problem(np.random.default_rng(7))
    t1, q1, cov1, c1 = distributed_pose_graph_solve(
        make_mesh(1), *args, iters=5, with_cov=True)
    for nd in (2, 4, 8):
        t2, q2, cov2, c2 = dd_pose_graph_solve(
            make_mesh(nd), *args, iters=5, with_cov=True)
        np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), atol=1e-10)
        np.testing.assert_allclose(np.asarray(q2), np.asarray(q1), atol=1e-10)
        # eps lands on gauge-fixed slots differently (identity vs 1/(1+eps));
        # everything else must match to ~roundoff
        np.testing.assert_allclose(np.asarray(cov2), np.asarray(cov1),
                                   rtol=1e-6, atol=2e-8)
        np.testing.assert_allclose(float(c2), float(c1), rtol=1e-12)


def test_dd_solver_no_loops_and_no_cov():
    """Loop-free graphs (interface = chain separators only) and the
    cov-free fast path."""
    from isvins_tpu.parallel.dd_solver import dd_pose_graph_solve

    args = _dd_problem(np.random.default_rng(3))[:14]  # drop loop args
    t1, q1, c1 = distributed_pose_graph_solve(make_mesh(1), *args, iters=4)
    t2, q2, c2 = dd_pose_graph_solve(make_mesh(4), *args, iters=4)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), atol=1e-10)
    np.testing.assert_allclose(float(c2), float(c1), rtol=1e-9, atol=1e-18)


def test_dd_solver_rejects_bad_mesh():
    from isvins_tpu.parallel.dd_solver import dd_pose_graph_solve
    import pytest

    args = _dd_problem(np.random.default_rng(1), K=30, E=30)
    with pytest.raises(ValueError):
        dd_pose_graph_solve(make_mesh(4), *args, iters=2)  # 30 % 4 != 0


def test_multi_sequence_solver_equivalent():
    """The multi-sequence coordinator (parallel/multi_seq.py) must produce
    the SAME states as each estimator dispatching its own solve: it only
    batches the identical packed programs into one mesh-sharded call
    (System-level sequence data parallelism, BASELINE configs[4-5])."""
    import numpy as np
    from isvins_tpu.config import WindowConfig, euroc_config
    from isvins_tpu.estimator.estimator import Estimator, MARGIN_OLD, NON_LINEAR
    from isvins_tpu.geom.hostmath import mat_to_quat_np
    from isvins_tpu.parallel import MultiSequenceSolver, make_mesh
    from isvins_tpu.solver import PriorState, WindowDims
    from isvins_tpu.utils.synthetic import make_world, project

    B, Vo, F, N = 10, 4, 64, 256
    R_bc = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    cfg = euroc_config().replace(
        window=WindowConfig(vo_size=Vo, all_size=B, max_features=F,
                            max_imu_per_frame=64),
        tic=(0.0, 0.0, 0.0), ric=tuple(map(tuple, R_bc)),
    )
    qic = mat_to_quat_np(R_bc)

    def build(seed):
        world = make_world(n_frames=B, n_landmarks=120, seed=seed)
        est = Estimator(cfg, WindowDims(B=B, Vo=Vo, F=F, N=N),
                        solve_async=True)
        est.Ps[:] = world.P
        est.Qs[:] = world.Q
        est.Vs[:] = world.V
        est.Headers[:] = world.frame_times
        est.imu_dt[1:] = world.imu_dts
        est.imu_acc[1:] = world.imu_accs
        est.imu_gyr[1:] = world.imu_gyrs
        est.imu_acc0[1:] = world.imu_acc0
        est.imu_gyr0[1:] = world.imu_gyr0
        est.imu_cnt[1:] = (world.imu_dts > 0).sum(axis=1)
        for k in range(B):
            pts, _, vis = project(world, k, np.zeros(3), qic)
            est.f_manager.add_features(k, np.where(vis)[0], pts[vis])
        est.frame_count = B - 1
        est.solver_flag = NON_LINEAR
        est.marginalization_flag = MARGIN_OLD
        est.priors = PriorState.empty(Vo)
        return est

    # reference: each estimator solo
    solo = []
    for s in (200, 201):
        e = build(s)
        e.dispatch_odometry()
        e.collect_solve()
        e.collect_marg()
        solo.append(e.Ps.copy())

    # batched through the coordinator
    ests = [build(s) for s in (200, 201)]
    for e in ests:
        e._defer_dispatch = True
        e.dispatch_odometry()
    coord = MultiSequenceSolver(make_mesh(2))
    n = coord.step(ests)
    assert n == 2
    for e, ref in zip(ests, solo):
        e.collect_marg()
        np.testing.assert_allclose(e.Ps, ref, atol=1e-5)  # f32 vmap reduction-order noise
        assert len(e.pose_graph_packets) == 1
