"""Isolate the linear-alignment scale failure: run alignment with every
combination of {SfM, GT} rotations/translations and {solved, true} gyro bias
on the loop-e2e init window."""

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

import isvins_tpu  # noqa: F401
from isvins_tpu.geom import mat_to_quat, quat_to_mat
from isvins_tpu.initial import linear_alignment, solve_gyroscope_bias
from isvins_tpu.estimator import vi_init

# reuse the pipeline bring-up from debug_init (it monkeypatches init; we
# re-patch with our own hook)
import debug_init  # noqa: F401  (executes the run; hook prints its own)
from debug_init import est, world, R_bc

B = est.dims.B
# NOTE: debug_init leaves the estimator past frame 12; the dissect hook was
# called at each init attempt. Window state here is post-attempt but the
# window contents are still a valid 10-frame problem; rebuild GT for it.
hdr = est.Headers.copy()
wf = [int(np.argmin(np.abs(world.frame_times - t))) for t in hdr]
R_bc_np = np.array(R_bc)
R_wb_gt = np.asarray(quat_to_mat(jnp.asarray(world.Q[wf])))
R_wc_gt = np.einsum("bij,jk->bik", R_wb_gt, R_bc_np)
t_wc_gt = world.P[wf]

l, R_rel, T_rel = vi_init.find_seed_pair(est)
ok, q_wc, t_wc, inv_dep = vi_init.global_sfm(est, l, R_rel, T_rel)
assert ok
R_wc = np.asarray(quat_to_mat(jnp.asarray(q_wc)))
R_body_sfm = np.einsum("bij,kj->bik", R_wc, R_bc_np)

# true scale factor between SfM translations and GT
num = np.array([np.linalg.norm(t_wc_gt[i] - t_wc_gt[l]) for i in range(B) if i != l])
den = np.array([np.linalg.norm(t_wc[i] - t_wc[l]) for i in range(B) if i != l])
s_true = (num / np.maximum(den, 1e-9)).mean()
print(f"window {wf}, seed l={l}, true scale ~{s_true:.3f}")


def pres_at(bg):
    est.Bgs[:] = np.asarray(bg)
    pre = est._imu_factors().pre
    out = [jax.tree_util.tree_map(lambda a: a[k], pre) for k in range(B - 1)]
    est.Bgs[:] = 0.0
    return out


bg_true = world.bg
dbg_sfm = np.asarray(solve_gyroscope_bias(R_body_sfm, pres_at(np.zeros(3))))
print("dbg from SfM rotations:", np.round(dbg_sfm, 4), " true:", bg_true)

# GT translations in "SfM scale" so expected s == s_true
t_gt_sfmscale = (t_wc_gt - t_wc_gt[l]) / s_true

cases = [
    ("SfM R, SfM T, bg=dbg_sfm", R_body_sfm, t_wc, dbg_sfm),
    ("SfM R, SfM T, bg=true", R_body_sfm, t_wc, bg_true),
    ("GT  R, SfM T, bg=true", R_wb_gt, t_wc, bg_true),
    ("SfM R, GT T, bg=true", R_body_sfm, t_gt_sfmscale, bg_true),
    ("GT  R, GT T, bg=true", R_wb_gt, t_gt_sfmscale, bg_true),
    ("GT  R, GT T, bg=dbg_sfm", R_wb_gt, t_gt_sfmscale, dbg_sfm),
]
for name, Rb, Tc, bg in cases:
    ok2, g, x = linear_alignment(Rb, Tc, pres_at(bg), np.zeros(3), 9.81007)
    s = float(x[-1])
    gt_g_caml = R_wc_gt[l].T @ np.array([0, 0, 9.81007])
    # g is expressed in the c0 frame of whatever gauge Tc/Rb imply; for the
    # SfM gauge that's cam-l. Print angle to the GT direction as a rough cue.
    cosang = g @ gt_g_caml / (np.linalg.norm(g) * np.linalg.norm(gt_g_caml) + 1e-12)
    print(f"{name:28s} ok={ok2} s={s:8.4f} (want {s_true:.3f}) "
          f"g_ang={np.degrees(np.arccos(np.clip(cosang, -1, 1))):6.2f} deg")
