"""Visual-update measurement model: builds (H, f, y) for one feature track.

Port of prepareVisualUpdate (reference: src/odometry/triangulation.cpp:897-998)
redesigned around autodiff: the measurement function

    h(poses, sft) = project_all(poses, triangulate(poses, feats + sft*vels))
                    - sft * vels

is written once and jax.jacfwd produces the full Jacobian — including the
chain through the triangulation (the reference propagates those sensitivities
by hand through every Gauss-Newton step) and the IMU-camera time-shift column
(reference: H SFT column = dip*R*dpfdt - velocity).

Everything is fixed-shape: a track over n <= N poses uses (N, ...) arrays plus
a validity mask; masked rows produce zero H rows / residuals, which leave the
EKF update unchanged (see ekf.update.visual_track_update).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ekf.state import CAM, ORI, POS, POSE_DIM, SFT
from .triangulation import (
    TRI_BAD_COND, TRI_HYBRID, TRI_OK, CameraPoses, camera_poses_from_states,
    triangulate_gn, triangulate_linear, triangulate_stereo_fused,
)

PREPARE_VU_OK = 0
PREPARE_VU_BEHIND = 1
PREPARE_VU_ZERO_DEPTH = 2


class TrackUpdateData(NamedTuple):
    H: jnp.ndarray  # (rows, d) full-width Jacobian, masked rows zero
    f: jnp.ndarray  # (rows,) predicted measurements
    y: jnp.ndarray  # (rows,) measured (tracker) values
    row_mask: jnp.ndarray  # (rows,) bool
    tri_status: jnp.ndarray  # () int32 triangulation status
    prepare_status: jnp.ndarray  # () int32
    pf: jnp.ndarray  # (3,) triangulated world point


def state_col_offsets(trail_index):
    """(pos_offset, ori_offset) state-column offsets for trail index i, where
    0 = current pose and i>0 = historical pose i-1
    (reference: getPosOriIndices, triangulation.cpp:1000+)."""
    pos = jnp.where(trail_index == 0, POS, CAM + POSE_DIM * (trail_index - 1))
    ori = jnp.where(trail_index == 0, ORI, CAM + POSE_DIM * (trail_index - 1) + 3)
    return pos, ori


def _project_idp(poses: CameraPoses, pf):
    """Normalized-plane projections of world point pf in each pose: (N,2),
    plus depth (N,)."""
    pfc = jnp.einsum("nij,nj->ni", poses.R, pf[None, :] - poses.p)
    z = pfc[:, 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-12, z, 1.0)
    return pfc[:, :2] / safe_z[:, None], z


def make_prepare_track_update(po, imu_to_camera, second_imu_to_camera, use_stereo, d, dtype=jnp.float64):
    """Build prepare_track_update(pose_states, trail_index, ips, vels, mask,
    [map_point, map_point_offset]) -> TrackUpdateData.

    Static args: parameters po, 4x4 extrinsics, stereo flag, state dim d.

    Inputs per track (N = max poses per track):
      pose_states: (N,7) gathered EKF pose states [pos,quat], row j for trail
        index trail_index[j]; masked rows must hold a valid-ish pose (e.g. the
        current pose) to keep the math finite.
      trail_index: (N,) int32 trail indices (0 = current pose).
      ips: (C*N, 2) normalized image points, left camera rows then right.
      vels: (C*N, 2) feature velocities (for time-shift estimation).
      mask: (N,) pose validity.
      map_point / map_point_offset: optional hybrid-SLAM map point (world) and
        its state offset; when offset >= 0 the point is NOT triangulated and H
        gets the d proj/d pf block at the map-point columns
        (reference: backend.cpp:1076-1090, triangulation.cpp:984-987).
    """
    i2c = jnp.asarray(imu_to_camera, dtype=dtype)
    i2c2 = jnp.asarray(second_imu_to_camera, dtype=dtype)
    est_sft = bool(po.estimateImuCameraTimeShift)
    n_cams = 2 if use_stereo else 1
    # information-weighted fusion of per-pose pre-triangulated stereo
    # features instead of GN (reference: useIndependentStereoTriangulation
    # -> triangulateStereo, triangulation.cpp:137-138,409-608)
    use_indep_stereo = use_stereo and bool(po.useIndependentStereoTriangulation)

    def trail_from_states(pose_states):
        trail0 = camera_poses_from_states(pose_states, i2c)
        if use_stereo:
            trail1 = camera_poses_from_states(pose_states, i2c2)
            return CameraPoses(
                p=jnp.concatenate([trail0.p, trail1.p], axis=0),
                R=jnp.concatenate([trail0.R, trail1.R], axis=0),
            )
        return trail0

    def triangulate(pose_states, feats, mask):
        trail = trail_from_states(pose_states)
        full_mask = jnp.tile(mask, n_cams)
        if po.useLinearTriangulation:
            return triangulate_linear(trail, feats, full_mask)
        # f32 floor on the conditioning gate: the reference's 1e-8 default is
        # tuned for f64; in f32 a system with rcond ~1e-7 solves to garbage
        # depth that still reprojects well, so it must be rejected by
        # conditioning (measured: mono ATE 0.005 -> 0.13+ without this)
        rcond_thr = po.triangulationRcondThreshold
        if feats.dtype == jnp.float32:
            rcond_thr = max(rcond_thr, 1e-5)
        return triangulate_gn(
            trail,
            feats,
            full_mask,
            gn_iterations=int(po.triangulationGaussNewtonIterations),
            convergence_threshold=po.triangulationConvergenceThreshold,
            convergence_r=po.triangulationConvergenceR,
            rcond_threshold=rcond_thr,
            stereo=use_stereo,
        )

    def prepare(pose_states, trail_index, ips, vels, mask, map_point=None,
                map_point_offset=None, stereo_idp=None, stereo_cov=None,
                stereo_valid=None):
        N = pose_states.shape[0]
        rows = 2 * n_cams * N
        full_mask = jnp.tile(mask, n_cams)
        row_mask = jnp.repeat(full_mask, 2)

        hybrid = map_point_offset is not None
        indep_stereo = use_indep_stereo and stereo_idp is not None

        def tri_fused(ps, sidp, smask):
            left = camera_poses_from_states(ps, i2c)
            return triangulate_stereo_fused(left, sidp, stereo_cov, smask)

        def h_fn(x, pf_in):
            ps = x[: N * 7].reshape(N, 7)
            sft_delta = x[N * 7]
            feats = ips + sft_delta * vels if est_sft else ips
            trail = trail_from_states(ps)
            if hybrid:
                pf = pf_in + x[N * 7 + 1 : N * 7 + 4]  # map point columns
            elif indep_stereo:
                # the time-shift moves the stereo idp along the LEFT-camera
                # feature velocity (reference: triangulation.cpp:513-545)
                sidp = stereo_idp
                if est_sft:
                    vel3 = jnp.concatenate(
                        [vels[:N], jnp.zeros((N, 1), dtype=dtype)], axis=1)
                    sidp = stereo_idp + sft_delta * vel3
                pf = tri_fused(ps, sidp, stereo_valid & mask).pf
            else:
                tri = triangulate(ps, feats, mask)
                pf = tri.pf
            proj, _ = _project_idp(trail, pf)
            out = proj.reshape(-1)
            if est_sft:
                out = out - sft_delta * vels.reshape(-1)
            return out

        nx = N * 7 + (4 if hybrid else 1)
        x0 = jnp.zeros(nx, dtype=dtype).at[: N * 7].set(pose_states.reshape(-1))
        pf_in = map_point if hybrid else jnp.zeros(3, dtype=dtype)

        f = h_fn(x0, pf_in)
        J = jax.jacfwd(h_fn)(x0, pf_in)  # (rows, nx)

        # triangulation status & point (outside the autodiff path)
        if hybrid:
            tri_status = jnp.asarray(TRI_HYBRID, dtype=jnp.int32)
            pf = pf_in
        else:
            if indep_stereo:
                tri = tri_fused(pose_states, stereo_idp, stereo_valid & mask)
                # need at least one usable pre-triangulated stereo feature
                enough = jnp.sum(stereo_valid & mask) >= 1
                tri = tri._replace(status=jnp.where(
                    enough, tri.status, TRI_BAD_COND).astype(jnp.int32))
            else:
                tri = triangulate(pose_states, ips, mask)
            pf = tri.pf
            depth = jnp.linalg.norm(pf - trail_from_states(pose_states).p[0])
            # the reference default maxDist is 1e300; map anything beyond the
            # dtype's range to +inf instead of tripping numpy's overflow-
            # on-cast warning at trace time
            max_dist = po.triangulationMaxDist
            if max_dist > float(jnp.finfo(depth.dtype).max):
                max_dist = float("inf")
            bad_depth = (depth < po.triangulationMinDist) | (depth > max_dist)
            tri_status = jnp.where(
                (tri.status == TRI_OK) & bad_depth, 5, tri.status
            ).astype(jnp.int32)

        # zero-depth / behind checks on the projections (reference:
        # prepareVisualUpdate PREPARE_VU_BEHIND / ZERO_DEPTH)
        _, z = _project_idp(trail_from_states(pose_states), pf)
        zero_depth = jnp.any(full_mask & (jnp.abs(z) < 1e-12))
        behind = jnp.any(full_mask & (z < 0))
        prepare_status = jnp.where(
            zero_depth, PREPARE_VU_ZERO_DEPTH, jnp.where(behind, PREPARE_VU_BEHIND, PREPARE_VU_OK)
        ).astype(jnp.int32)

        # scatter per-pose jacobian columns into full-width H
        Jposes = J[:, : N * 7].reshape(rows, N, 7)
        pos_off, ori_off = state_col_offsets(trail_index)
        # column index per (pose, component): pos components 0..2, quat 3..6
        comp = jnp.arange(7)
        cols = jnp.where(comp[None, :] < 3, pos_off[:, None] + comp[None, :],
                         ori_off[:, None] + comp[None, :] - 3)  # (N,7)
        cols = jnp.where(mask[:, None], cols, d)  # masked poses -> dropped
        H = jnp.zeros((rows, d), dtype=dtype)
        H = H.at[:, cols.reshape(-1)].add(Jposes.reshape(rows, N * 7), mode="drop")
        if est_sft:
            H = H.at[:, SFT].add(J[:, N * 7])
        if hybrid:
            off = map_point_offset
            idx3 = off + jnp.arange(3)
            H = H.at[:, idx3].add(J[:, N * 7 + 1 : N * 7 + 4], mode="drop")

        H = H * row_mask[:, None].astype(dtype)
        f = f * row_mask.astype(dtype)
        y = ips.reshape(-1) * row_mask.astype(dtype)

        return TrackUpdateData(
            H=H, f=f, y=y, row_mask=row_mask,
            tri_status=tri_status, prepare_status=prepare_status, pf=pf,
        )

    return prepare
