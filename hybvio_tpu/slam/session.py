"""SLAM session: keyframes, map points, local BA, loop closure.

Re-derivation of the reference SLAM module from its in-tree interface and
parameter surface (reference: src/api/slam.hpp:34-86 for the contract;
codegen/parameter_definitions.c:365-501 for behavior; module source is a
separate repo not in the snapshot; lineage is OpenVSLAM per parameter
comments). Architecture:

  * host-side map bookkeeping (keyframe store, map-point lifecycle, keyframe
    decision & culling) — dynamic structures at keyframe rate (~Hz), matching
    the reference's dedicated SLAM thread;
  * device-side math — local bundle adjustment (slam/ba.py: batched GN +
    Schur), ORB descriptors and loop-closure scoring/matching (slam/orb.py) —
    jitted with fixed shapes.

Contract (reference: slam.hpp addFrame): the caller feeds every
keyframeCandidateInterval-th frame with the tracker's features and the
odometry pose trail; the result carries the SLAM-corrected pose of that frame
and the map point cloud, and may be consumed with a delay.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..geometry.quaternion import quat_to_rmat, rmat_to_quat
from .ba import BAProblem, _relative_pose, ba_iterate

import jax
import jax.numpy as jnp


def _np_quat_to_rmat(q):
    import numpy as _np

    w, x, y, z = q
    return _np.array([
        [w*w + x*x - y*y - z*z, 2*(x*y - w*z), 2*(x*z + w*y)],
        [2*(x*y + w*z), w*w - x*x + y*y - z*z, 2*(y*z - w*x)],
        [2*(x*z - w*y), 2*(y*z + w*x), w*w - x*x - y*y + z*z],
    ])


def pose_to_mat(pose7: np.ndarray) -> np.ndarray:
    """[p, q(wxyz)] camera-to-world -> 4x4 camera-to-world matrix."""
    T = np.eye(4)
    T[:3, :3] = _np_quat_to_rmat(pose7[3:])
    T[:3, 3] = pose7[:3]
    return T


def mat_to_pose(T: np.ndarray) -> np.ndarray:
    q = np.asarray(rmat_to_quat(jnp.asarray(T[:3, :3])))
    return np.concatenate([T[:3, 3], q])


@dataclasses.dataclass
class KeyFrame:
    kf_id: int
    frame_num: int
    t: float
    pose: np.ndarray  # (7,) camera-to-world [p, q]
    odo_pose: np.ndarray  # (7,) odometry camera-to-world at creation
    track_ids: np.ndarray  # (F,) int
    norm_pts: np.ndarray  # (F, 2) normalized image points
    descriptors: Optional[np.ndarray] = None  # (F, 256) +/-1
    desc_valid: Optional[np.ndarray] = None  # (F,)
    signature: Optional[np.ndarray] = None  # (256,)


@dataclasses.dataclass
class MapPoint:
    point_id: int
    track_id: int
    position: np.ndarray  # (3,)
    observations: Dict[int, np.ndarray]  # kf_id -> normalized point
    triangulated: bool = False


@dataclasses.dataclass
class SlamResult:
    pose_cw: np.ndarray  # (4,4) camera-to-world of the processed frame (SLAM map coords)
    point_cloud: List[Tuple[int, int, np.ndarray]]  # (point_id, track_id, position)
    loop_closed: bool = False


@dataclasses.dataclass
class LoopClosureEvent:
    kf_id: int
    matched_kf_id: int
    n_matches: int
    applied: bool


class Slam:
    """SLAM backend (reference: slam::Slam)."""

    def __init__(self, params, max_ba_keyframes: Optional[int] = None,
                 max_ba_points: int = 128, compute_descriptors: bool = True):
        ps = params.slam
        self.ps = ps
        self.keyframes: Dict[int, KeyFrame] = {}
        self.kf_order: List[int] = []
        self.points: Dict[int, MapPoint] = {}  # by track_id
        self.next_kf_id = 0
        self.next_point_id = 1
        self.NK = max_ba_keyframes or ps.localBAProblemSize
        self.MP = max_ba_points
        self.compute_descriptors = compute_descriptors
        self.loop_events: List[LoopClosureEvent] = []
        self._ba_jit = None
        self._orb_jit = None
        self._last_kf_time = -1e18

    # ---------------------------------------------------------------- input

    def add_frame(self, image, odo_pose_cw: np.ndarray, track_ids: np.ndarray,
                  norm_pts: np.ndarray, t: float, frame_num: int) -> SlamResult:
        """Process one SLAM frame (reference: slam::Slam::addFrame).

        image: (H, W) float gray or None (descriptors skipped); odo_pose_cw:
        (4,4) odometry camera-to-world; track_ids/norm_pts: tracker features.
        """
        odo_pose = mat_to_pose(np.asarray(odo_pose_cw))
        # initialize this frame's SLAM pose from odometry through the current
        # odometry->slam correction (identity until a loop closes / BA moves)
        if self.kf_order:
            last = self.keyframes[self.kf_order[-1]]
            T_corr = pose_to_mat(last.pose) @ np.linalg.inv(pose_to_mat(last.odo_pose))
            pose = mat_to_pose(T_corr @ pose_to_mat(odo_pose))
        else:
            pose = odo_pose.copy()

        if not self._keyframe_decision(pose, t, track_ids):
            return SlamResult(pose_cw=pose_to_mat(pose), point_cloud=self._cloud())

        sel = track_ids >= 0
        kf = KeyFrame(
            kf_id=self.next_kf_id, frame_num=frame_num, t=t, pose=pose,
            odo_pose=odo_pose, track_ids=track_ids[sel].copy(),
            norm_pts=norm_pts[sel].copy())
        self.next_kf_id += 1
        self._last_kf_time = t

        if self.compute_descriptors and image is not None:
            self._add_descriptors(kf, image)

        self.keyframes[kf.kf_id] = kf
        self.kf_order.append(kf.kf_id)
        self._update_map_points(kf)

        loop = self._detect_loop_closure(kf)
        self._local_ba()
        self._cull()

        return SlamResult(
            pose_cw=pose_to_mat(self.keyframes[kf.kf_id].pose),
            point_cloud=self._cloud(),
            loop_closed=loop is not None and loop.applied)

    def end(self, map_save_path: Optional[str] = None) -> bool:
        """(reference: slam::Slam::end) final global adjustment; optionally
        save the keyframe map poses (reference: -slamMapPosesPath /
        slamDebug->mapSavePath, main.cpp:518): one JSON line per keyframe
        {time, position, orientation (camera-to-world)} plus map points."""
        self._local_ba(global_ba=True)
        if map_save_path:
            import json

            from ..geometry.quaternion import rmat_to_quat
            import jax.numpy as jnp

            with open(map_save_path, "w") as f:
                for kid in self.kf_order:
                    kf = self.keyframes[kid]
                    T = pose_to_mat(kf.pose)  # camera-to-world
                    q = np.asarray(rmat_to_quat(jnp.asarray(T[:3, :3])))
                    f.write(json.dumps({
                        "time": float(kf.t),
                        "position": {"x": float(T[0, 3]), "y": float(T[1, 3]),
                                     "z": float(T[2, 3])},
                        "orientation": {"w": float(q[0]), "x": float(q[1]),
                                        "y": float(q[2]), "z": float(q[3])},
                    }) + "\n")
                for tid, mp in self.points.items():
                    f.write(json.dumps({
                        "mapPoint": {"id": int(mp.point_id), "trackId": int(tid),
                                     "position": [float(v) for v in mp.position]},
                    }) + "\n")
        return True

    # -------------------------------------------------------------- mapping

    def _keyframe_decision(self, pose, t, track_ids) -> bool:
        """(reference: keyframeDecision* parameters)"""
        ps = self.ps
        if ps.keyframeDecisionAlways or not self.kf_order:
            return True
        if t - self._last_kf_time < ps.keyframeDecisionMinIntervalSeconds:
            return False
        last = self.keyframes[self.kf_order[-1]]
        moved = np.linalg.norm(pose[:3] - last.pose[:3])
        if moved >= ps.keyframeDecisionDistanceThreshold:
            return True
        cur = set(int(i) for i in track_ids if i >= 0)
        prev = set(int(i) for i in last.track_ids)
        if prev:
            covis = len(cur & prev) / len(prev)
            if covis < ps.keyframeDecisionCovisibilityRatio:
                return True
        return False

    def _add_descriptors(self, kf: KeyFrame, image) -> None:
        from .orb import frame_signature, orb_descriptors

        F = kf.norm_pts.shape[0]
        if F == 0:
            return
        # descriptors are sampled at pixel positions: reconstruct approximate
        # pixels from normalized points via the image size (caller may pass
        # pixel coords instead by convention; we accept normalized here and
        # sample on the normalized-scaled grid)
        H, W = image.shape
        # treat norm pts as pre-converted pixels if they look like pixels
        pts = kf.norm_pts
        if np.abs(pts).max() <= 2.0:  # normalized -> fake focal projection
            f = 0.5 * (H + W) / 2
            pts = pts * f + np.array([W / 2, H / 2])
        if self._orb_jit is None:
            self._orb_jit = jax.jit(orb_descriptors)
        # pad to a static size for jit reuse
        PAD = 256
        ppad = np.zeros((PAD, 2), np.float32)
        vpad = np.zeros(PAD, bool)
        n = min(F, PAD)
        ppad[:n] = pts[:n]
        vpad[:n] = True
        desc, ok = self._orb_jit(jnp.asarray(image, jnp.float32), jnp.asarray(ppad), jnp.asarray(vpad))
        kf.descriptors = np.asarray(desc)[:n]
        kf.desc_valid = np.asarray(ok)[:n]
        kf.signature = np.asarray(frame_signature(desc, ok))

    def _update_map_points(self, kf: KeyFrame) -> None:
        for tid, pt in zip(kf.track_ids, kf.norm_pts):
            tid = int(tid)
            mp = self.points.get(tid)
            if mp is None:
                mp = MapPoint(point_id=self.next_point_id, track_id=tid,
                              position=np.zeros(3), observations={})
                self.next_point_id += 1
                self.points[tid] = mp
            mp.observations[kf.kf_id] = np.asarray(pt, dtype=np.float64)
        # triangulate points with enough observations + parallax
        for mp in self.points.values():
            if mp.triangulated or len(mp.observations) < 2:
                continue
            kfs = [self.keyframes[k] for k in mp.observations if k in self.keyframes]
            if len(kfs) < 2:
                continue
            a, b = kfs[0], kfs[-1]
            ray_a = _np_quat_to_rmat(a.pose[3:]) @ np.append(mp.observations[a.kf_id], 1.0)
            ray_b = _np_quat_to_rmat(b.pose[3:]) @ np.append(mp.observations[b.kf_id], 1.0)
            cosang = np.dot(ray_a, ray_b) / (np.linalg.norm(ray_a) * np.linalg.norm(ray_b))
            min_ang = np.deg2rad(self.ps.minTriangulationAngleTwoObs)
            if cosang > np.cos(min_ang):
                continue
            p = self._triangulate_two(a, mp.observations[a.kf_id], b, mp.observations[b.kf_id])
            if p is not None:
                mp.position = p
                mp.triangulated = True

    @staticmethod
    def _triangulate_two(kf_a: KeyFrame, ip_a, kf_b: KeyFrame, ip_b):
        def ray(kf, ip):
            v = _np_quat_to_rmat(kf.pose[3:]) @ np.append(ip, 1.0)
            return v / np.linalg.norm(v)

        va, vb = ray(kf_a, ip_a), ray(kf_b, ip_b)
        A = np.stack([va, -vb], axis=1)  # (3,2)
        b = kf_b.pose[:3] - kf_a.pose[:3]
        s, *_ = np.linalg.lstsq(A, b, rcond=None)
        if s[0] <= 0 or s[1] <= 0:
            return None
        pa = kf_a.pose[:3] + s[0] * va
        pb = kf_b.pose[:3] + s[1] * vb
        return 0.5 * (pa + pb)

    # ------------------------------------------------------------------- BA

    def _ba_fn(self):
        if self._ba_jit is None:
            self._ba_jit = jax.jit(
                lambda prob: ba_iterate(prob, iterations=8))
        return self._ba_jit

    def _local_ba(self, global_ba: bool = False) -> None:
        """(reference: applyLocalBundleAdjustment over localBAProblemSize
        keyframes with odometry priors)"""
        if not self.ps.applyLocalBundleAdjustment and not global_ba:
            return
        if len(self.kf_order) < max(self.ps.minKeyframesInBA, 2):
            return
        NK = self.NK
        kf_ids = self.kf_order[-NK:]
        kfs = [self.keyframes[i] for i in kf_ids]
        nk = len(kfs)

        # choose map points observed by these keyframes (most observations first)
        cands = [mp for mp in self.points.values()
                 if mp.triangulated and sum(1 for k in kf_ids if k in mp.observations) >= 2]
        cands.sort(key=lambda mp: -len(mp.observations))
        cands = cands[: self.MP]
        mp_n = len(cands)
        if mp_n < 3:
            return

        poses = np.zeros((NK, 7)); poses[:, 3] = 1.0
        for i, kf in enumerate(kfs):
            poses[i] = kf.pose
        pts = np.zeros((self.MP, 3))
        obs_ip = np.zeros((NK, self.MP, 2))
        obs_mask = np.zeros((NK, self.MP), bool)
        for j, mp in enumerate(cands):
            pts[j] = mp.position
            for i, kf in enumerate(kfs):
                o = mp.observations.get(kf.kf_id)
                if o is not None:
                    obs_ip[i, j] = o
                    obs_mask[i, j] = True

        rel = np.zeros((NK - 1, 7)); rel[:, 3] = 1.0
        prior_mask = np.zeros(NK - 1, bool)
        for i in range(nk - 1):
            rel[i] = np.asarray(_relative_pose(
                jnp.asarray(kfs[i].odo_pose), jnp.asarray(kfs[i + 1].odo_pose)))
            prior_mask[i] = True

        prob = BAProblem(
            poses=jnp.asarray(poses), points=jnp.asarray(pts),
            obs_ip=jnp.asarray(obs_ip), obs_mask=jnp.asarray(obs_mask),
            pose_valid=jnp.asarray(np.arange(NK) < nk),
            point_valid=jnp.asarray(np.arange(self.MP) < mp_n),
            prior_rel=jnp.asarray(rel), prior_mask=jnp.asarray(prior_mask),
            prior_w_pos=jnp.asarray(float(self.ps.odometryPriorStrengthPosition) / 100.0),
            prior_w_rot=jnp.asarray(float(self.ps.odometryPriorStrengthRotation) / 100.0),
        )
        new_poses, new_points, cost = self._ba_fn()(prob)
        new_poses = np.asarray(new_poses)
        new_points = np.asarray(new_points)
        if not np.isfinite(new_poses).all():
            return
        for i, kf in enumerate(kfs):
            kf.pose = new_poses[i]
        for j, mp in enumerate(cands):
            if np.isfinite(new_points[j]).all():
                mp.position = new_points[j]

    # ----------------------------------------------------------- loop close

    def _detect_loop_closure(self, kf: KeyFrame) -> Optional[LoopClosureEvent]:
        """(reference: DBoW2 getBowSimilar + match + RANSAC + drift gates +
        optional application, parameter_definitions.c:369-388)"""
        ps = self.ps
        if kf.signature is None or len(self.kf_order) < ps.adjacentSpaceSize + 2:
            return None
        old_ids = self.kf_order[: -ps.adjacentSpaceSize]
        cands = [self.keyframes[i] for i in old_ids
                 if self.keyframes[i].signature is not None]
        if not cands:
            return None
        sims = np.array([float(kf.signature @ c.signature) for c in cands])
        best_i = int(np.argmax(sims))
        if sims[best_i] < 0.75:  # conservative signature gate
            return None
        cand = cands[best_i]

        from .orb import match_descriptors

        if kf.descriptors is None or cand.descriptors is None:
            return None
        Ta, Tb = kf.descriptors.shape[0], cand.descriptors.shape[0]
        PAD = 256
        da = np.zeros((PAD, 256), np.float32); da[:Ta] = kf.descriptors
        va = np.zeros(PAD, bool); va[:Ta] = kf.desc_valid
        db = np.zeros((PAD, 256), np.float32); db[:Tb] = cand.descriptors
        vb = np.zeros(PAD, bool); vb[:Tb] = cand.desc_valid
        midx, _ = match_descriptors(
            jnp.asarray(da), jnp.asarray(va), jnp.asarray(db), jnp.asarray(vb),
            lowe_ratio=ps.loopClosureFeatureMatchLoweRatio)
        midx = np.asarray(midx)[:Ta]
        matches = [(i, int(j)) for i, j in enumerate(midx) if j >= 0 and j < Tb]
        if len(matches) < ps.minLoopClosureFeatureMatches:
            return None

        # geometric verification: 3D-3D between matched triangulated map points
        pa, pb = [], []
        for i, j in matches:
            mpa = self.points.get(int(kf.track_ids[i]))
            mpb = self.points.get(int(cand.track_ids[j]))
            if mpa is not None and mpb is not None and mpa.triangulated and mpb.triangulated:
                pa.append(mpa.position)
                pb.append(mpb.position)
        applied = False
        if len(pa) >= ps.loopClosureRansacMinInliers and ps.applyLoopClosures:
            from ..eval.ate import umeyama_alignment

            R, tvec, s = umeyama_alignment(
                np.asarray(pa), np.asarray(pb),
                with_scale=not ps.loopClosureRansacFixScale)
            # drift gates (reference: maximumDrift*)
            dt = max(kf.t - cand.t, 1e-6)
            drift_m = np.linalg.norm(tvec)
            ang = np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1))
            if (drift_m / dt <= ps.maximumDriftMetersPerSecond * dt
                    and ang / dt <= ps.maximumDriftRadiansPerSecond * dt):
                self._apply_loop_correction(R, tvec, s, since_kf=cand.kf_id)
                applied = True

        ev = LoopClosureEvent(kf.kf_id, cand.kf_id, len(matches), applied)
        self.loop_events.append(ev)
        return ev

    def _apply_loop_correction(self, R, t, s, since_kf: int) -> None:
        """Rigidly move the recent map segment onto the loop-closed frame
        (reference: loopClosureRigidTransform)."""
        T = np.eye(4)
        T[:3, :3] = s * R
        T[:3, 3] = t
        start = self.kf_order.index(since_kf) if since_kf in self.kf_order else 0
        moved_kfs = set(self.kf_order[start + 1:])
        for kf_id in moved_kfs:
            kf = self.keyframes[kf_id]
            kf.pose = mat_to_pose(T @ pose_to_mat(kf.pose))
        for mp in self.points.values():
            if mp.triangulated and any(k in moved_kfs for k in mp.observations):
                mp.position = (T[:3, :3] @ mp.position) + T[:3, 3]

    # --------------------------------------------------------------- output

    def _cloud(self) -> List[Tuple[int, int, np.ndarray]]:
        return [(mp.point_id, mp.track_id, mp.position.copy())
                for mp in self.points.values() if mp.triangulated]

    def _cull(self) -> None:
        """Drop map points with no surviving observations and cap memory
        (reference: cullMapPoints / keyframeCullEnabled; simplified policy)."""
        if not self.ps.cullMapPoints:
            return
        dead = [tid for tid, mp in self.points.items()
                if not mp.observations]
        for tid in dead:
            del self.points[tid]
