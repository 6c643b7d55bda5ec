"""Per-stage timing for the `-timer` report.

The reference scope-times each pipeline stage inside its single thread and
reports per-label per-frame ms at exit (reference: timer macro sites
ekf.cpp:355, tracker.cpp:56,249, ransac_pipeline.cpp:206-283; report
main.cpp:1008-1016). Our per-frame pipeline is a handful of fused XLA
programs, so mid-program stages cannot be scope-timed from the host.
Instead, `StageProbes` compiles dedicated jitted sub-programs ONCE — the
same kernels the fused step uses — and, when `-timer` is on, runs them every
frame on that frame's actual images and track positions, accumulating
per-label per-frame statistics across the whole run (the reference's
accumulate-every-frame semantics, not a one-frame re-timing). Treat the
labels as attribution (what each stage costs in isolation), not an exact
decomposition of the fused step (XLA fuses across stage boundaries).

The same decomposition at batch scale lives in tools/profile_step.py.
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Optional, Tuple

import numpy as np


def _scalarize(fn):
    """Wrap a probe so it returns ONE scalar checksum: the timed fetch is a
    1-element D2H, which is the only reliable completion signal over the
    remote-TPU tunnel (block_until_ready can return at enqueue)."""
    import jax
    import jax.numpy as jnp

    def wrapped(*args):
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        acc = jnp.zeros((), jnp.float32)
        for leaf in leaves:
            acc = acc + jnp.sum(leaf).astype(jnp.float32)
        return acc

    return jax.jit(wrapped)


class StageProbes:
    """Jitted front-end sub-programs for per-frame `-timer` attribution.

    Built once per image shape; `run_frame` times one execution of each
    probe on the CURRENT frame's data and returns {label: seconds}. Labels
    mirror the reference's `-timer` table: image pyramids, optical flow
    (temporal pyramidal LK), stereo matching, keypoint detection, and the
    RANSAC variant actually configured (reference hybrid dispatch,
    ransac_pipeline.cpp:158-195).
    """

    def __init__(self, params, cameras, height: int, width: int,
                 use_stereo: bool, dtype=None):
        import jax
        import jax.numpy as jnp

        from ..frontend.gftt import detect_corners
        from ..frontend.lk import LKParams, lk_track_pyramid
        from ..frontend.pyramid import build_pyramid, scharr_gradients
        from ..frontend.ransac import ransac2

        dtype = dtype or jnp.float32
        pt = params.tracker
        H, W = height, width
        T = pt.maxTracks
        self.use_stereo = use_stereo
        self.key = jax.random.PRNGKey(0)
        # clamp pyramid depth exactly like the tracker (frontend/tracker.py)
        L = pt.pyrLKMaxLevel
        while L > 0 and (min(H, W) >> L) < pt.pyrLKWindowSize + 19:
            L -= 1

        def pyr_one(im):
            pyr = build_pyramid(im, L)
            return pyr, [scharr_gradients(x) for x in pyr]

        lkp = LKParams(window_size=pt.pyrLKWindowSize, max_level=L,
                       max_iter=pt.pyrLKMaxIter, epsilon=pt.pyrLKEpsilon,
                       min_eig_threshold=pt.pyrLKMinEigThreshold / 255.0 ** 2)

        def lk_one(prev_im, cur_im, pp, valid):
            pyr_p, grads_p = pyr_one(prev_im)
            pyr_c = build_pyramid(cur_im, L)
            return lk_track_pyramid(pyr_p, grads_p, pyr_c, pp, initial_pts=pp,
                                    params=lkp)

        su = min(H, W) / 720.0
        cam0 = cameras[0]

        def r2_one(a, b, valid, k):
            return ransac2(cam0, cam0, a, b, valid, k,
                           pt.ransac2Threshold * su)

        def det_one(im, ex, valid):
            return detect_corners(im, T, ex, valid, jnp.asarray(30.0, dtype),
                                  pt.gfttMinDistance,
                                  block_size=pt.gfttBlockSize,
                                  min_response=pt.gfttMinResponse)

        center = jnp.asarray([W / 2, H / 2], dtype)
        foc = jnp.asarray([pt.focalLength, pt.focalLength], dtype)

        # (label, fn(image, second, pts, valid, key)) in reference table order
        self._probes: Dict[str, Callable] = {}
        self._probes["image pyramids"] = _scalarize(
            lambda im, sim, pp, v, k: pyr_one(im))
        self._probes["optical flow (LK)"] = _scalarize(
            lambda im, sim, pp, v, k: lk_one(im, im, pp, v))
        if use_stereo:
            smp = lkp._replace(max_level=min(L, 1))

            def sm_one(lim, rim, pp):
                pyr_l = build_pyramid(lim, min(L, 1))
                grads_l = [scharr_gradients(x) for x in pyr_l]
                pyr_r = build_pyramid(rim, min(L, 1))
                return lk_track_pyramid(pyr_l, grads_l, pyr_r, pp,
                                        initial_pts=pp, params=smp)

            self._probes["stereo matching (LK)"] = _scalarize(
                lambda im, sim, pp, v, k: sm_one(im, sim, pp))
        self._probes["keypoint detection"] = _scalarize(
            lambda im, sim, pp, v, k: det_one(im, pp, v))
        self._probes["ransac2 (rotation)"] = _scalarize(
            lambda im, sim, pp, v, k: r2_one(pp, pp + 1.0, v, k))

        if use_stereo:
            if pt.useStereoUpright2p and not pt.useRansac3:
                from ..frontend.ransac import stereo_upright_2p

                def up2_one(im, sim, pp, v, k):
                    norm = (pp - center) / foc
                    rays = jnp.concatenate(
                        [norm, jnp.ones((T, 1), dtype)], axis=1)
                    return stereo_upright_2p(rays * 3.0, rays, v, k,
                                             error_thresh=1e-4, cur_norm=norm)

                self._probes["stereo upright 2p"] = _scalarize(up2_one)
            else:
                from ..frontend.ransac import ransac3

                def r3_one(im, sim, pp, v, k):
                    norm = (pp - center) / foc
                    p3 = jnp.concatenate(
                        [norm, jnp.ones((T, 1), dtype)], axis=1) * 3.0
                    return ransac3(p3, p3 * 1.01, norm, v, k)

                self._probes["ransac3 (2D-3D)"] = _scalarize(r3_one)
        else:
            from ..frontend.ransac import ransac5

            def r5_one(im, sim, pp, v, k):
                norm = (pp - center) / foc
                return ransac5(norm, norm * 1.01, v, k,
                               pt.ransac5Threshold / pt.focalLength)

            self._probes["ransac5 (essential)"] = _scalarize(r5_one)

    def run_frame(self, image, second, pts, valid) -> Dict[str, float]:
        """Time one execution of each probe on this frame's data.

        pts: (T, 2) current track pixels (the fused step's actual positions,
        so LK/RANSAC probe cost is content-true); valid: (T,) bool. A probe
        that fails degrades to a missing label — the `-timer` report must
        never kill the session."""
        out: Dict[str, float] = {}
        for label, fn in self._probes.items():
            try:
                t0 = time.perf_counter()
                val = fn(image, second if second is not None else image,
                         pts, valid, self.key)
                float(np.asarray(val))  # 1-element value fetch = completion
                out[label] = time.perf_counter() - t0
            except Exception:
                pass
        return out


def attribute_stages(params, cameras, image, second_image=None,
                     reps: int = 5, dtype=None) -> Dict[str, float]:
    """One-shot attribution on a single frame (mean ms over reps).

    Retained for ad-hoc profiling; the `-timer` report now accumulates
    per-frame stats via StageProbes.run_frame during the actual run
    (api/vio.py), not from this single-frame re-timing."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    img = jnp.asarray(image, dtype)
    use_stereo = bool(params.tracker.useStereo) and second_image is not None
    sim = jnp.asarray(second_image, dtype) if use_stereo else None
    H, W = img.shape
    T = params.tracker.maxTracks
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.rand(T, 2) * np.array([W - 60, H - 60]) + 30, dtype)
    valid = jnp.ones((T,), bool)
    probes = StageProbes(params, cameras, H, W, use_stereo, dtype=dtype)
    acc: Dict[str, float] = {}
    probes.run_frame(img, sim, pts, valid)  # warmup/compile
    for _ in range(reps):
        for k, sec in probes.run_frame(img, sim, pts, valid).items():
            acc[k] = acc.get(k, 0.0) + sec
    return {k: 1000.0 * v / reps for k, v in acc.items()}
