"""Per-stage timing attribution for the `-timer` report.

The reference scope-times each pipeline stage inside its single thread and
reports per-label per-frame ms at exit (reference: timer macro sites
ekf.cpp:355, tracker.cpp:56,249, ransac_pipeline.cpp:206-283; report
main.cpp:1008-1016). Our per-frame pipeline is a handful of fused XLA
programs, so mid-program stages cannot be scope-timed from the host.
Instead, this module times dedicated jitted sub-programs — the same
kernels the fused step uses, on the session's OWN last frame data — and
returns per-label ms for TimeStats.add_attribution. Treat the labels as
attribution (what each stage costs in isolation), not an exact
decomposition of the fused step (XLA fuses across stage boundaries).

The same decomposition at batch scale lives in tools/profile_step.py.
"""
from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np


def _timeit(fn, args, reps: int) -> Optional[float]:
    """Time a probe; a probe that fails to build/run degrades to a missing
    label (the -timer report must never kill the session at exit)."""
    import jax

    try:
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return 1000.0 * (time.perf_counter() - t0) / reps
    except Exception:
        return None


def attribute_stages(params, cameras, image, second_image=None,
                     reps: int = 5, dtype=None) -> Dict[str, float]:
    """Time the front-end stages on the given frame; returns {label: ms}.

    Labels mirror the reference's `-timer` table: image pyramids, optical
    flow (the temporal pyramidal LK), stereo matching, keypoint detection,
    and each RANSAC variant actually configured (R2 always; R5 for mono,
    R3/upright-2p for stereo — reference hybrid dispatch,
    ransac_pipeline.cpp:158-195).
    """
    import jax
    import jax.numpy as jnp

    from ..frontend.gftt import detect_corners
    from ..frontend.lk import LKParams, lk_track_pyramid
    from ..frontend.pyramid import build_pyramid, scharr_gradients
    from ..frontend.ransac import ransac2

    dtype = dtype or jnp.float32
    pt = params.tracker
    use_stereo = bool(pt.useStereo) and second_image is not None
    img = jnp.asarray(image, dtype)
    sim = jnp.asarray(second_image, dtype) if use_stereo else None
    H, W = img.shape
    T = pt.maxTracks
    # clamp pyramid depth exactly like the tracker does (frontend/tracker.py):
    # the top level must still fit an LK window + margin
    L = pt.pyrLKMaxLevel
    while L > 0 and (min(H, W) >> L) < pt.pyrLKWindowSize + 19:
        L -= 1
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.rand(T, 2) * np.array([W - 60, H - 60]) + 30, dtype)
    valid = jnp.ones((T,), bool)
    key = jax.random.PRNGKey(0)
    out: Dict[str, float] = {}

    # image pyramids + gradients (reference: ImagePyramid::Factory)
    def pyr_one(im):
        pyr = build_pyramid(im, L)
        return pyr, [scharr_gradients(x) for x in pyr]

    pyrf = jax.jit(lambda a: pyr_one(a))
    out["image pyramids"] = _timeit(pyrf, (img,), reps)

    # temporal LK (reference: 'optical flow' scope, tracker.cpp:56)
    lkp = LKParams(window_size=pt.pyrLKWindowSize, max_level=L,
                   max_iter=pt.pyrLKMaxIter, epsilon=pt.pyrLKEpsilon,
                   min_eig_threshold=pt.pyrLKMinEigThreshold / 255.0 ** 2)

    def lk_one(prev_im, cur_im, pp):
        pyr_p, grads_p = pyr_one(prev_im)
        pyr_c = build_pyramid(cur_im, L)
        return lk_track_pyramid(pyr_p, grads_p, pyr_c, pp, initial_pts=pp,
                                params=lkp)

    out["optical flow (LK)"] = _timeit(jax.jit(lk_one), (img, img, pts), reps)

    if use_stereo:
        smp = lkp._replace(max_level=1)

        def sm_one(lim, rim, pp):
            pyr_l, grads_l = (lambda p: (p, [scharr_gradients(x) for x in p]))(
                build_pyramid(lim, 1))
            pyr_r = build_pyramid(rim, 1)
            return lk_track_pyramid(pyr_l, grads_l, pyr_r, pp,
                                    initial_pts=pp, params=smp)

        out["stereo matching (LK)"] = _timeit(
            jax.jit(sm_one), (img, sim, pts), reps)

    # keypoint detection (reference: 'keypoint detection' scope,
    # tracker.cpp:249)
    def det_one(im, ex):
        return detect_corners(im, T, ex, valid, jnp.asarray(30.0, dtype),
                              pt.gfttMinDistance, block_size=pt.gfttBlockSize,
                              min_response=pt.gfttMinResponse)

    out["keypoint detection"] = _timeit(jax.jit(det_one), (img, pts), reps)

    # RANSAC variants (reference: per-variant scopes,
    # ransac_pipeline.cpp:206-283)
    su = min(H, W) / 720.0
    cam0 = cameras[0]
    r2f = jax.jit(lambda a, b, k: ransac2(
        cam0, cam0, a, b, valid, k, pt.ransac2Threshold * su))
    out["ransac2 (rotation)"] = _timeit(r2f, (pts, pts + 1.0, key), reps)

    norm = (pts - jnp.asarray([W / 2, H / 2], dtype)) / jnp.asarray(
        [pt.focalLength, pt.focalLength], dtype)
    pts3 = jnp.concatenate([norm, jnp.ones((T, 1), dtype)], axis=1) * 3.0
    if use_stereo:
        if pt.useStereoUpright2p and not pt.useRansac3:
            from ..frontend.ransac import stereo_upright_2p

            rays = jnp.concatenate([norm, jnp.ones((T, 1), dtype)], axis=1)
            f = jax.jit(lambda p3, r, k: stereo_upright_2p(
                p3, r, valid, k, error_thresh=1e-4, cur_norm=norm))
            out["stereo upright 2p"] = _timeit(f, (pts3, rays, key), reps)
        else:
            from ..frontend.ransac import ransac3

            f = jax.jit(lambda p3, n, k: ransac3(
                p3, p3 * 1.01, n, valid, k))
            out["ransac3 (2D-3D)"] = _timeit(f, (pts3, norm, key), reps)
    else:
        from ..frontend.ransac import ransac5

        f = jax.jit(lambda a, b, k: ransac5(
            a, b, valid, k, pt.ransac5Threshold / pt.focalLength))
        out["ransac5 (essential)"] = _timeit(f, (norm, norm * 1.01, key), reps)

    return {k: v for k, v in out.items() if v is not None}
