#!/usr/bin/env python
"""Attribute batched VIO step time across pipeline stages.

Builds the bench configuration (bench.py build_config), then times jitted
sub-programs with the same shapes the fused step uses:

  full        the fused batched vio_step (the bench number)
  frontend    vmapped tracker track_frame (pyramids+LK+stereo+RANSAC+detect)
  pyramids    vmapped pyramid+Scharr for the frame's image(s)
  lk          vmapped temporal LK (left camera)
  stereo_lk   vmapped guided left->right match (stereo configs)
  detect      vmapped corner detection
  ransac      vmapped RANSAC dispatch (R2 + R3/upright-2p or R5)

backend time ~= full - frontend (they share the pyramid work; XLA may fuse
differently inside the full program, so treat stage times as attribution,
not an exact decomposition).

Env: PROF_CONFIG=mono|stereo|fisheye, PROF_BATCH, PROF_REPS.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fetch(out):
    # end timing on a VALUE fetch: over the remote-TPU tunnel
    # block_until_ready can return at enqueue (see bench.py), and only a
    # D2H of real data observes completion of the queued chain
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf).ravel()[0]


def timeit(fn, args, reps):
    out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _fetch(out)
    return 1000.0 * (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    from bench import build_config

    from hybvio_tpu.config import DerivedParameters
    from hybvio_tpu.frontend.lk import LKParams, lk_track_pyramid
    from hybvio_tpu.frontend.pyramid import build_pyramid, scharr_gradients
    from hybvio_tpu.frontend.tracker import make_tracker
    from hybvio_tpu.io.synthetic import generate_sequence
    from hybvio_tpu.odometry.backend import ImuBatch
    from hybvio_tpu.parallel.batched import make_batched_vio

    config = os.environ.get("PROF_CONFIG", "stereo")
    B = int(os.environ.get("PROF_BATCH", "16"))
    reps = int(os.environ.get("PROF_REPS", "20"))
    dtype = jnp.float32

    p, cams, render, seq_kwargs = build_config(config, jnp)
    derived = DerivedParameters.from_parameters(p)
    use_stereo = bool(p.tracker.useStereo)

    seq = generate_sequence(duration=5.0, imu_rate=200.0, frame_rate=20.0,
                            **seq_kwargs)

    def tile(frame):
        if isinstance(frame, tuple):
            return tuple(jax.device_put(jnp.broadcast_to(jnp.asarray(f, dtype),
                                                         (B,) + f.shape))
                         for f in frame)
        return jax.device_put(jnp.broadcast_to(jnp.asarray(frame, dtype),
                                               (B,) + frame.shape))

    frames = [tile(render(seq, fi)) for fi in range(3)]

    # ---- full fused batched step --------------------------------------
    batched_init, batched_step = make_batched_vio(
        p, derived, cams, batch_size=B, max_tracks=p.tracker.maxTracks,
        dtype=dtype)
    states = batched_init(frames[0], np.full(B, float(seq.frame_times[0])),
                          np.arange(B))
    k1 = seq.frame_sample_idx[1] + 1
    S = k1
    imu = ImuBatch(
        jnp.asarray(np.tile(seq.times[:S], (B, 1)), dtype),
        jnp.asarray(np.tile(seq.gyro[:S], (B, 1, 1)), dtype),
        jnp.asarray(np.tile(seq.acc[:S], (B, 1, 1)), dtype),
        jnp.ones((B, S), bool))
    states, _ = batched_step(states, imu, frames[1])  # get past frame 1

    results = {}
    results["full"] = timeit(lambda s, i, f: batched_step(s, i, f),
                             (states, imu, frames[2]), reps)

    # ---- backend param ablations (what does each backend stage cost?) --
    import copy as _copy0

    def full_with(**overrides):
        p2 = _copy0.deepcopy(p)
        for k, v in overrides.items():
            g, n = k.split("__")
            setattr(getattr(p2, g), n, v)
        d2 = DerivedParameters.from_parameters(p2)
        i2, s2 = make_batched_vio(p2, d2, cams, batch_size=B,
                                  max_tracks=p2.tracker.maxTracks, dtype=dtype)
        st = i2(frames[0], np.full(B, float(seq.frame_times[0])),
                np.arange(B))
        st, _ = s2(st, imu, frames[1])
        return timeit(lambda s, i, f: s2(s, i, f), (st, imu, frames[2]), reps)

    def report():
        name = f"{config} B={B}"
        print(f"\n== stage times ({name}), ms/step ==")
        for k, v in results.items():
            print(f"  {k:14s} {v:8.2f}")

    if os.environ.get("PROF_BE_ABLATE", "1") == "1":
        results["be-NV8"] = full_with(odometry__maxVisualUpdates=8)
        results["be-gn3"] = full_with(
            odometry__triangulationGaussNewtonIterations=3)
        results["be-seqVU"] = full_with(odometry__batchVisualUpdate=False)
        results["be-trail8"] = full_with(odometry__cameraTrailLength=8)
        if os.environ.get("PROF_BE_ONLY", "0") == "1":
            report()
            return

    # ---- tracker-only --------------------------------------------------
    t_init, t_track = make_tracker(p, cams, max_tracks=p.tracker.maxTracks,
                                   dtype=dtype, derived=derived)

    def first_img(f):
        return f[0] if isinstance(f, tuple) else f

    def second_img(f):
        return f[1] if isinstance(f, tuple) else None

    ts0 = jax.vmap(lambda im, sim: t_init(im, 0.0, second_image=sim)
                   if use_stereo else t_init(im, 0.0))(
        first_img(frames[0]),
        second_img(frames[0])) if use_stereo else jax.vmap(
        lambda im: t_init(im, 0.0))(first_img(frames[0]))

    keys = jax.vmap(jax.random.PRNGKey)(np.arange(B))
    if use_stereo:
        track = jax.jit(jax.vmap(
            lambda ts, im, sim, k: t_track(ts, im, k, 0.05,
                                           second_image=sim)))
        targs = (ts0, first_img(frames[1]), second_img(frames[1]), keys)
    else:
        track = jax.jit(jax.vmap(
            lambda ts, im, k: t_track(ts, im, k, 0.05)))
        targs = (ts0, first_img(frames[1]), keys)
    results["frontend"] = timeit(track, targs, reps)

    # ---- frontend param ablations (what does each feature cost?) -------
    import copy as _copy

    def frontend_with(**overrides):
        p2 = _copy.deepcopy(p)
        for k, v in overrides.items():
            g, n = k.split("__")
            setattr(getattr(p2, g), n, v)
        i2, t2 = make_tracker(p2, cams, max_tracks=p2.tracker.maxTracks,
                              dtype=dtype, derived=derived)
        if use_stereo:
            f = jax.jit(jax.vmap(
                lambda ts, im, sim, k: t2(ts, im, k, 0.05, second_image=sim)))
            return timeit(f, targs, reps)
        f = jax.jit(jax.vmap(lambda ts, im, k: t2(ts, im, k, 0.05)))
        return timeit(f, targs, reps)

    if os.environ.get("PROF_ABLATE", "1") == "1":
        if use_stereo:
            results["fe-no_epipolar"] = frontend_with(
                tracker__maxStereoEpipolarDistance=0.0)
            results["fe-hybridR2R5"] = frontend_with(
                tracker__useRansac3=False, tracker__useStereoUpright2p=False)
        results["fe-no_subpix"] = frontend_with(tracker__subPixMaxIter=0)

    # ---- pyramids + gradients ------------------------------------------
    L = p.tracker.pyrLKMaxLevel

    def pyr_one(img):
        pyr = build_pyramid(img, L)
        grads = [scharr_gradients(x) for x in pyr]
        return pyr, grads

    def pyr_all(f):
        if use_stereo:
            return pyr_one(f[0]), build_pyramid(f[1], L)
        return pyr_one(f)

    pyrf = jax.jit(jax.vmap(pyr_all))
    results["pyramids"] = timeit(pyrf, (frames[1],), reps)

    # ---- LK temporal ----------------------------------------------------
    lkp = LKParams(window_size=p.tracker.pyrLKWindowSize, max_level=L,
                   max_iter=p.tracker.pyrLKMaxIter,
                   epsilon=p.tracker.pyrLKEpsilon,
                   min_eig_threshold=p.tracker.pyrLKMinEigThreshold / 255.0**2)
    T = p.tracker.maxTracks
    rng = np.random.RandomState(0)
    H, W = (cams[0].height, cams[0].width)
    pts = jnp.asarray(
        rng.rand(B, T, 2) * np.array([W - 60, H - 60]) + 30, dtype)

    def lk_one(prev_im, cur_im, pp):
        pyr_p = build_pyramid(prev_im, L)
        grads_p = [scharr_gradients(x) for x in pyr_p]
        pyr_c = build_pyramid(cur_im, L)
        return lk_track_pyramid(pyr_p, grads_p, pyr_c, pp, initial_pts=pp,
                                params=lkp)

    lkf = jax.jit(jax.vmap(lk_one))
    results["lk+pyr"] = timeit(
        lkf, (first_img(frames[0]), first_img(frames[1]), pts), reps)

    if use_stereo:
        nl = 2
        smp = lkp._replace(max_level=nl - 1)

        def sm_one(lim, rim, pp):
            pyr_l = build_pyramid(lim, nl - 1)
            grads_l = [scharr_gradients(x) for x in pyr_l]
            pyr_r = build_pyramid(rim, nl - 1)
            return lk_track_pyramid(pyr_l, grads_l, pyr_r, pp,
                                    initial_pts=pp, params=smp)

        smf = jax.jit(jax.vmap(sm_one))
        results["stereo_lk+pyr"] = timeit(
            smf, (first_img(frames[1]), second_img(frames[1]), pts), reps)

    # ---- detection -------------------------------------------------------
    from hybvio_tpu.frontend.gftt import detect_corners

    def det_one(img, ex):
        return detect_corners(img, T, ex, jnp.ones((T,), bool),
                              jnp.asarray(30.0, dtype),
                              p.tracker.gfttMinDistance,
                              block_size=p.tracker.gfttBlockSize,
                              min_response=p.tracker.gfttMinResponse)

    detf = jax.jit(jax.vmap(det_one))
    results["detect"] = timeit(detf, (first_img(frames[1]), pts), reps)

    # ---- RANSAC dispatch --------------------------------------------------
    from hybvio_tpu.frontend.ransac import ransac2

    su = min(H, W) / 720.0
    r2f = jax.jit(jax.vmap(
        lambda a, b, k: ransac2(cams[0], cams[0], a, b,
                                jnp.ones((T,), bool), k,
                                p.tracker.ransac2Threshold * su)))
    results["ransac2"] = timeit(
        r2f, (pts, pts + 1.0, keys), reps)

    name = f"{config} B={B}"
    print(f"\n== stage times ({name}), ms/step ==")
    for k, v in results.items():
        print(f"  {k:14s} {v:8.2f}")
    fe = results["frontend"]
    print(f"  {'backend~':14s} {results['full'] - fe:8.2f}  (full - frontend)")


if __name__ == "__main__":
    main()
