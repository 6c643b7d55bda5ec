"""JAX port of the textured ray-cast renderer: jit + vmap over frames.

io/textured.py renders the procedural textured world in numpy float64 —
fine for the 59-frame 320x240 probe, but ~10 s/frame at the benchmark
resolution (752x480), which made a benchmark-grade long-sequence protocol
(>=600 frames, VERDICT round-2 item 1) impossible. This module renders the
same world (cylinder wall + floor + ceiling + spherical occluders, each
carrying multi-octave value noise; exposure jitter, pixel noise, 2-tap
motion blur) as a jitted, frame-vmapped XLA program, so whole sequences
render on the TPU (or CPU for tests) in seconds.

The world GEOMETRY matches io/textured.py exactly (same surface equations,
same occluder placement RNG); the texture hash runs in uint32 instead of
int64 (TPU-friendly), so pixel values differ from the numpy renderer —
both are procedural stand-ins for real imagery (reference protocol:
/root/reference/README.md:72-83), not goldens of each other.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .textured import TexturedScene
from .synthetic import _np_quat_to_rmat


def _hash01(jnp, ix, iy, seed: int):
    """uint32 lattice hash -> [0,1) f32 (same recipe as textured.py but in
    wraparound uint32 arithmetic, which XLA vectorizes on TPU)."""
    u = np.uint32
    h = (ix.astype(jnp.uint32) * u(374761393)
         + iy.astype(jnp.uint32) * u(668265263)
         + u((seed * 2654435761) & 0xFFFFFFFF))
    h = (h ^ (h >> u(13))) * u(1274126177)
    h = h ^ (h >> u(16))
    return (h & u(0xFFFFFF)).astype(jnp.float32) / jnp.float32(0x1000000)


def _value_noise(jnp, x, y, octaves: int, base_scale: float, seed: int):
    """Multi-octave value noise at float coords (x, y); f32 in [0,1]."""
    out = jnp.zeros_like(x, dtype=jnp.float32)
    amp = 1.0
    total = 0.0
    for o in range(octaves):
        s = jnp.float32(base_scale * (2.0 ** o))
        xs = x.astype(jnp.float32) * s
        ys = y.astype(jnp.float32) * s
        ix = jnp.floor(xs)
        iy = jnp.floor(ys)
        fx = xs - ix
        fy = ys - iy
        wx = fx * fx * (3.0 - 2.0 * fx)
        wy = fy * fy * (3.0 - 2.0 * fy)
        ixi = ix.astype(jnp.int32)
        iyi = iy.astype(jnp.int32)
        n00 = _hash01(jnp, ixi, iyi, seed + o)
        n10 = _hash01(jnp, ixi + 1, iyi, seed + o)
        n01 = _hash01(jnp, ixi, iyi + 1, seed + o)
        n11 = _hash01(jnp, ixi + 1, iyi + 1, seed + o)
        val = (n00 * (1 - wx) * (1 - wy) + n10 * wx * (1 - wy)
               + n01 * (1 - wx) * wy + n11 * wx * wy)
        out = out + jnp.float32(amp) * val
        total += amp
        amp *= 0.55
    return out / jnp.float32(total)


# one compiled render program per (scene geometry, intrinsics, noise config):
# the camera EXTRINSIC is a traced argument, so both cameras of a stereo rig
# (and any number of renderer instances) share a single XLA compile — the
# 752x480 program takes ~2 min to compile on the TPU tunnel, so a per-camera
# compile would dominate the long-sequence protocol's wall clock
_PROGRAM_CACHE: dict = {}


def _scene_key(scene: TexturedScene):
    return (scene.wall_radius, scene.floor_z, scene.ceil_z,
            scene.tex_scale_wall, scene.tex_scale_floor, scene.contrast,
            scene.seed, scene.n_occluders, tuple(scene.occluder_radius),
            tuple(scene.occluder_ring))


def make_textured_renderer(scene: TexturedScene, imu_to_camera,
                           fx: float, fy: float, cx: float, cy: float,
                           width: int, height: int,
                           fisheye_coeffs=None,
                           exposure_jitter: float = 0.0,
                           pixel_noise: float = 0.0,
                           motion_blur: bool = False):
    """Build `render_sequence(seq, frame_indices, chunk=..., device=False)
    -> (F,H,W) f32` rendering the textured world for the given camera
    on-device (numpy by default; `device=True` returns the jnp array without
    the device-to-host copy — the long-probe feeds frames straight back into
    the jitted VIO step, and a D2H+H2D round trip through the TPU tunnel
    costs ~0.3 s/frame).

    Per-frame exposure jitter follows the same RandomState recipe as
    textured.textured_frame_renderer (seed = scene.seed + 4321) so runs are
    deterministic for a given scene seed.
    """
    import jax
    import jax.numpy as jnp

    i2c = np.asarray(imu_to_camera, np.float64)
    Rc_np = np.asarray(i2c[:3, :3], np.float32)   # imu -> camera rotation
    t_cam_np = np.asarray(i2c[:3, 3], np.float32)

    # static pixel-grid camera-frame ray directions (H, W, 3) f32
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)
    u = (xx - cx) / fx
    v = (yy - cy) / fy
    if fisheye_coeffs is None:
        d_cam = np.stack([u, v, np.ones_like(u)], axis=-1)
    else:
        k1, k2, k3, k4 = fisheye_coeffs
        r = np.sqrt(u * u + v * v)
        theta = r.copy()  # Newton inversion of the KB4 odd polynomial
        for _ in range(8):
            t2 = theta * theta
            f = theta * (1 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))) - r
            fp = 1 + t2 * (3 * k1 + t2 * (5 * k2 + t2 * (7 * k3 + t2 * 9 * k4)))
            theta = theta - f / np.maximum(fp, 1e-9)
        safe_r = np.where(r > 1e-12, r, 1.0)
        s_t = np.sin(theta)
        d_cam = np.stack([s_t * u / safe_r, s_t * v / safe_r, np.cos(theta)],
                         axis=-1)
        d_cam = np.where(r[..., None] > 1e-12, d_cam,
                         np.stack([0 * u, 0 * v, np.ones_like(u)], -1))
    d_cam_j = jnp.asarray(d_cam, jnp.float32)

    occ_centers = jnp.asarray(scene.occ_centers, jnp.float32)
    occ_radii = np.asarray(scene.occ_radii)

    def quat_to_rmat(q):
        w, x, y, z = q[0], q[1], q[2], q[3]
        return jnp.array([
            [w*w + x*x - y*y - z*z, 2*(x*y - w*z), 2*(x*z + w*y)],
            [2*(x*y + w*z), w*w - x*x + y*y - z*z, 2*(y*z - w*x)],
            [2*(x*z - w*y), 2*(y*z + w*x), w*w - x*x - y*y + z*z],
        ], jnp.float32)

    def render_once(Rc, t_cam, pos, quat):
        R = quat_to_rmat(quat)
        o = pos.astype(jnp.float32) - R.T @ (Rc.T @ t_cam)
        w2c = Rc @ R
        d = d_cam_j @ w2c  # (H, W, 3) world-frame ray dirs

        t_hit = jnp.full((height, width), jnp.inf, jnp.float32)
        shade = jnp.full((height, width), 0.45, jnp.float32)

        # cylinder wall
        a = d[..., 0] ** 2 + d[..., 1] ** 2
        b = 2 * (o[0] * d[..., 0] + o[1] * d[..., 1])
        c = o[0] ** 2 + o[1] ** 2 - jnp.float32(scene.wall_radius ** 2)
        disc = b * b - 4 * a * c
        safe_a = jnp.where(a > 1e-12, a, 1.0)
        t_wall = (-b + jnp.sqrt(jnp.maximum(disc, 0.0))) / (2 * safe_a)
        hit_w = (disc > 0) & (a > 1e-12) & (t_wall > 1e-6)
        px = o[0] + t_wall * d[..., 0]
        py = o[1] + t_wall * d[..., 1]
        pz = o[2] + t_wall * d[..., 2]
        in_band = (pz > scene.floor_z) & (pz < scene.ceil_z)
        sel = hit_w & in_band
        ang = jnp.arctan2(py, px) / jnp.float32(2 * np.pi) + 0.5
        tex_w = _value_noise(
            jnp, ang * jnp.float32(scene.wall_radius * 2 * np.pi / 4.0),
            (pz - scene.floor_z) / 4.0, octaves=5,
            base_scale=scene.tex_scale_wall, seed=scene.seed)
        t_hit = jnp.where(sel, t_wall, t_hit)
        shade = jnp.where(sel, 0.15 + scene.contrast * tex_w, shade)

        # floor and ceiling
        for z_plane, s_off in ((scene.floor_z, 100), (scene.ceil_z, 200)):
            dz = d[..., 2]
            ok_dz = jnp.abs(dz) > 1e-9
            tp = (jnp.float32(z_plane) - o[2]) / jnp.where(ok_dz, dz, 1.0)
            tp = jnp.where(ok_dz & (tp > 1e-6), tp, 1e6)
            pxp = o[0] + tp * d[..., 0]
            pyp = o[1] + tp * d[..., 1]
            inside = pxp ** 2 + pyp ** 2 < scene.wall_radius ** 2
            selp = (tp > 1e-6) & (tp < t_hit) & inside
            tex_p = _value_noise(jnp, pxp / 5.0 + 7.7, pyp / 5.0 + 3.3,
                                 octaves=4, base_scale=scene.tex_scale_floor,
                                 seed=scene.seed + s_off)
            t_hit = jnp.where(selp, tp, t_hit)
            shade = jnp.where(selp, 0.1 + scene.contrast * 0.8 * tex_p, shade)

        # spherical occluders
        for i in range(scene.n_occluders):
            cen = occ_centers[i]
            r_i = jnp.float32(occ_radii[i])
            oc = o - cen
            b2 = 2 * jnp.einsum("hwi,i->hw", d, oc)
            a2 = jnp.einsum("hwi,hwi->hw", d, d)
            c2 = oc @ oc - r_i * r_i
            disc2 = b2 * b2 - 4 * a2 * c2
            ts = (-b2 - jnp.sqrt(jnp.maximum(disc2, 0.0))) / (
                2 * jnp.where(a2 > 1e-12, a2, 1.0))
            sel2 = (disc2 > 0) & (ts > 1e-6) & (ts < t_hit)
            hx = o[0] + ts * d[..., 0] - cen[0]
            hy = o[1] + ts * d[..., 1] - cen[1]
            hz = o[2] + ts * d[..., 2] - cen[2]
            su = jnp.arctan2(hy, hx) / jnp.float32(2 * np.pi) + 0.5
            sv = hz / jnp.float32(max(float(occ_radii[i]), 1e-6)) * 0.5 + 0.5
            tex_s = _value_noise(jnp, su * 4.0, sv * 2.0, octaves=3,
                                 base_scale=3.0, seed=scene.seed + 300 + i)
            t_hit = jnp.where(sel2, ts, t_hit)
            shade = jnp.where(sel2, 0.2 + scene.contrast * 0.9 * tex_s, shade)

        att = 1.0 / (1.0 + 0.02 * jnp.where(jnp.isfinite(t_hit), t_hit, 10.0))
        return jnp.clip(shade * att, 0.0, 1.0)

    def render_frame(Rc, t_cam, pos, quat, blur_pos, blur_quat, gain, bias,
                     key):
        img = render_once(Rc, t_cam, pos, quat)
        if motion_blur:
            img = 0.5 * (img + render_once(Rc, t_cam, blur_pos, blur_quat))
        img = img * gain + bias
        if pixel_noise > 0:
            img = img + jnp.float32(pixel_noise) * jax.random.normal(
                key, img.shape, jnp.float32)
        return jnp.clip(img, 0.0, 1.0)

    prog_key = (_scene_key(scene), width, height, fx, fy, cx, cy,
                tuple(fisheye_coeffs) if fisheye_coeffs is not None else None,
                motion_blur, float(pixel_noise))
    if prog_key not in _PROGRAM_CACHE:
        _PROGRAM_CACHE[prog_key] = jax.jit(
            jax.vmap(render_frame, in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0)))
    batched = _PROGRAM_CACHE[prog_key]

    def render_sequence(seq, frame_indices=None, chunk: int = 32,
                        device: bool = False):
        """Render frames of a SyntheticSequence; returns (F, H, W) f32 —
        numpy by default, or the on-device jnp array with `device=True`.

        frame_indices: indices into seq.frame_sample_idx (default: all).
        Deterministic per-frame exposure/noise follows the numpy renderer's
        seeding (RandomState(scene.seed + 4321), noise key scene.seed*1000+fi).
        """
        if frame_indices is None:
            frame_indices = np.arange(len(seq.frame_sample_idx))
        frame_indices = np.asarray(frame_indices)
        F_all = len(seq.frame_sample_idx)
        rng = np.random.RandomState(scene.seed + 4321)
        gains_all = 1.0 + exposure_jitter * rng.randn(F_all)
        biases_all = 0.04 * exposure_jitter * rng.randn(F_all)

        k_idx = seq.frame_sample_idx[frame_indices]
        pos = seq.pos[k_idx].astype(np.float32)
        quat = seq.quat[k_idx].astype(np.float32)
        kb = np.maximum(k_idx - 2, 0)  # ~half an IMU-step exposure window
        # frame 0 has no preceding pose: blur degenerates to the same pose
        kb = np.where(k_idx > 0, kb, k_idx)
        bpos = seq.pos[kb].astype(np.float32)
        bquat = seq.quat[kb].astype(np.float32)
        gains = gains_all[frame_indices].astype(np.float32)
        biases = biases_all[frame_indices].astype(np.float32)

        import jax

        keys = jax.vmap(jax.random.PRNGKey)(
            np.asarray(scene.seed * 1000 + frame_indices, np.uint32))

        n = len(frame_indices)
        keys = np.asarray(keys)
        Rc = jnp.asarray(Rc_np)
        t_cam = jnp.asarray(t_cam_np)
        chunks = []
        out = None if device else np.empty((n, height, width), np.float32)
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            # pad the last chunk to the full chunk size so the vmapped
            # program compiles exactly once
            sl = np.arange(s, s + chunk)
            sl = np.minimum(sl, n - 1)
            imgs = batched(Rc, t_cam, pos[sl], quat[sl], bpos[sl], bquat[sl],
                           gains[sl], biases[sl], keys[sl])
            if device:
                chunks.append(imgs[:e - s])
            else:
                out[s:e] = np.asarray(imgs)[:e - s]
        if device:
            return chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks)
        return out

    return render_sequence
