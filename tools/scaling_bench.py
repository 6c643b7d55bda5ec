#!/usr/bin/env python
"""Multi-chip scaling measurements (VERDICT round-2 item 4).

What can honestly be measured in this environment:
  * this host exposes ONE real TPU chip (via a tunnel) and ONE CPU core, so
    virtual-device meshes cannot show wall-clock speedup (all virtual
    devices share the single core) — they validate CORRECTNESS and the
    per-device problem split;
  * the single-chip BA cost curve vs problem size (map points / keyframes)
    is measurable on the real chip, and with the sharded design's cost
    model it yields the crossover where the psum path beats one device.

Cost model of slam/ba.py make_sharded_ba (map-point axis sharded, poses
replicated): per device T(MP/n) point-side work + fixed replicated
(NK*6)^2 Schur solve + psum of the (NK*6)^2 normal equations over ICI.
Sharding over n chips wins when the point-side saving
T_pts(MP) * (n-1)/n exceeds the psum cost (~2 * (NK*6)^2 * 4 bytes / ICI
bandwidth + latency, sub-ms for NK<=40 on any TPU interconnect).

Usage:
  python tools/scaling_bench.py ba-sweep     # single-device curve (ambient
                                             # backend: real TPU under axon)
  python tools/scaling_bench.py mesh-check   # virtual 1/2/4/8-device
                                             # equality + split (subprocess,
                                             # CPU)
Prints one JSON line per mode.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_problem(jnp, NK=20, MP=128, seed=0):
    """Synthetic well-posed BA problem of the given size."""
    from hybvio_tpu.slam.ba import BAProblem

    rng = np.random.RandomState(seed)
    # cameras on an arc looking at a point cloud
    poses = np.zeros((NK, 7))
    poses[:, 3] = 1.0
    poses[:, 0] = np.linspace(0, 2.0, NK)
    pts = rng.randn(MP, 3) * 2.0 + np.array([1.0, 0.0, 6.0])
    obs_ip = np.zeros((NK, MP, 2))
    obs_mask = np.zeros((NK, MP), bool)
    for i in range(NK):
        rel = pts - poses[i, :3]
        obs_ip[i] = rel[:, :2] / rel[:, 2:3]
        obs_mask[i] = rel[:, 2] > 1.0
    obs_ip += 0.002 * rng.randn(*obs_ip.shape)
    rel7 = np.zeros((NK - 1, 7))
    rel7[:, 3] = 1.0
    rel7[:, 0] = poses[1, 0] - poses[0, 0]
    return BAProblem(
        poses=jnp.asarray(poses), points=jnp.asarray(pts * (1 + 0.01 * rng.randn(MP, 3))),
        obs_ip=jnp.asarray(obs_ip), obs_mask=jnp.asarray(obs_mask),
        pose_valid=jnp.ones(NK, bool), point_valid=jnp.ones(MP, bool),
        prior_rel=jnp.asarray(rel7), prior_mask=jnp.ones(NK - 1, bool),
        prior_w_pos=jnp.asarray(5.0), prior_w_rot=jnp.asarray(50.0))


def _time_ms(fn, arg, jax, min_total_s=0.5, min_reps=3):
    """Robust per-call ms: warm up twice, then run reps in growing batches
    until total wall >= min_total_s. Each batch ends with a VALUE fetch of
    the result (np.asarray), not just block_until_ready: over the axon TPU
    tunnel block_until_ready returns at enqueue, so only a D2H of the output
    actually observes execution completion. The fetched array is tiny
    ((NK,7) poses), so the added round trip is amortized over the reps."""
    out = fn(arg)
    _ = np.asarray(out[0])
    out = fn(arg)
    _ = np.asarray(out[0])
    reps_done, elapsed = 0, 0.0
    reps = min_reps
    while elapsed < min_total_s:
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(arg)
        _ = np.asarray(out[0])
        elapsed += time.perf_counter() - t0
        reps_done += reps
        reps = max(reps, int(reps_done * 1.5))
        if reps_done > 100000:
            break
    return 1000.0 * elapsed / reps_done


def ba_sweep():
    """Single-device BA wall-clock vs (NK, MP) on the ambient backend, plus
    the sharding crossover estimate.

    Cost model (slam/ba.py make_sharded_ba: map-point axis sharded, poses
    replicated): n chips each do the point-side work on MP/n points, then
    psum the (NK*6)^2 camera normal equations over ICI and run the
    replicated Schur solve. Sharding wins when the point-side saving
    T_pts(MP)*(n-1)/n exceeds the psum cost — for NK<=80 the psum payload is
    (480^2+480)*4 B ~ 0.9 MB, well under 1 ms on any TPU ICI generation."""
    import jax
    import jax.numpy as jnp

    from hybvio_tpu.slam.ba import ba_iterate

    rows = []
    # MP capped at 32k for large NK: the (NK, MP) per-observation Jacobian
    # blocks OOM a single v5e HBM beyond that — which is itself part of the
    # sharding story (the map-point axis split also divides this memory)
    for NK, mps in ((20, (1024, 8192, 32768, 65536)),
                    (40, (1024, 8192, 32768)),
                    (80, (1024, 8192, 32768))):
        fn = jax.jit(lambda p: ba_iterate(p, iterations=8))
        for MP in mps:
            prob = _make_problem(jnp, NK, MP)
            ms = _time_ms(fn, prob, jax)
            rows.append({"NK": NK, "MP": MP, "ms": round(ms, 3)})
    # Point-side marginal cost per 1k points at each NK (least-squares slope
    # over the MP sweep); crossover where the 2-chip saving T_pts/2 exceeds
    # an assumed ~1 ms psum+latency budget.
    psum_ms = 1.0
    analysis = []
    for NK in (20, 40, 80):
        sub = [r for r in rows if r["NK"] == NK]
        xs = np.array([r["MP"] for r in sub], float)
        ys = np.array([r["ms"] for r in sub], float)
        slope = float(np.polyfit(xs, ys, 1)[0])  # ms per point
        fixed = float(max(ys[0] - slope * xs[0], 0.0))
        crossover = int(2 * psum_ms / slope) if slope > 1e-9 else None
        analysis.append({
            "NK": NK,
            "ms_fixed_overhead": round(fixed, 3),
            "ms_per_1k_points": round(slope * 1000, 4),
            "crossover_points_2chips": crossover,
        })
    result = {
        "mode": "ba-sweep",
        "backend": jax.default_backend(),
        "rows": rows,
        "assumed_psum_ms": psum_ms,
        "analysis": analysis,
    }
    print(json.dumps(result))


def mesh_check():
    """Sharded-vs-unsharded equality + per-device split on virtual CPU
    meshes of 1/2/4/8 devices (subprocess per size; wall-clock on virtual
    devices is NOT a scaling measurement on this 1-core host)."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = []
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        flags = " ".join(f for f in env.get("XLA_FLAGS", "").split()
                         if "force_host_platform_device_count" not in f)
        env["XLA_FLAGS"] = (flags +
                            f" --xla_force_host_platform_device_count={n}").strip()
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "_mesh_child", str(n)],
            env=env, cwd=here, capture_output=True, text=True, timeout=900)
        if r.returncode != 0:
            out.append({"devices": n, "ok": False,
                        "err": r.stderr[-500:]})
        else:
            out.append(json.loads(r.stdout.strip().splitlines()[-1]))
    print(json.dumps({"mode": "mesh-check", "results": out}))


def _mesh_child(n):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from hybvio_tpu.slam.ba import ba_iterate, make_sharded_ba

    MP, NK = 1024, 20
    prob = _make_problem(jnp, NK, MP)
    ref_poses, ref_pts, _ = jax.jit(lambda p: ba_iterate(p, iterations=8))(prob)
    mesh = Mesh(np.array(jax.devices()[:n]), ("data",))
    sharded = make_sharded_ba(mesh, iterations=8)
    sp, spts, _ = sharded(prob)
    ok = bool(np.allclose(np.asarray(ref_poses), np.asarray(sp), atol=1e-5)
              and np.allclose(np.asarray(ref_pts), np.asarray(spts), atol=1e-4))
    print(json.dumps({"devices": n, "ok": ok,
                      "points_per_device": MP // n,
                      "NK_replicated": NK}))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "ba-sweep"
    if mode == "ba-sweep":
        ba_sweep()
    elif mode == "mesh-check":
        mesh_check()
    elif mode == "_mesh_child":
        _mesh_child(int(sys.argv[2]))
    else:
        raise SystemExit(f"unknown mode {mode}")
