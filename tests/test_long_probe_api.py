"""The long-probe stereo family driven through the FULL VioApi stack.

VERDICT r3 weak item 4: the jitted-loop probes (`eval/long_probe._run_jitted`)
never exercised the API/sample-sync/host layer at accuracy-measuring scale, so
a host-layer regression (sync pairing, D2H batching, output conversion) would
not show up in the headline evidence. These tests run the SAME textured stereo
world through both paths at reduced shape and assert the API path lands within
noise of the jitted loop (reference hot path is always through the API,
src/api/api.cpp:528-628).
"""
import numpy as np
import pytest

from hybvio_tpu.eval.long_probe import run_long_probe

REDUCED = dict(duration=10.0, width=320, frame_rate=10.0, imu_rate=100.0,
               chunk=16)


@pytest.mark.slow
def test_stereo_api_matches_jitted_loop():
    jit = run_long_probe("stereo", **REDUCED)
    api = run_long_probe("stereo_api", **REDUCED)
    assert jit["finite"] and api["finite"]
    assert jit["ate_rmse_m"] < 0.3, jit
    # within noise of the jitted number: the API path chunks IMU into padded
    # batches and runs the same jitted step, so the difference is host-layer
    # pairing/conversion jitter only
    assert api["ate_rmse_m"] < max(2.0 * jit["ate_rmse_m"], jit["ate_rmse_m"] + 0.05), (api, jit)
    assert api["fps_steady"] > 0
    assert api["frames"] == jit["frames"] + 1  # API counts frame 0 too


@pytest.mark.slow
def test_long_probe_scan_matches_eager():
    """The chunked lax.scan driver (default) must reproduce the eager
    per-frame dispatch loop — same vio_step, same frame/IMU stream."""
    import os

    kw = dict(duration=6.0, width=192, frame_rate=10.0, imu_rate=100.0,
              chunk=8)
    os.environ["HYBVIO_LONG_SCAN"] = "1"
    try:
        scan = run_long_probe("stereo", **kw)
    finally:
        os.environ.pop("HYBVIO_LONG_SCAN")
    eager = run_long_probe("stereo", **kw)
    assert scan["finite"] and eager["finite"]
    assert abs(scan["ate_rmse_m"] - eager["ate_rmse_m"]) < 1e-3, (scan, eager)


@pytest.mark.slow
def test_stereo_api_uses_native_sync_when_built():
    from hybvio_tpu.io.native_sync import native_available

    if not native_available():
        pytest.skip("native library not built")
    api = run_long_probe("stereo_api", duration=4.0, width=192,
                         frame_rate=10.0, imu_rate=100.0, chunk=8)
    assert api["native_sync"] is True
    assert api["finite"]
