"""EKF state layout and initialization.

State vector layout (identical to the reference, src/odometry/ekf.hpp:9-43):

    m = [ pos(3), vel(3), quat(4, wxyz), bga(3), baa(3), bat(3), sft(1),
          trail poses (7 each: pos(3), quat(4)) x L,
          hybrid map points (3 each) x M ]

with dense covariance P (d x d), d = 20 + 7 L + 3 M (static per config).

The TPU redesign keeps the whole filter as a pytree of fixed-shape arrays so a
frame step traces to one XLA program; there is no pointer bookkeeping. Scalars
(timers, counters) live in the pytree as 0-d arrays so control flow stays
traceable.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# indices into the state vector (reference: ekf.hpp:26-43)
POS = 0
VEL = 3
ORI = 6
BGA = 10
BAA = 13
BAT = 16
SFT = 19
CAM = 20
INER_DIM = CAM
POSE_DIM = 7
MAP_POINT_DIM = 3

# process noise layout (reference: ekf.hpp:46-51)
Q_ACC = 0
Q_GYRO = 3
Q_BGA_DRIFT = 6
Q_BAA_DRIFT = 9
Q_DIM = 12


class EKFState(NamedTuple):
    """Filter state pytree (all arrays)."""

    m: jnp.ndarray  # (d,)
    P: jnp.ndarray  # (d, d)
    time: jnp.ndarray  # () seconds since first sample
    prev_sample_t: jnp.ndarray  # ()
    first_sample_t: jnp.ndarray  # ()
    got_first_sample: jnp.ndarray  # () bool
    zupt_time: jnp.ndarray  # () last ZUPT time (-1 = never)
    zrupt_time: jnp.ndarray  # ()
    init_zupt_time: jnp.ndarray  # ()
    was_stationary: jnp.ndarray  # () bool
    augment_count: jnp.ndarray  # () int32, number of valid trail poses
    pose_times: jnp.ndarray  # (L,) timestamp per trail slot (slot 0 = newest)

    @property
    def pos(self):
        return self.m[POS : POS + 3]

    @property
    def vel(self):
        return self.m[VEL : VEL + 3]

    @property
    def ori(self):
        return self.m[ORI : ORI + 4]

    @property
    def bga(self):
        return self.m[BGA : BGA + 3]

    @property
    def baa(self):
        return self.m[BAA : BAA + 3]

    @property
    def bat(self):
        return self.m[BAT : BAT + 3]

    @property
    def sft(self):
        return self.m[SFT]

    @property
    def state_dim(self):
        return self.m.shape[-1]


def state_dim(camera_trail_length: int, hybrid_map_size: int) -> int:
    return INER_DIM + POSE_DIM * camera_trail_length + MAP_POINT_DIM * hybrid_map_size


def trail_pose_slice(i: int):
    """Slice of trail pose i (0 = newest historical pose)."""
    return slice(CAM + POSE_DIM * i, CAM + POSE_DIM * (i + 1))


def map_point_offset(d: int, hybrid_map_size: int, idx) -> int:
    return d - MAP_POINT_DIM * hybrid_map_size + MAP_POINT_DIM * idx


def init_state(po, dtype=jnp.float64, sqrt_mode: bool = False) -> EKFState:
    """Build the initial filter state from ParametersOdometry
    (reference: ekf.cpp:153-296).

    sqrt_mode: the P field holds the square-root factor W (P = W W^T,
    ekf/sqrt.py); the initial diagonal covariance factors elementwise."""
    L = po.cameraTrailLength
    M = po.hybridMapSize
    d = state_dim(L, M)
    noise_scale = po.noiseScale * po.noiseScale

    m = np.zeros(d)
    m[ORI] = 1.0
    m[BAT : BAT + 3] = 1.0

    Pd = np.zeros(d)
    Pd[POS : POS + 3] = po.noiseInitialPos**2
    Pd[VEL : VEL + 3] = po.noiseInitialVel**2
    Pd[ORI : ORI + 4] = 1.0  # placeholder until initialize_orientation
    Pd[BGA : BGA + 3] = po.noiseInitialBGA**2
    Pd[BAA : BAA + 3] = po.noiseInitialBAA**2
    Pd[BAT : BAT + 3] = po.noiseInitialBAT**2
    Pd[SFT] = po.noiseInitialSFT**2
    for i in range(L):
        s = CAM + POSE_DIM * i
        Pd[s : s + 3] = po.noiseInitialPosTrail**2
        Pd[s + 3 : s + 7] = po.noiseInitialOriTrail**2
    P = np.diag(Pd) * noise_scale
    if sqrt_mode:
        P = np.sqrt(P)

    return EKFState(
        m=jnp.asarray(m, dtype=dtype),
        P=jnp.asarray(P, dtype=dtype),
        time=jnp.zeros((), dtype=dtype),
        prev_sample_t=jnp.asarray(-1.0, dtype=dtype),
        first_sample_t=jnp.asarray(-1.0, dtype=dtype),
        got_first_sample=jnp.zeros((), dtype=bool),
        zupt_time=jnp.asarray(-1.0, dtype=dtype),
        zrupt_time=jnp.asarray(-1.0, dtype=dtype),
        init_zupt_time=jnp.asarray(-1.0, dtype=dtype),
        was_stationary=jnp.zeros((), dtype=bool),
        augment_count=jnp.zeros((), dtype=jnp.int32),
        pose_times=jnp.full((L,), -1.0, dtype=dtype),
    )


def process_noise_q(po, dtype=jnp.float64) -> jnp.ndarray:
    """Constant part of the process noise diagonal (acc & gyro blocks);
    the bias random-walk blocks are dt-dependent and filled in predict."""
    noise_scale = po.noiseScale * po.noiseScale
    q = np.zeros(Q_DIM)
    q[Q_ACC : Q_ACC + 3] = po.noiseProcessAcc**2
    q[Q_GYRO : Q_GYRO + 3] = po.noiseProcessGyro**2
    return jnp.asarray(q * noise_scale, dtype=dtype)


STATE_PART_NAMES = ("POS", "VEL", "ORI", "BGA", "BAA", "BAT", "SFT")
STATE_PARTS = (POS, VEL, ORI, BGA, BAA, BAT, SFT)
STATE_PART_SIZES = (3, 3, 4, 3, 3, 3, 1)


def state_as_string(s: "EKFState") -> str:
    """One-line digest of the inertial state + uncertainties
    (reference: EKF::stateAsString, ekf.cpp:998-1022)."""
    import numpy as np

    m = np.asarray(s.m)
    var = np.asarray(jnp.diagonal(s.P))[:INER_DIM]
    parts = []
    for name, off, size in zip(STATE_PART_NAMES, STATE_PARTS, STATE_PART_SIZES):
        vals = " ".join(f"{m[off + j]:.3g}" for j in range(size))
        v = float(np.sqrt(max(var[off:off + size].max(), 0.0)))
        parts.append(f"{name} {vals} [{v:.2g}]")
    return ", ".join(parts) + f", t {float(s.time):.3f}"
