"""Image utilities (reference: src/tracker/util.{hpp,cpp}): 90-degree
rotations and intensity matching between stereo / successive frames."""
from __future__ import annotations

import jax.numpy as jnp


def rotate_cw90(img: jnp.ndarray) -> jnp.ndarray:
    """Rotate 90 degrees clockwise (reference: rotateMatrixCW90)."""
    return jnp.flip(jnp.swapaxes(img, -1, -2), axis=-1)


def rotate(img: jnp.ndarray, cw90_steps: int) -> jnp.ndarray:
    out = img
    for _ in range(cw90_steps % 4):
        out = rotate_cw90(out)
    return out


def match_intensities(target_like: jnp.ndarray, img: jnp.ndarray,
                      strength: float = 1.0) -> jnp.ndarray:
    """Linearly match img's mean/std to target_like's
    (reference: matchIntensities, used to equalize stereo pairs /
    successive frames, tracker.cpp via main.cpp:763-777)."""
    mt = jnp.mean(target_like)
    st = jnp.std(target_like) + 1e-9
    mi = jnp.mean(img)
    si = jnp.std(img) + 1e-9
    matched = (img - mi) * (st / si) + mt
    out = img + strength * (matched - img)
    return jnp.clip(out, 0.0, 1.0)
