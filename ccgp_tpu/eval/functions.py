"""Closed-form benchmark functions from the reference case studies.

1-D set: `1D Codes and Designs/1D Combined GP Public.R:331-339`;
2-D set: `2D Codes and Designs/2D Combined GP Isotropic Public.R:329-341`;
batch-design set (on [-1,1]^2): `Batch Sequential ME Designs/Batch
Sequential ME Design.R:329-337`.
"""
from __future__ import annotations

import jax.numpy as jnp


def test_function_1d(x: jnp.ndarray, code: int) -> jnp.ndarray:
    x = jnp.asarray(x)
    x = x[..., 0] if x.ndim >= 1 and x.shape[-1:] == (1,) and x.ndim > 1 else x
    if code == 1:
        return 0.5 * jnp.sin(10 * x) + 0.5 * jnp.cos(15 * x)
    if code == 2:
        return jnp.sin(10 * x)
    if code == 3:
        u = 18 * x - 9
        return jnp.where(u == 0, 1.0, jnp.sin(u) / jnp.where(u == 0, 1.0, u))
    if code == 4:
        return jnp.exp(3 * x) * jnp.cos(5 * (x - 2))
    raise ValueError(f"unknown 1-D function code {code}")


def test_function_2d(xy: jnp.ndarray, code: int) -> jnp.ndarray:
    xy = jnp.asarray(xy)
    x, y = xy[..., 0], xy[..., 1]
    if code == 1:
        return (jnp.exp(-1.4 * x) * jnp.cos(7 * jnp.pi * x * y / 2)
                + jnp.log(x + y + 0.1))
    if code == 2:
        return (((x - 0.2) ** 2 - (y - 0.7) ** 2)
                * jnp.exp(-5 * ((x - 0.8) ** 2 + (y - 0.1) ** 2))
                * jnp.cos(10 * (x - 0.5) * y))
    if code == 3:
        return (((x - 0.5) ** 2 + 4 * (y - 0.8) ** 2)
                * (jnp.cos(jnp.pi * (x - 0.1)) + jnp.cos(jnp.pi * (y - 0.5))))
    if code == 4:
        return ((jnp.sin(2 * x) + jnp.cos(4 * x))
                * (jnp.sin(8 * y) + jnp.cos(4 * y)))
    if code == 5:
        u = 9 * x - 4.5
        v = 12 * y - 6
        su = jnp.where(u == 0, 1.0, jnp.sin(u) / jnp.where(u == 0, 1.0, u))
        sv = jnp.where(v == 0, 1.0, jnp.sin(v) / jnp.where(v == 0, 1.0, v))
        return su * sv
    raise ValueError(f"unknown 2-D function code {code}")


def test_function_batch(xy: jnp.ndarray, code: int) -> jnp.ndarray:
    """The batch-sequential design study's pair (defined on [-1,1]^2)."""
    if code == 1:
        return test_function_2d(xy, 2)
    if code == 2:
        return test_function_2d(xy, 3)
    raise ValueError(f"unknown batch function code {code}")
