"""Winner-takes-all disparity (reference d_dc_wta.cu)."""

from __future__ import annotations

import jax.numpy as jnp


def dc_wta(cost: jnp.ndarray, zero_disp: int) -> jnp.ndarray:
    """disp = argmin_d cost[d] - zero_disp, as float32.

    jnp.argmin keeps the first minimum, matching the reference's strict
    `lowest_cost > current_cost` scan (d_dc_wta.cu:24-34).
    """
    return (jnp.argmin(cost, axis=0) - zero_disp).astype(jnp.float32)
