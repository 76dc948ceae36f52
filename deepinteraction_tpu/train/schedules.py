"""Cyclic cosine schedules (mmcv CyclicLrUpdater / CyclicMomentumUpdater).

Reference training uses lr_config policy 'cyclic' with target_ratio
(10, 1e-4), step_ratio_up 0.4 and the matching momentum cycle
(config Fusion_0075_refactor.py:254-263): cosine-anneal base -> base*r0 over
the first 40% of steps, then base*r0 -> base*r1 over the rest.
"""

from __future__ import annotations

import jax.numpy as jnp


def cyclic_cosine(base: float, ratio0: float, ratio1: float, up_frac: float, total_steps: int):
    up = max(int(total_steps * up_frac), 1)
    down = max(total_steps - up, 1)

    def schedule(step):
        step = jnp.minimum(step, total_steps)
        in_up = step < up
        t_up = jnp.clip(step / up, 0.0, 1.0)
        t_dn = jnp.clip((step - up) / down, 0.0, 1.0)

        def cos_anneal(a, b, t):
            return b + (a - b) * (jnp.cos(jnp.pi * t) + 1.0) * 0.5

        v_up = cos_anneal(base, base * ratio0, t_up)
        v_dn = cos_anneal(base * ratio0, base * ratio1, t_dn)
        return jnp.where(in_up, v_up, v_dn)

    return schedule
