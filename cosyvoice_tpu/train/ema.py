"""Exponential moving average of parameters.

Behavioral spec: reference `cosyvoice/utils/ema.py:4-60` (shadow params,
shadow = decay*shadow + (1-decay)*param; apply/restore swap).  Functional:
the shadow is just another pytree.
"""
from __future__ import annotations

import jax


def ema_init(params):
    return jax.tree.map(lambda x: x, params)


def ema_update(shadow, params, decay: float = 0.999):
    return jax.tree.map(lambda s, p: decay * s + (1.0 - decay) * p,
                        shadow, params)
