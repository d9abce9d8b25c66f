"""LR schedules: constant / linear / cyclical / sgdr (reference ``lr.py``).

The reference updates the LR *every batch* from fractional epoch progress
``p = epoch + batch/batches_per_epoch`` (SURVEY.md §2.1 "LR schedules").
Schedules here are pure functions ``f(progress) -> lr`` built from jnp math,
so they can live inside a jit'd train step as a function of the step counter
(``progress = step / steps_per_epoch``) — no host-side optimizer mutation.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


class LRSchedule:
    """Factory namespace mirroring the reference's ``LRSchedule`` class."""

    @staticmethod
    def constant(lr_init: float = 0.01, **_) -> Schedule:
        def f(progress):
            return jnp.asarray(lr_init, dtype=jnp.float32) * jnp.ones_like(
                jnp.asarray(progress, dtype=jnp.float32)
            )
        return f

    @staticmethod
    def linear(lr_init: float = 0.01, epochs: float = 10.0, **_) -> Schedule:
        """Linear decay to 0 over the run."""
        def f(progress):
            p = jnp.asarray(progress, dtype=jnp.float32)
            return lr_init * jnp.maximum(0.0, 1.0 - p / epochs)
        return f

    @staticmethod
    def cyclical(lr_init: float = 0.01, lr_min: float = 0.0, period: float = 1.0, **_) -> Schedule:
        """Triangle wave per ``period`` epochs: lr_init → lr_min → lr_init."""
        def f(progress):
            p = jnp.asarray(progress, dtype=jnp.float32) / period
            frac = p - jnp.floor(p)                       # [0, 1)
            tri = 1.0 - jnp.abs(2.0 * frac - 1.0)         # 0 → 1 → 0
            return lr_min + (lr_init - lr_min) * (1.0 - tri)
        return f

    @staticmethod
    def sgdr(
        lr_init: float = 0.01,
        lr_min: float = 0.0,
        period: float = 10.0,
        t_mult: float = 2.0,
        **_,
    ) -> Schedule:
        """Cosine annealing with warm restarts (Loshchilov & Hutter).

        Restart period grows by ``t_mult`` each cycle. Closed-form cycle
        lookup via logs (static math — jit friendly).
        """
        def f(progress):
            p = jnp.asarray(progress, dtype=jnp.float32)
            if t_mult == 1.0:
                t_cur = jnp.mod(p, period)
                t_i = jnp.asarray(period, dtype=jnp.float32)
            else:
                # cycle index n satisfies period*(t_mult^n - 1)/(t_mult - 1) <= p
                n = jnp.floor(
                    jnp.log(jnp.maximum(p / period * (t_mult - 1.0) + 1.0, 1.0))
                    / jnp.log(t_mult)
                )
                start = period * (t_mult ** n - 1.0) / (t_mult - 1.0)
                t_i = period * t_mult ** n
                t_cur = p - start
            return lr_min + 0.5 * (lr_init - lr_min) * (1.0 + jnp.cos(jnp.pi * t_cur / t_i))
        return f

    lookup = {}  # populated below

    @staticmethod
    def set_lr(optimizer, lr):  # pragma: no cover - torch-style shim
        """Reference-API shim; in tpu_sage the LR flows through the schedule
        inside the jit'd step, so there is nothing to mutate."""
        raise NotImplementedError(
            "tpu_sage computes LR inside the jit'd train step; "
            "pass a schedule to the trainer instead"
        )


LRSchedule.lookup = {
    "constant": LRSchedule.constant,
    "linear": LRSchedule.linear,
    "cyclical": LRSchedule.cyclical,
    "sgdr": LRSchedule.sgdr,
}
