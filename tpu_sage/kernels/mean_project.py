"""Fused fanout-mean + projection Pallas kernel with custom VJP.

Computes ``out = mean(x, axis=1) @ W`` for ``x: (B, F, D)``, ``W: (D, O)`` —
the mean aggregator's neighbor branch — without materializing the mean in
HBM: each grid step reduces a batch tile's fanout axis in VMEM and feeds the
MXU directly.

Backward (custom VJP, also Pallas-ready math but expressed in XLA — it is a
plain pair of matmuls XLA schedules optimally):
  dW = meanx^T @ g          (recomputes meanx — cheap, avoids a residual)
  dx = broadcast(g @ W^T) / F
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(x_ref, w_ref, o_ref):
    x = x_ref[:]                                   # (TB, F, D)
    meanx = jnp.mean(x, axis=1)                    # (TB, D) — VMEM only
    # MXU accumulation must be 32-bit (Mosaic rejects a bf16 acc); cast the
    # f32 accumulator down to the output dtype afterwards
    o_ref[:] = jnp.dot(
        meanx, w_ref[:], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _pallas_forward(x, w, tile_b, interpret):
    b, f, d = x.shape
    o = w.shape[1]
    pad = (-b) % tile_b
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, f, d), x.dtype)])
    grid = (x.shape[0] // tile_b,)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, f, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, o), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, o), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], o), x.dtype),
        interpret=interpret,
    )(x, w)
    return out[:b]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def mean_project(x, w, tile_b: int = 128, interpret: bool = False):
    # tile_b=128: the (TB, F, D) input tile double-buffers in VMEM; 256 blew
    # the 16M scoped-vmem limit at the Reddit shape (10×602 bf16) on v5e
    return _pallas_forward(x, w, tile_b, interpret)


def _fwd(x, w, tile_b, interpret):
    return _pallas_forward(x, w, tile_b, interpret), (x, w)


def _bwd(tile_b, interpret, res, g):
    x, w = res
    f = x.shape[1]
    meanx = jnp.mean(x, axis=1)
    dw = meanx.T @ g
    dmean = g @ w.T                                # (B, D)
    dx = jnp.broadcast_to(dmean[:, None, :] / f, x.shape)
    return dx, dw


mean_project.defvjp(_fwd, _bwd)
