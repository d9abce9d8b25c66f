"""Shared device-side primitives.

``row_gather`` is the framework-wide spelling of ``table[ids]`` on the hot
path. Measured on the axon TPU backend (scripts/bench_gather_form.py,
232 965-node Reddit-shaped bench, batch 512, fanout (25, 10), bf16,
200-step scans, median-of-3):

  table[ids]  (plain)                              4.38 ms/step
  table[ids[None]][0]  (leading unit dim)          4.33
  table[clip(ids)]  (clip only)                    4.32
  clip + unit dim                                  4.34
  clip + where(in-bounds, rows, 0)  (THIS)         3.75   ← 14% whole step
  full dist_gather form (unit dim + clip + mask)   3.74

The post-gather select is what flips XLA's TPU lowering: it forces the
gathered rows to materialize as a standalone fused gather kernel instead of
being fused into the consumer (matmul / one-hot select), which serializes
into a slower latency-bound emitter. ``tpu_sage.dist.halo`` discovered the
fast form independently (its shard-local gathers need the clip + mask for
ownership semantics anyway); this lifts it to the single-device path.

For in-bounds ids the result — and its gradient — is element-identical to
``table[ids]``: clip is a no-op, the mask is all-true, and the backward is
the same scatter-add at the same indices (the where multiplies the cotangent
by 1). Out-of-bounds ids return zero rows instead of XLA's clamp semantics;
nothing in the framework relies on OOB clamping.
"""

from __future__ import annotations

import jax.numpy as jnp


def row_gather(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """``table[ids]`` via the measured-fast TPU lowering (see module doc).

    ``ids`` may have any shape; trailing table dims broadcast. OOB ids yield
    zero rows (never produced by the samplers — adjacency entries are valid
    node ids by construction, graph_data.py). Tables that know how to gather
    themselves (``QuantizedFeats``: mask the int8 rows, dequantize after)
    are dispatched to their own ``row_gather`` method.
    """
    own = getattr(table, "row_gather", None)
    if own is not None:
        return own(ids)
    m = table.shape[0]
    rows = table[jnp.clip(ids, 0, m - 1)]
    ok = (ids >= 0) & (ids < m)
    return jnp.where(ok.reshape(ok.shape + (1,) * (rows.ndim - ok.ndim)), rows, 0)
