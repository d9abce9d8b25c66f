"""int8 feature-table storage with per-column symmetric scales.

Production-scale graphs are feature-HBM-bound: the Reddit-shaped bench moves
~170 MB of gathered bf16 feature rows per step, and the gather pays
~5 ns/KB on top of its ~10 ns/row floor (RESULTS.md "Efficiency analysis").
Storing the table int8 halves both the resident table (280 -> 140 MB at
Reddit scale) and every gathered byte; dequantization is one fused
multiply on the gathered rows.

Quantization is symmetric per COLUMN (feature dimension): column scales are
a tiny replicated ``(d,)`` vector, so the gather stays a single int8 row
fetch — no per-row scale lookup (which would itself pay the per-row gather
floor).

``QuantizedFeats`` duck-types the feature table: ``qf[ids]`` returns
dequantized rows in the compute dtype and ``.shape``/``.dtype`` match the
dense table, so the model, trainer, and unsupervised paths consume it
unchanged (they only ever do ``feats[ids]`` — nn/model.py:126).

Beyond-reference capability: the reference (bkj/pytorch-graphsage,
problem.py — mount empty at survey time, SURVEY.md §0) keeps float32
features resident on the GPU with no compression option.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class QuantizedFeats:
    """int8 feature rows + per-column scales; indexes like a dense table."""

    q: jnp.ndarray        # (n, d) int8
    scale: jnp.ndarray    # (d,) float32 — symmetric per-column scale
    out_dtype: str = struct.field(pytree_node=False, default="bfloat16")

    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self) -> int:
        return self.q.ndim

    @property
    def dtype(self):
        return jnp.dtype(self.out_dtype)

    def __getitem__(self, idx) -> jnp.ndarray:
        rows = self.q[idx]
        dt = jnp.dtype(self.out_dtype)
        return rows.astype(dt) * self.scale.astype(dt)

    def row_gather(self, ids: jnp.ndarray, form: str | None = None) -> jnp.ndarray:
        """Form-aware gather (tpu_sage.ops): under ``"masked"`` the select
        lands directly on the int8 gather output — which is what flips XLA's
        TPU gather emitter to the fast form — then dequantize."""
        from tpu_sage import ops

        rows = ops.row_gather(self.q, ids, form=form)
        dt = jnp.dtype(self.out_dtype)
        return rows.astype(dt) * self.scale.astype(dt)

    def fanout_mean(
        self, ids: jnp.ndarray, n_roots: int, fanout: int,
        form: str | None = None,
    ) -> jnp.ndarray:
        """Gather + fanout-mean with ONE dequantization per mean.

        Sums the raw int8 rows in int32 — exact: ``|sum| ≤ fanout·127``
        overflows int32 only past fanout 2**24 — then applies
        ``scale / fanout`` once per output row. Equivalent to
        mean-of-dequantized-rows up to float rounding *order* (the integer
        sum is exact, so this is the more precise of the two), and it moves
        the per-row dequant multiply off the gathered stream: ``fanout×``
        fewer multiplies and the reduction runs in integer adds.
        Dispatched from ``ops.row_gather_fanout_mean`` per chunk (masked
        form zeros OOB rows, which sum as zeros, matching the dense path).
        """
        from tpu_sage import ops

        rows = ops.row_gather(self.q, ids, form=form)
        s = jnp.sum(rows.reshape(n_roots, fanout, rows.shape[-1]).astype(jnp.int32), axis=1)
        dt = jnp.dtype(self.out_dtype)
        return (s.astype(jnp.float32) * (self.scale / fanout)).astype(dt)

    def dequantize(self) -> jnp.ndarray:
        """The full dense table (for full-graph inference/export)."""
        return self[...]


def quantize_np(feats: np.ndarray):
    """Host-side: float features -> ``(q int8, scale float32)`` numpy pair.

    ``scale[j] = max|feats[:, j]| / 127`` (1.0 for all-zero columns);
    values round to the nearest step, so per-element error is bounded by
    ``scale[j] / 2``.
    """
    feats = np.asarray(feats, dtype=np.float32)
    absmax = np.abs(feats).max(axis=0)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(feats / scale), -127, 127).astype(np.int8)
    return q, scale


def quantize_feats(
    feats: np.ndarray, out_dtype: str = "bfloat16"
) -> QuantizedFeats:
    """Host-side: float features -> device int8 table + per-column scales."""
    q, scale = quantize_np(feats)
    return QuantizedFeats(
        q=jnp.asarray(q), scale=jnp.asarray(scale), out_dtype=out_dtype
    )
