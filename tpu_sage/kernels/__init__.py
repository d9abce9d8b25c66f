"""Pallas TPU kernels (flagged; XLA implementations remain the default).

Policy (SURVEY.md §7.0): the axon backend once hung on a trivial
``pallas_call`` (2026-08-16) and passed a re-probe the next day — so every
kernel here has a pure-XLA fallback, is tested in interpreter mode on CPU,
and is enabled on TPU only via ``TPU_SAGE_PALLAS=1`` after the timeboxed
probe in ``probe()``.

Current kernels:
- ``select_columns_pallas``: the sampler's one-hot column select.
- ``mean_project``: fused fanout-mean + projection (custom VJP) — the
  "gather+matmul+segment-reduce" family's compute half; measured on v5e the
  XLA fusion of the same ops is already latency-bound, so this serves as the
  integration template and microbenchmark target rather than a default-on win.
"""

from __future__ import annotations

import os

PALLAS_ENABLED = os.environ.get("TPU_SAGE_PALLAS", "0") == "1"


def probe(timeout: float = 90.0) -> bool:
    """Can a trivial kernel compile+run here? Runs in a SUBPROCESS with a
    timeout: on the axon backend pallas_call has been observed to hang
    indefinitely (2026-08-16 and again 2026-08-17 after one success), and a
    hang would otherwise take the caller down with it."""
    import subprocess
    import sys

    code = (
        "import jax, jax.numpy as jnp\n"
        "from jax.experimental import pallas as pl\n"
        "from jax.experimental.pallas import tpu as pltpu\n"
        "def k(x_ref, o_ref):\n"
        "    o_ref[:] = x_ref[:] * 2.0\n"
        "x = jnp.ones((8, 128), jnp.float32)\n"
        "out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),\n"
        "    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],\n"
        "    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)\n"
        "assert bool((out == 2.0).all())\n"
    )
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                           capture_output=True)
        return r.returncode == 0
    except Exception:
        return False


from tpu_sage.kernels.select import select_columns_pallas  # noqa: E402
from tpu_sage.kernels.mean_project import mean_project  # noqa: E402

__all__ = ["PALLAS_ENABLED", "probe", "select_columns_pallas", "mean_project"]
