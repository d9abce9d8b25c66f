"""halo='measured' across a REAL process boundary: both processes must agree
on the winner. The race's wall-clocks are host-local (close but not bitwise
between processes), so without the process-0 broadcast in measure_halo_mode a
near-tie could resolve differently per process — divergent collective
programs deadlock. This drives the agreement path end to end."""

import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import json, sys
import jax
jax.distributed.initialize(
    coordinator_address=sys.argv[1], num_processes=2, process_id=int(sys.argv[2])
)
import numpy as np
from jax.sharding import Mesh

from tpu_sage.data.synthetic import sbm_store
from tpu_sage.dist.train import fit_partitioned
from tpu_sage.train.trainer import TrainConfig

assert jax.process_count() == 2
devs = np.array(jax.devices())          # 2 global devices, 1 per process
mesh = Mesh(devs.reshape(2), ("data",))

store = sbm_store(n_nodes=128, n_classes=3, feat_dim=8, avg_degree=5, seed=55)
cfg = TrainConfig(batch_size=16, epochs=2, n_train_samples=(4, 3),
                  n_val_samples=(4, 3), output_dims=(16, 16), lr_init=0.01,
                  halo="measured", halo_measure_steps=2)
recs = []
fit_partitioned(store, cfg, mesh=mesh, log=recs.append,
                eval_every_epoch=False)
resolved = next(r for r in recs if "halo" in r)
losses = [r["train_loss"] for r in recs if "train_loss" in r]
assert all(np.isfinite(losses)), losses
print(json.dumps({"proc": jax.process_index(), "halo": resolved["halo"],
                  "ms": resolved["halo_measured_ms"]}), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_halo_measured_agreement():
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen([sys.executable, "-c", WORKER, coord, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out.decode())
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("multi-process bring-up timed out in this environment")
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    recs = [json.loads(l) for o in outs for l in o.strip().splitlines()
            if l.startswith("{")]
    assert len(recs) == 2
    # the load-bearing assertion: the same winner on BOTH processes
    assert recs[0]["halo"] == recs[1]["halo"]
    assert recs[0]["halo"] in ("exact", "ring", "pipelined")
    assert set(recs[0]["ms"]) == {"exact", "ring", "pipelined"}
