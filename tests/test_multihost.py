"""Multi-process bring-up test (SURVEY.md §4.2 #4): two local processes under
``jax.distributed.initialize`` run a psum over the global mesh, and the
replica-divergence check passes across processes."""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
import jax
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

assert jax.process_count() == 2
devs = np.array(jax.devices())  # 1 cpu device per process -> 2 global
mesh = Mesh(devs.reshape(2), ("data",))
x = jnp.ones((2, 4)) * (jax.process_index() + 1)
from jax import lax
total = shard_map(
    lambda a: lax.psum(a, "data"),
    mesh=mesh, in_specs=P("data"), out_specs=P(),
    check_vma=False,
)(jax.device_put(jnp.ones((2, 4)), jax.sharding.NamedSharding(mesh, P("data"))))
np.testing.assert_array_equal(np.asarray(total), np.full((1, 4), 2.0))

from tpu_sage.dist.debug import assert_replicas_equal
assert_replicas_equal({"w": jnp.ones((3,))}, "params")
print(f"proc {jax.process_index()} OK", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_psum_and_divergence_check(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    # env must be set before the worker's interpreter starts (the axon
    # sitecustomize registers the TPU plugin at startup otherwise)
    env.pop("XLA_FLAGS", None)  # a host-device-count override would change
    # the worker's expected device topology
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, coord, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=150)
            outs.append(out.decode())
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("jax.distributed bring-up timed out in this environment")
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    assert any("proc 0 OK" in o for o in outs)
    assert any("proc 1 OK" in o for o in outs)
