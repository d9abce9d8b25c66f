"""Multi-process partitioned UNSUPERVISED training: 2 jax.distributed
processes, 1 CPU device each — halo-walked positives and the NCE psum cross
the process boundary (round-2 counterpart of test_multihost_partitioned)."""

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
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_sage.data.synthetic import sbm_store
from tpu_sage.dist.partition import partition_arrays, shard_fold
from tpu_sage.dist.unsupervised import PartitionedUnsupervisedTrainer
from tpu_sage.graph.graph_data import DeviceGraph
from tpu_sage.train.trainer import TrainConfig, build_model
from tpu_sage.train.unsupervised import UnsupConfig

assert jax.process_count() == 2
devs = np.array(jax.devices())
mesh = Mesh(devs.reshape(2), ("data",))
n_shards = 2

store = sbm_store(n_nodes=128, n_classes=3, feat_dim=8, avg_degree=5, seed=55)
arrays, m = partition_arrays(store, n_shards, train=True)
fold_ids, fold_w = shard_fold(store.folds["train"], n_shards, m)

sh = NamedSharding(mesh, P("data"))
me = jax.process_index()

def put(host_array, dtype=None):
    arr = np.asarray(host_array)
    if dtype is not None:
        arr = arr.astype(dtype)
    local = arr[me * (arr.shape[0] // 2) : (me + 1) * (arr.shape[0] // 2)]
    return jax.make_array_from_process_local_data(sh, local, arr.shape)

graph = DeviceGraph(
    adj=put(arrays["adj"], np.int32),
    degrees=put(arrays["degrees"], np.int32),
    feats=put(arrays["feats"], np.float32),
    targets=put(arrays["targets"], np.int32),
    # replicated dequant scales (ones: feats stored dense) — the partitioned
    # step's shard_map signature always carries feat_scale
    feat_scale=jax.device_put(jnp.ones((arrays["feats"].shape[1],), jnp.float32),
                              NamedSharding(mesh, P())),
)
fold_ids_d = put(fold_ids, np.int32)
fold_w_d = put(fold_w, np.float32)

cfg = TrainConfig(batch_size=16, epochs=1, n_train_samples=(4, 3),
                  n_val_samples=(4, 3), output_dims=(16, 16), lr_init=0.01)
model = build_model(cfg, store.n_nodes, max(store.n_classes, 2))
trainer = PartitionedUnsupervisedTrainer(
    model, cfg, UnsupConfig(walk_length=2, n_negatives=4), mesh, m,
    steps_per_epoch=5, n_real_nodes=store.n_nodes,
)
state = trainer.init_state(feat_dim=store.feat_dim)

losses = []
for _ in range(10):
    state, metrics = trainer.train_step(state, graph, fold_ids_d, fold_w_d)
    losses.append(float(metrics["loss"]))

from tpu_sage.dist.debug import assert_replicas_equal
assert_replicas_equal(state.params, "params")
assert all(np.isfinite(losses)), losses
assert losses[-1] < losses[0], losses
print(json.dumps({"proc": jax.process_index(), "loss0": losses[0],
                  "lossN": losses[-1]}), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_partitioned_unsupervised(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # a host-device-count override would change
    # the worker's expected device topology
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen([sys.executable, "-c", WORKER, coord, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
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
        pytest.skip("multi-process bring-up timed out in this environment")
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    recs = [json.loads(l) for o in outs for l in o.strip().splitlines()
            if l.startswith("{")]
    assert len(recs) == 2
    # both processes observed the identical (psum'd, replicated) NCE loss
    assert recs[0]["loss0"] == recs[1]["loss0"]
    assert recs[0]["lossN"] == recs[1]["lossN"]
