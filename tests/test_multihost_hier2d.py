"""Two jax.distributed processes × 2 local CPU devices each = a (2, 2)
``(host, chip)`` mesh whose HOST axis is a real process boundary — exactly
the topology the hierarchical halo (``halo='hier2d'``) is for: the within-
host reduction stays inside each process (ICI analog), only the pre-reduced
partials cross processes (DCN analog). Proves the 2-D routing works beyond
single-process meshes, plus sharded exact full-graph inference over it."""

import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)   # 2 local devices per process
jax.distributed.initialize(
    coordinator_address=sys.argv[1], num_processes=2, process_id=int(sys.argv[2])
)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_sage.data.synthetic import sbm_store
from tpu_sage.dist.partition import partition_arrays, shard_fold
from tpu_sage.dist.train import PartitionedTrainer
from tpu_sage.graph.graph_data import DeviceGraph
from tpu_sage.train.trainer import TrainConfig, build_model

assert jax.process_count() == 2
devs = np.array(jax.devices())            # 4 global devices, 2 per process
mesh = Mesh(devs.reshape(2, 2), ("host", "chip"))  # host axis == process axis
axis = ("host", "chip")
n_shards = 4

store = sbm_store(n_nodes=128, n_classes=3, feat_dim=8, avg_degree=5, seed=56)
arrays, m = partition_arrays(store, n_shards, train=True)
fold_ids, fold_w = shard_fold(store.folds["train"], n_shards, m)

sh = NamedSharding(mesh, P(axis))
me = jax.process_index()

def put(host_array, dtype=None):
    # each process contributes ITS two shards (global shard s = host*2+chip)
    arr = np.asarray(host_array)
    if dtype is not None:
        arr = arr.astype(dtype)
    half = arr.shape[0] // 2
    local = arr[me * half : (me + 1) * half]
    return jax.make_array_from_process_local_data(sh, local, arr.shape)

graph = DeviceGraph(
    adj=put(arrays["adj"], np.int32),
    degrees=put(arrays["degrees"], np.int32),
    feats=put(arrays["feats"], np.float32),
    targets=put(arrays["targets"], np.int32),
    feat_scale=jax.device_put(jnp.ones((arrays["feats"].shape[1],), jnp.float32),
                              NamedSharding(mesh, P())),
)
fold_ids_d = put(fold_ids, np.int32)
fold_w_d = put(fold_w, np.float32)

cfg = TrainConfig(batch_size=16, epochs=1, n_train_samples=(4, 3),
                  n_val_samples=(4, 3), output_dims=(16, 16), lr_init=0.01,
                  halo="hier2d")
model = build_model(cfg, store.n_nodes, store.n_classes)
trainer = PartitionedTrainer(model, cfg, mesh, m, steps_per_epoch=5,
                             task=store.task, axis=axis)
assert trainer.halo_mode == "hier2d" and trainer.n_shards == 4
state = trainer.init_state(feat_dim=store.feat_dim)

losses = []
for _ in range(12):
    state, metrics = trainer.train_step(state, graph, fold_ids_d, fold_w_d)
    losses.append(float(metrics["loss"]))

from tpu_sage.dist.debug import assert_replicas_equal
assert_replicas_equal(state.params, "params")
assert all(np.isfinite(losses)), losses
assert losses[-1] < losses[0], losses

# sharded exact full-graph inference over the cross-process 2-D mesh (the
# eval graph is built manually — device_put of host arrays cannot target
# non-addressable devices, same constraint as init_state)
from tpu_sage.nn.full_graph import embed_all_nodes_partitioned
arrays_f, _ = partition_arrays(store, n_shards, train=False)
graph_f = DeviceGraph(
    adj=put(arrays_f["adj"], np.int32),
    degrees=put(arrays_f["degrees"], np.int32),
    feats=put(arrays_f["feats"], np.float32),
    targets=put(arrays_f["targets"], np.int32),
    feat_scale=graph.feat_scale,
)
logits = embed_all_nodes_partitioned(model, state.params, graph_f, mesh,
                                     axis=axis, chunk=8, with_head=True)
logit_sum = float(jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)),
                          out_shardings=NamedSharding(mesh, P()))(logits))
assert np.isfinite(logit_sum), logit_sum
print(json.dumps({"proc": jax.process_index(), "loss0": losses[0],
                  "lossN": losses[-1], "logit_sum": logit_sum}), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_hier2d_training(tmp_path):
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
    # both processes observed identical replicated losses and exact logits
    assert recs[0]["loss0"] == recs[1]["loss0"]
    assert recs[0]["lossN"] == recs[1]["lossN"]
    assert recs[0]["logit_sum"] == recs[1]["logit_sum"]
