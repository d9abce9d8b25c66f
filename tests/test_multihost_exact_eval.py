"""Round-4 productization of the multi-host exact path (VERDICT r3 #2): the
PRODUCT entry points — ``fit_partitioned(exact_val=True)``,
``PartitionedTrainer.evaluate_exact``, and ``python -m tpu_sage.export
--partitioned`` — run across a REAL process boundary (2 jax.distributed
processes × 2 CPU devices each) with no hand-assembled arrays: shard
placement goes through ``dist.partition.put_sharded`` and results come back
through ``fetch_replicated``. Previously only the test-local
``make_array_from_process_local_data`` pattern could do this
(tests/test_multihost_hier2d.py); ``evaluate_exact`` raised on
``process_count > 1`` outright."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.distributed.initialize(
    coordinator_address=sys.argv[1], num_processes=2, process_id=int(sys.argv[2])
)
import numpy as np
from tpu_sage.data.problem import NodeProblem
from tpu_sage.dist.train import fit_partitioned
from tpu_sage.train.trainer import TrainConfig

assert jax.process_count() == 2 and len(jax.devices()) == 4
problem = NodeProblem.from_h5(sys.argv[3])
store = problem.store
cfg = TrainConfig(batch_size=16, epochs=2, n_train_samples=(4, 3),
                  n_val_samples=(4, 3), output_dims=(16, 16), lr_init=0.01,
                  exact_val=True)
recs = []
trainer, state, hist = fit_partitioned(store, cfg, log=lambda d: recs.append(d))
# exact_val ran cross-process inside the fit loop (no fallback note logged)
assert not any("falling back" in str(r.get("note", "")) for r in recs), recs
assert all("val_metric" in h for h in hist), hist
vm = trainer.evaluate_exact(state, store, fold="val")
assert np.isfinite(vm)
from tpu_sage.train.checkpoint import save_checkpoint
save_checkpoint(sys.argv[4], state, config=cfg)  # process 0 writes, by contract
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("ckpt-written")

# cross-process RESUME: load_checkpoint re-places every leaf with the
# template's (replicated, cross-process) sharding; training continues
recs2 = []
_, state2, hist2 = fit_partitioned(store, cfg.replace(epochs=4),
                                   log=lambda d: recs2.append(d),
                                   resume_from=sys.argv[4])
resumed = next(r for r in recs2 if "resumed_from" in r)
assert resumed["start_epoch"] == 2, recs2
assert [h["epoch"] for h in hist2] == [2, 3], hist2
print(json.dumps({"proc": jax.process_index(), "exact_val": vm,
                  "val": [h["val_metric"] for h in hist],
                  "resumed_val": hist2[-1]["val_metric"]}), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    return env


def _run_pair(cmds, env, timeout=240):
    procs = [subprocess.Popen(c, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env) for c in cmds]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out.decode())
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("multi-process bring-up timed out in this environment")
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    return outs


def test_two_process_exact_eval_and_export(tmp_path):
    from tpu_sage.data.convert import save_problem_h5
    from tpu_sage.data.synthetic import sbm_store

    h5 = str(tmp_path / "p.h5")
    ckpt = str(tmp_path / "m.npz")
    out_npy = str(tmp_path / "emb.npy")
    store = sbm_store(n_nodes=120, n_classes=3, feat_dim=8, avg_degree=5,
                      seed=77)
    save_problem_h5(store, h5)
    env = _env()

    # leg 1: the product fit loop + evaluate_exact across the process boundary
    coord = f"127.0.0.1:{_free_port()}"
    outs = _run_pair(
        [[sys.executable, "-c", WORKER, coord, str(i), h5, ckpt]
         for i in range(2)], env)
    recs = [json.loads(l) for o in outs for l in o.strip().splitlines()
            if l.startswith("{")]
    assert len(recs) == 2
    # both processes computed the identical exact metric from replicated logits
    assert recs[0]["exact_val"] == recs[1]["exact_val"]
    assert recs[0]["val"] == recs[1]["val"]
    assert os.path.exists(ckpt)

    # leg 2: export.py --partitioned as two fresh processes over the same mesh
    coord = f"127.0.0.1:{_free_port()}"
    env2 = dict(env)
    env2["JAX_NUM_CPU_DEVICES"] = "2"
    env2["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    base = [sys.executable, "-m", "tpu_sage.export", "--problem-path", h5,
            "--checkpoint", ckpt, "--out", out_npy,
            "--n-train-samples", "4,3", "--n-val-samples", "4,3",
            "--output-dims", "16,16", "--partitioned", "--chunk", "16",
            "--coordinator", coord, "--num-processes", "2"]
    outs = _run_pair([base + ["--process-id", str(i)] for i in range(2)], env2)
    recs = [json.loads(l) for o in outs for l in o.strip().splitlines()
            if l.startswith("{")]
    assert {r["process"] for r in recs} == {0, 1}
    assert all(r["shape"] == [120, 16 * 2] for r in recs), recs  # concat dims
    # process 0 wrote the table; every process fetched the same replicated rows
    emb = np.load(out_npy)
    assert emb.shape == (120, 32) and np.isfinite(emb).all()
