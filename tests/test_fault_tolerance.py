"""Fail-stop + resume (SURVEY.md §5.3): a training process crashes mid-run;
the restarted process resumes from the latest checkpoint and finishes."""

import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys
import numpy as np
from tpu_sage.data.synthetic import sbm_problem
from tpu_sage.train.trainer import TrainConfig, build_model, Trainer
from tpu_sage.train.checkpoint import save_checkpoint, load_checkpoint
import jax.numpy as jnp

ckpt = sys.argv[1]
crash_after = int(sys.argv[2])   # crash after this many epochs (-1 = never)
total_epochs = int(sys.argv[3])

problem = sbm_problem(n_nodes=300, n_classes=3, feat_dim=16, seed=77)
cfg = TrainConfig(batch_size=32, epochs=total_epochs, n_train_samples=(5, 3),
                  n_val_samples=(5, 3), output_dims=(16, 16))
model = build_model(cfg, problem.n_nodes, problem.n_classes)
trainer = Trainer(model, cfg, steps_per_epoch=7, task=problem.task)
graph = problem.device_graph(train=True)
state = trainer.init_state(graph)
if os.path.exists(ckpt):
    state = load_checkpoint(ckpt, state)
    print(json.dumps({"resumed_step": int(state.step)}), flush=True)

train_ids = problem.folds["train"]
fold_ids = jnp.asarray(train_ids, jnp.int32)
fold_tgt = jnp.asarray(problem.store.targets[train_ids])
spe = len(train_ids) // cfg.batch_size
start_epoch = int(state.step) // spe
for epoch in range(start_epoch, total_epochs):
    state, m = trainer.train_epoch(state, graph, fold_ids, fold_tgt)
    save_checkpoint(ckpt, state)
    print(json.dumps({"epoch": epoch, "loss": float(m["loss"]),
                      "step": int(state.step)}), flush=True)
    if crash_after >= 0 and epoch + 1 >= crash_after:
        os._exit(1)  # simulated hard crash: no cleanup, mid-run
print(json.dumps({"done": True, "final_step": int(state.step)}), flush=True)
"""


def _run(ckpt, crash_after, total, env):
    return subprocess.run(
        [sys.executable, "-c", WORKER, ckpt, str(crash_after), str(total)],
        capture_output=True, text=True, timeout=180, env=env,
    )


def test_crash_and_resume(tmp_path):
    ckpt = str(tmp_path / "ck.npz")
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )

    r1 = _run(ckpt, crash_after=2, total=5, env=env)
    assert r1.returncode == 1, r1.stdout + r1.stderr  # crashed as scripted
    lines1 = [json.loads(l) for l in r1.stdout.strip().splitlines()]
    assert lines1[-1]["epoch"] == 1  # died after epoch 1 (2 epochs ran)
    assert os.path.exists(ckpt)

    r2 = _run(ckpt, crash_after=-1, total=5, env=env)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    lines2 = [json.loads(l) for l in r2.stdout.strip().splitlines()]
    assert lines2[0]["resumed_step"] == lines1[-1]["step"]
    # resumed run continues from epoch 2, not from scratch
    first_epoch_rec = next(l for l in lines2 if "epoch" in l)
    assert first_epoch_rec["epoch"] == 2
    # loss continues improving from the pre-crash trajectory
    assert first_epoch_rec["loss"] < lines1[0]["loss"]
    assert lines2[-1]["done"] is True
