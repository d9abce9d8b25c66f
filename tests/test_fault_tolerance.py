"""Fail-stop + resume through the PRODUCT path (SURVEY.md §5.3-5.4): a
CLI-launched training run with ``--checkpoint-every`` is hard-killed mid-run;
relaunching the identical command resumes from the last periodic checkpoint
at the right epoch and finishes."""

import json
import os
import signal
import subprocess
import sys

EPOCHS = 200  # large enough that the kill always lands mid-run


def _cli_cmd(ckpt):
    return [
        sys.executable, "-m", "tpu_sage.cli",
        "--synthetic", "sbm", "--synthetic-nodes", "300",
        "--synthetic-classes", "3", "--synthetic-feat-dim", "16",
        "--n-train-samples", "5,3", "--n-val-samples", "5,3",
        "--output-dims", "16,16", "--batch-size", "32",
        "--epochs", str(EPOCHS), "--no-eval",
        "--checkpoint-path", ckpt, "--checkpoint-every", "1",
    ]


def _env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # a host-device-count override would change
    # the worker's expected device topology
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    return env


def test_cli_crash_and_resume(tmp_path):
    ckpt = str(tmp_path / "ck.npz")

    # run 1: kill -9 as soon as two periodic checkpoints have been written
    p = subprocess.Popen(
        _cli_cmd(ckpt), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, env=_env(),
    )
    seen, ckpts = [], 0
    try:
        for line in p.stdout:
            line = line.strip()
            if not line.startswith("{"):
                continue
            rec = json.loads(line)
            seen.append(rec)
            if "checkpoint" in rec:
                ckpts += 1
            if ckpts >= 2:
                p.send_signal(signal.SIGKILL)  # simulated hard crash
                break
    finally:
        p.wait(timeout=120)
    assert p.returncode != 0  # really was killed, not finished
    assert os.path.exists(ckpt)
    killed_at_step = max(r["step"] for r in seen if "checkpoint" in r)
    epochs_run1 = [r["epoch"] for r in seen if "epoch" in r]
    assert epochs_run1[0] == 0 and len(epochs_run1) < EPOCHS

    # run 2: identical command resumes from the checkpoint and completes
    r2 = subprocess.run(
        _cli_cmd(ckpt), capture_output=True, text=True, timeout=300, env=_env(),
    )
    assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
    recs = [json.loads(l) for l in r2.stdout.splitlines() if l.startswith("{")]
    resumed = next(r for r in recs if "resumed_from" in r)
    assert resumed["step"] == killed_at_step
    assert resumed["start_epoch"] >= 1
    epoch_recs = [r for r in recs if "epoch" in r]
    # resumes at the epoch after the checkpoint, not from scratch
    assert epoch_recs[0]["epoch"] == resumed["start_epoch"]
    assert epoch_recs[-1]["epoch"] == EPOCHS - 1  # ran to completion
    # resumed loss continues the pre-crash trajectory (no restart spike)
    first_loss_run1 = next(r for r in seen if "epoch" in r)["train_loss"]
    assert epoch_recs[0]["train_loss"] < first_loss_run1 * 1.5
