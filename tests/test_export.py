"""Serving-export surface: train → checkpoint → ``python -m tpu_sage.export``.

Covers the product path the serving stack consumes (SURVEY.md §2.1 example
runner analog): a checkpoint written by the CLI must load in the exporter and
produce full-graph embeddings/logits of the right shape with no sampling
variance (tpu_sage.nn.full_graph).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained_checkpoint(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("export")
    ckpt = tmp / "model.npz"
    env_script = f"""
import sys
sys.argv = ["cli", "--synthetic", "sbm", "--synthetic-nodes", "300",
            "--n-train-samples", "4,3",
            "--n-val-samples", "4,3", "--output-dims", "16,16",
            "--batch-size", "32", "--epochs", "2",
            "--checkpoint-path", {str(ckpt)!r}]
from tpu_sage.cli import main
raise SystemExit(main())
"""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PALLAS_AXON_POOL_IPS"] = ""  # subprocess must not reach for the TPU
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", env_script], env=env,
                       capture_output=True, text=True, timeout=300,
                       cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    assert ckpt.exists()
    return tmp, ckpt


def _run_export(ckpt, out, extra):
    from tpu_sage.export import main

    argv = ["--synthetic", "sbm", "--synthetic-nodes", "300",
            "--checkpoint", str(ckpt), "--out", str(out),
            "--n-train-samples", "4,3", "--n-val-samples", "4,3",
            "--output-dims", "16,16", "--chunk", "64"] + extra
    assert main(argv) == 0


def test_export_embeddings_and_logits(trained_checkpoint, capsys):
    tmp, ckpt = trained_checkpoint
    emb_path = tmp / "emb.npy"
    _run_export(ckpt, emb_path, [])
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    emb = np.load(emb_path)
    # 2-layer concat model: embedding width = 2 * output_dim
    assert emb.shape == (300, 32) and np.isfinite(emb).all()
    assert meta["kind"] == "embeddings" and meta["from_step"] > 0
    # L2-normalized rows (model normalize=True default)
    norms = np.linalg.norm(emb, axis=1)
    np.testing.assert_allclose(norms[norms > 0], 1.0, rtol=1e-3)

    logit_path = tmp / "logits.npy"
    _run_export(ckpt, logit_path, ["--logits"])
    logits = np.load(logit_path)
    assert logits.shape == (300, 7) and np.isfinite(logits).all()
    # the trained head should classify the easy SBM fold well
    from tpu_sage.data.synthetic import sbm_problem

    problem = sbm_problem(n_nodes=300, seed=123)
    val = problem.folds["val"]
    acc = (logits[val].argmax(-1) == problem.store.targets[val]).mean()
    assert acc > 0.6, acc


def test_export_out_dtype_f16(trained_checkpoint, capsys):
    """--out-dtype float16 halves the device->host fetch and the artifact
    (the measured end-to-end bottleneck at Reddit scale — RESULTS r5 §8);
    values must match the f32 export to f16 resolution on both the
    single-device and partitioned paths."""
    tmp, ckpt = trained_checkpoint
    f32_path, f16_path = tmp / "emb32.npy", tmp / "emb16.npy"
    _run_export(ckpt, f32_path, [])
    _run_export(ckpt, f16_path, ["--out-dtype", "float16"])
    a, b = np.load(f32_path), np.load(f16_path)
    assert b.dtype == np.float16 and b.shape == a.shape
    np.testing.assert_allclose(b.astype(np.float32), a, rtol=2e-3, atol=2e-3)

    p16 = tmp / "emb16_part.npy"
    _run_export(ckpt, p16, ["--partitioned", "--chunk", "16",
                            "--out-dtype", "float16"])
    capsys.readouterr()
    c = np.load(p16)
    assert c.dtype == np.float16
    np.testing.assert_allclose(c.astype(np.float32), a, rtol=2e-3, atol=2e-3)


def test_export_partitioned_matches_single_device(trained_checkpoint, capsys):
    """--partitioned export (sharded exact inference over all 8 devices)
    writes the same embeddings as the single-device exporter (VERDICT r2 #7:
    a graph that needs partitioned training must be exportable)."""
    tmp, ckpt = trained_checkpoint
    single = tmp / "emb_single.npy"
    parted = tmp / "emb_parted.npy"
    _run_export(ckpt, single, [])
    _run_export(ckpt, parted, ["--partitioned", "--chunk", "16"])
    capsys.readouterr()
    a, b = np.load(single), np.load(parted)
    assert a.shape == b.shape
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)
