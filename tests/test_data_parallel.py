"""Data-parallel (GSPMD) and tensor-parallel sharding tests on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_sage.data.synthetic import sbm_problem
from tpu_sage.dist.data_parallel import DataParallelTrainer, param_shardings
from tpu_sage.dist.mesh import make_mesh
from tpu_sage.train.trainer import TrainConfig, Trainer, build_model


def _setup(mesh, model_axis=None):
    problem = sbm_problem(n_nodes=512, n_classes=4, feat_dim=16, seed=31)
    cfg = TrainConfig(batch_size=64, epochs=1, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(32, 32))
    model = build_model(cfg, problem.n_nodes, problem.n_classes)
    trainer = DataParallelTrainer(
        model, cfg, steps_per_epoch=6, task=problem.task,
        mesh=mesh, model_axis=model_axis,
    )
    graph = problem.device_graph(train=True)
    state = trainer.init_state(graph)
    ids = jnp.asarray(problem.folds["train"][:64], jnp.int32)
    tgt = jnp.asarray(problem.store.targets[problem.folds["train"][:64]])
    return problem, trainer, state, graph, ids, tgt


def test_dp_step_runs_and_matches_replicated(eight_devices):
    mesh = make_mesh()
    problem, trainer, state, graph, ids, tgt = _setup(mesh)

    # replicated single-device result with the identical state/key
    ref_trainer = Trainer(trainer.model, trainer.config, 6, task=problem.task)
    ref_state, ref_m = ref_trainer.train_step(
        jax.tree_util.tree_map(jnp.copy, state), graph, ids, tgt
    )

    state_s, graph_s, ids_s, tgt_s = trainer.shard_inputs(state, graph, ids, tgt)
    new_state, m = trainer.train_step(state_s, graph_s, ids_s, tgt_s)
    # same math: identical loss and params up to fp tolerance
    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
    # batch really is sharded over the 8 devices
    assert len(ids_s.sharding.device_set) == 8


def test_tensor_parallel_sharding_specs(eight_devices):
    mesh = make_mesh(axis_names=("data", "model"), shape=(4, 2))
    problem, trainer, state, graph, ids, tgt = _setup(mesh, model_axis="model")
    specs = param_shardings(state.params, mesh, "model")
    kernels = [
        (path, s) for path, s in jax.tree_util.tree_flatten_with_path(specs)[0]
        if "kernel" in str(path[-1])
    ]
    assert kernels, "no kernels found"
    for _, s in kernels:
        assert s.spec == P(None, "model")


def test_tensor_parallel_step_matches_replicated(eight_devices):
    """TP step == replicated step (the DP test's contract, model_axis=2)."""
    mesh = make_mesh(axis_names=("data", "model"), shape=(4, 2))
    problem, trainer, state, graph, ids, tgt = _setup(mesh, model_axis="model")

    ref_trainer = Trainer(trainer.model, trainer.config, 6, task=problem.task)
    ref_state, ref_m = ref_trainer.train_step(
        jax.tree_util.tree_map(jnp.copy, state), graph, ids, tgt
    )

    state_s, graph_s, ids_s, tgt_s = trainer.shard_inputs(state, graph, ids, tgt)
    # optimizer moments really are TP-sharded, not replicated copies
    mu_kernels = [
        leaf for path, leaf in jax.tree_util.tree_flatten_with_path(
            state_s.opt_state)[0]
        if "kernel" in str(path[-1]) and hasattr(leaf, "sharding")
    ]
    assert mu_kernels, "no kernel moments found in opt state"
    assert any(
        l.sharding.spec == P(None, "model") for l in mu_kernels
    ), "adam moments are not TP-sharded"

    new_state, m = trainer.train_step(state_s, graph_s, ids_s, tgt_s)
    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
