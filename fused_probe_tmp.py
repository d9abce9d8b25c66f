import time, os, json
import jax, jax.numpy as jnp
from tpu_sage.data.synthetic import bench_store
from tpu_sage.data.problem import NodeProblem
from tpu_sage.train.trainer import TrainConfig, Trainer, build_model

nsteps = int(os.environ.get("NSTEPS", 10))
batch = int(os.environ.get("BATCH", 2048))
store = bench_store()
problem = NodeProblem(store)

def run(fuse):
    cfg = TrainConfig(aggregator_class="mean", batch_size=batch,
                      n_train_samples=(25,10), n_val_samples=(25,10),
                      output_dims=(128,128), epochs=1,
                      compute_dtype="bfloat16", fuse_first_layer=fuse)
    spe = len(problem.folds["train"]) // batch
    model = build_model(cfg, problem.n_nodes, problem.n_classes)
    tr = Trainer(model, cfg, spe, task=problem.task)
    graph = problem.device_graph(train=True, dtype=jnp.bfloat16)
    state = tr.init_state(graph)
    n = nsteps * batch
    ids = jnp.asarray(problem.folds["train"][:n], jnp.int32)
    tgt = jnp.asarray(store.targets[problem.folds["train"][:n]])
    t0=time.time(); state, m = tr.train_epoch(state, graph, ids, tgt); float(m["loss"])
    print(json.dumps({"fuse": fuse, "batch": batch, "compile_s": round(time.time()-t0,1)}), flush=True)
    best = []
    for _ in range(3):
        t0=time.time()
        state, m = tr.train_epoch(state, graph, ids, tgt)
        float(m["loss"])
        best.append(1000*(time.time()-t0)/nsteps)
    print(json.dumps({"fuse": fuse, "batch": batch,
                      "ms_per_step": [round(x,2) for x in best]}), flush=True)

run(False)
run(True)
