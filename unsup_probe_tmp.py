import time, json
import jax, jax.numpy as jnp
from tpu_sage.data.synthetic import bench_store
from tpu_sage.dist.mesh import make_mesh
from tpu_sage.dist.unsupervised import PartitionedUnsupervisedTrainer
from tpu_sage.train.trainer import TrainConfig
from tpu_sage.train.unsupervised import UnsupConfig

store = bench_store()
cfg = TrainConfig(aggregator_class="mean", batch_size=512, n_train_samples=(25,10),
                  n_val_samples=(25,10), output_dims=(128,128), epochs=1,
                  compute_dtype="bfloat16")
unsup = UnsupConfig(walk_length=3, n_negatives=10)
mesh = make_mesh()
tr, graph, fold_ids, fold_w = PartitionedUnsupervisedTrainer.from_store(store, cfg, unsup, mesh)
state = tr.init_state(feat_dim=store.feat_dim)
nsteps = 6
t0=time.time(); state, m = tr.train_epoch(state, graph, fold_ids, fold_w, n_steps=nsteps); float(m["loss"])
print(json.dumps({"compile_s": round(time.time()-t0,1)}), flush=True)
for _ in range(3):
    t0=time.time()
    state, m = tr.train_epoch(state, graph, fold_ids, fold_w, n_steps=nsteps)
    float(m["loss"])
    dt = time.time()-t0
    ms = 1000*dt/nsteps
    roots = 512*(2+10)
    print(json.dumps({"ms_per_step": round(ms,2), "loss": round(float(m["loss"]),3),
                      "sampled_edges_per_sec": round(roots*275/(dt/nsteps),1)}), flush=True)
