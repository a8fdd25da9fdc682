"""Subprocess worker for the multi-host parity test.

Usage: python multihost_worker.py DATASET_DIR EXP_DIR NPROC PID PORT [batch_shared]

Runs the CLI training entry point on a 2x2 (data x model) mesh built from
4 virtual CPU devices.  With NPROC=2 each process contributes 2 devices and
connects via jax.distributed (exercising the OKET_* env wiring of
cli/train.py); with NPROC=1 a single process owns all 4.  Both must produce
identical training results (tests/test_multihost.py asserts it).

All ranks share ONE experiment dir (EXP_DIR): rank 0 owns results.csv and
checkpoints, every rank writes its own log file, and evaluation is
host-sharded (each rank evaluates a disjoint slice; metric sums reduced).
"""

import os
import sys

dataset_dir, exp_dir, nproc, pid, port = sys.argv[1:6]
batch_shared = len(sys.argv) > 6 and sys.argv[6] == "batch_shared"
nproc, pid = int(nproc), int(pid)

local_devices = 4 // nproc
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={local_devices}"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

if nproc > 1:
    os.environ["OKET_COORDINATOR"] = f"localhost:{port}"
    os.environ["OKET_NUM_PROCESSES"] = str(nproc)
    os.environ["OKET_PROCESS_ID"] = str(pid)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from open_knowledge_graph_embeddings_tpu.cli.train import main  # noqa: E402
from open_knowledge_graph_embeddings_tpu.config.options import load_config  # noqa: E402

if batch_shared:
    train_cfg = {"input_file": "train.txt", "batch_size": 4,
                 "use_batch_shared_entities": True, "min_size_batch_labels": 6}
else:
    train_cfg = {"input_file": "train.txt", "batch_size": 4,
                 "use_batch_shared_entities": False}

args = load_config()
args.update(
    dataset_dir=dataset_dir,
    experiment_dir=exp_dir,
    seed=7,
    epochs=3,
    batch_size=4,
    eval_epoch_freq=2,
    eval_freq=-1,
    save_epoch_freq=-1,
    print_freq=1,
    use_mesh=True,
    model_parallel=2,
    # keep the protocol eval batch (1) so host-sharded eval distributes
    # multiple batches per rank — the property this test pins; the
    # eval_block_rows default would fold them into one device batch
    eval_block_rows=0,
    model="LookupComplexRelationModel",
    model_config={"entity_slot_size": 8, "init_std": 0.1},
    optimization_config={"optimizer": "Adagrad", "epoch": 0, "lr": 0.3,
                         "weight_decay": 1e-10},
    train_data_config=train_cfg,
    # eval batch_size 1 so host-sharded eval distributes >1 batch per rank
    val_data_config={"input_file": "valid.txt", "batch_size": 1,
                     "use_batch_shared_entities": False},
    test_data_config={"input_file": "test.txt", "batch_size": 1,
                      "use_batch_shared_entities": False},
)
trainer = main(args)
assert trainer.mesh is not None and dict(trainer.mesh.shape) == {"data": 2, "model": 2}, (
    trainer.mesh
)
if nproc > 1:
    assert trainer.process_count == nproc
    # the 2x2 mesh keeps model groups process-local -> host-sharded eval on
    assert trainer._local_eval_mesh is not None
    assert dict(trainer._local_eval_mesh.shape) == {"data": 1, "model": 2}
    assert trainer.val_builder.host_shard == (pid, nproc)
# per-shard checkpoint round-trip (multi-process only): the end-of-run save
# wrote one slab per rank to the shared dir (no replicate-to-all gather);
# reload must restore every local shard bit-equal
if nproc > 1:
    import glob as _glob

    import numpy as _np

    # newest rotating checkpoint = the end-of-run save (rotation means the
    # lowest-numbered name may hold an older mid-run save)
    ck = max(
        _glob.glob(os.path.join(exp_dir, "checkpoint*")), key=os.path.getmtime
    )
    for r in range(nproc):
        assert os.path.exists(os.path.join(ck, f"arrays.p{r}.npz")), (ck, r)
    assert os.path.exists(os.path.join(ck, "meta.json"))
    assert not os.path.exists(os.path.join(ck, "arrays.npz"))

    def shard_snap(params):
        out = {}
        for k, v in params.items():
            norm = lambda idx: tuple(
                sl.indices(dim)[:2] for sl, dim in zip(idx, v.shape)
            )
            out[k] = sorted(
                ((norm(s.index), _np.asarray(s.data)) for s in v.addressable_shards),
                key=lambda t: t[0],
            )
        return out

    before = shard_snap(trainer.variables["params"])
    trainer.load(ck)
    after = shard_snap(trainer.variables["params"])
    for k in before:
        for (i1, d1), (i2, d2) in zip(before[k], after[k]):
            assert i1 == i2 and _np.array_equal(d1, d2), (k, i1)
    print("CKPT_ROUNDTRIP_OK")

print(f"WORKER_OK pid={pid} steps={trainer.training_steps} "
      f"eval_batches_per_pass={len(trainer.val_builder)}")
