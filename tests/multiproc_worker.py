"""Worker process for tests/test_multiprocess.py.

One of N processes in a gloo-backed multi-process CPU run — the
test-without-a-cluster equivalent of a multi-host TPU slice (DCN):
``jax.distributed.initialize`` + per-process batch loading +
``jax.make_array_from_process_local_data`` assembly (SURVEY §5.8).

Usage: python multiproc_worker.py <coordinator> <num_processes> <process_id>
Prints one JSON line with per-epoch losses, eval metrics, and a param
digest; the parent test asserts cross-process identity and agreement with
single-process math.
"""

import json
import sys


def make_items(n=8, seed=0):
    """Deterministic in-memory 10-field dataset (same on every process)."""
    from ser_tpu.data.synthetic import synthetic_items

    return synthetic_items(n=n, seed=seed, min_len=4, max_len=9)


def run(process_index=0, process_count=1, mesh_devices=4, model="BiLSTM"):
    """Two train epochs + one eval on a dp mesh; returns the result dict.

    Called with process_count=1 by the parent test for the single-process
    reference numbers, and by each worker under jax.distributed for the
    multi-process run (same seeds -> same global math either way).
    """
    import jax
    import numpy as np

    from ser_tpu.data.loaders import EpochLoader
    from ser_tpu.parallel.mesh import make_mesh
    from ser_tpu.train.trainer import ModelTrainer

    items = make_items()
    mesh = make_mesh(mesh_devices)
    trainer = ModelTrainer(model=model, seed=123, res_csv_path=None,
                           mesh=mesh)

    def loader(shuffle):
        return EpochLoader(items, np.arange(len(items)), batch_size=4,
                           shuffle=shuffle, seed=9,
                           process_index=process_index,
                           process_count=process_count)

    train_loader = loader(True)
    losses = []
    for ep in (1, 2):
        _, loss = trainer.train_network(ep, train_loader)
        losses.append(loss)
    acc, f1, _ = trainer.eval_network(loader(False), dump_csv=False)
    digest = float(sum(np.abs(np.asarray(x)).sum()
                       for x in jax.tree_util.tree_leaves(trainer.params)))

    # multi-host TENSOR parallelism: one (dp=2, tp=2) train step with
    # weights sharded over 'tp' across process boundaries (shard_params'
    # make_array_from_callback path) — contiguous because n_tp (2) divides
    # the per-process device count
    from ser_tpu.parallel.tp import make_mesh_2d

    mesh2 = make_mesh_2d(2, mesh_devices // 2)
    tp_trainer = ModelTrainer(model=model, seed=123, res_csv_path=None,
                              mesh=mesh2)
    _, tp_loss = tp_trainer.train_network(1, loader(True))
    return {"losses": losses, "acc": acc, "f1": f1, "digest": digest,
            "tp_loss": tp_loss}


def main():
    coordinator, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    out = run(process_index=jax.process_index(), process_count=nproc,
              mesh_devices=len(jax.devices()))
    out["process_index"] = jax.process_index()
    out["n_devices"] = len(jax.devices())
    out["n_local_devices"] = len(jax.local_devices())
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
