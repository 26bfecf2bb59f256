"""Worker for the two-process jax.distributed test (test_multiprocess.py).

Each process owns 4 virtual CPU devices; jax.distributed.initialize links
them into one 8-device runtime — the CPU-backend analog of one host per TPU
slice. Exercises the multi-host surface that single-process tests cannot:

- ``initialize_distributed`` (parallel/mesh.py) with a real coordinator
- a global mesh spanning both processes' devices
- an explicit shard_map psum across the process boundary
- ``jax.make_array_from_process_local_data`` + the process-indexed batcher
  rule (data/process_sharding.py) feeding a GSPMD global computation

Writes a JSON result file the parent asserts on. Invoked as:
    python tests/_mp_worker.py <process_id> <num_processes> <port> <out.json>
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> None:
    process_id, num_processes, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
    )

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mer_tpu.data.process_sharding import resolve_process, shard_batches
    from mer_tpu.parallel.mesh import initialize_distributed, make_mesh

    initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    assert jax.process_index() == process_id

    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    mesh = make_mesh(dp=n_global)

    # 1. explicit cross-process psum: every device contributes its global
    # index; the reduction must see devices of BOTH processes
    def psum_ids(x):
        return jax.lax.psum(x, "dp")

    ids = jnp.arange(n_global, dtype=jnp.float32)
    got = jax.jit(
        jax.shard_map(psum_ids, mesh=mesh, in_specs=P("dp"), out_specs=P("dp"))
    )(ids)
    # the output spans non-addressable devices; every shard holds the psum
    psum_value = float(np.asarray(got.addressable_shards[0].data)[0])

    # 2. process-indexed global batch: the SAME seeded global batch list on
    # every process (process_sharding contract), each host materializes only
    # its round-robin slice, make_array_from_process_local_data assembles the
    # global dp-sharded array, and a jitted global mean runs under GSPMD.
    rng = np.random.default_rng(7)
    global_rows = rng.normal(size=(n_global * 3, 16)).astype(np.float32)
    index, count = resolve_process(None, None)
    # contiguous per-process slices match the mesh's device order
    per_device = np.split(global_rows, n_global, axis=0)
    local_rows = np.concatenate(per_device[index * n_local : (index + 1) * n_local])
    sharding = NamedSharding(mesh, P("dp"))
    global_arr = jax.make_array_from_process_local_data(sharding, local_rows)
    loss = jax.jit(lambda x: jnp.mean(x * x), out_shardings=NamedSharding(mesh, P()))(global_arr)
    global_loss = float(loss)
    expected_loss = float(np.mean(global_rows * global_rows))

    # 2b. the round-robin batcher rule (data/process_sharding.py) under a
    # REAL multi-process runtime: each process sums only its own slice of
    # the identical global batch list; process_allgather recombines — the
    # union must equal the single-process total exactly (disjoint+exhaustive)
    from jax.experimental import multihost_utils

    global_batches = [rng.normal(size=(4,)).astype(np.float32) for _ in range(7)]
    local_sum = np.float32(sum(float(b.sum()) for b in shard_batches(global_batches, index, count)))
    all_sums = np.asarray(multihost_utils.process_allgather(jnp.float32(local_sum)))
    batcher_union_sum = float(all_sums.sum())
    batcher_expected_sum = float(np.sum([b.sum() for b in global_batches], dtype=np.float64))

    # 3. one dp-sharded gradient step with replicated params: grads must be
    # identical on every process (GSPMD all-reduce across the boundary)
    w = jnp.ones((16,), jnp.float32)

    def loss_fn(w, x):
        return jnp.mean((x @ w) ** 2)

    grad = jax.jit(jax.grad(loss_fn), in_shardings=(NamedSharding(mesh, P()), sharding))(
        w, global_arr
    )
    grad_checksum = float(jnp.sum(grad * jnp.arange(16)))

    # 4. distributed checkpoint: each process writes ONLY its addressable
    # shards of the global dp-sharded array (no collectives, no host gather
    # of non-addressable data); the parent merges both files and compares
    # against the full global table.
    from mer_tpu.train import save_checkpoint_sharded

    ckpt_dir = os.path.join(os.path.dirname(out_path), "sharded_ckpt")
    os.makedirs(ckpt_dir, exist_ok=True)
    save_checkpoint_sharded(
        ckpt_dir, epoch=5,
        params={"table": global_arr, "w": jax.device_put(w, NamedSharding(mesh, P()))},
        extra={"note": "mp"},
    )
    # barrier so the parent only checks after BOTH files exist
    multihost_utils.sync_global_devices("ckpt_written")

    with open(out_path, "w") as f:
        json.dump(
            {
                "process_id": process_id,
                "process_count": jax.process_count(),
                "n_global_devices": n_global,
                "n_local_devices": n_local,
                "psum_value": psum_value,
                "global_loss": global_loss,
                "expected_loss": expected_loss,
                "batcher_union_sum": batcher_union_sum,
                "batcher_expected_sum": batcher_expected_sum,
                "grad_checksum": grad_checksum,
            },
            f,
        )


if __name__ == "__main__":
    main()
