"""Worker process for the 2-process multi-host feed test.

Each process owns 2 virtual CPU devices (4 global), initialises the JAX
distributed runtime, samples a LOCAL half-batch, assembles the global
sharded batch with parallel/feed.global_batch_from_local, and runs ONE
sharded train step over the global (data=4) mesh.  Process 0 writes the
resulting loss to ``out_path`` for the parent to compare against a
single-process oracle.

Usage: python _multihost_worker.py <process_id> <num_processes> <coord>
       <out_path>
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    coordinator = sys.argv[3]
    out_path = sys.argv[4]

    import jax

    # 2 local CPU devices per process BEFORE backend init; the container's
    # sitecustomize ignores JAX_PLATFORMS so force via config.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == 2 * num_processes  # global
    assert len(jax.local_devices()) == 2

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodal_rssm_tpu.parallel import mesh as mesh_lib
    from multimodal_rssm_tpu.parallel.feed import global_batch_from_local
    from tests._multihost_case import (
        B_LOCAL, local_batch, make_case, oracle_state,
    )

    mesh = mesh_lib.create_mesh(n_data=2 * num_processes, n_model=1)
    model, cfg, train_step, spec, draws = make_case()

    # identical params in every process (same PRNG key, shapes only)
    state = oracle_state(model, cfg)
    rep = NamedSharding(mesh, P())
    state = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)),
        state,
    )

    # each host feeds its OWN local half-batch (deterministic per rank)
    batch_local = local_batch(process_id)
    gbatch = global_batch_from_local(mesh, batch_local, batch_dim=1)
    leaf = jax.tree_util.tree_leaves(gbatch)[0]
    assert leaf.shape[1] == B_LOCAL * num_processes, leaf.shape

    key = jax.random.PRNGKey(7)

    # Compile BEFORE the first collective executes, then rendezvous at the
    # coordination-service barrier: Gloo's context init gives the peer only
    # ~30s to show up, and compile skew between ranks (cold or
    # machine-mismatched persistent cache on a 1-core box) can exceed that.
    compiled = train_step.lower(state, gbatch, draws, key).compile()
    from jax._src import distributed  # coordination KV store, no collectives

    distributed.global_state.client.wait_at_barrier(
        "multihost_feed_after_compile", timeout_in_ms=600_000)

    new_state, metrics = compiled(state, gbatch, draws, key)
    loss = metrics["loss"]
    assert loss.sharding.is_fully_replicated
    loss = float(loss)
    grad_norm = float(metrics["grad_norm"])

    # multi-host checkpoint: EVERY process calls save (the allgather inside
    # is a collective); the post-step state is replicated-but-global (not
    # fully addressable from either process) and the gbatch actions leaf is
    # sharded over data=4 across both hosts — both must come back as their
    # full global values.  Process 0 writes the file.
    from multimodal_rssm_tpu.io import checkpoint as ckpt_lib

    ckpt_dir = os.path.join(os.path.dirname(out_path), "mh_ckpt")
    actions_global = gbatch[1]
    assert not actions_global.is_fully_addressable
    ckpt_path = ckpt_lib.save_checkpoint(
        ckpt_dir, 1, {"ts": new_state, "act": actions_global})
    assert os.path.exists(ckpt_path) if process_id == 0 else True
    # the barrier inside save_checkpoint guarantees visibility here too
    assert os.path.exists(ckpt_path)

    if process_id == 0:
        with open(out_path, "w") as f:
            json.dump({"loss": loss, "grad_norm": grad_norm,
                       "step": int(new_state.step),
                       "ckpt_path": ckpt_path}, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
