"""One process of a 2-process ``jax.distributed`` CPU run for
tests/test_multihost.py.

Drives the PRODUCTION TemporalHarness through the multi-host branches that
single-process tests can never reach:

  * ``shard_sessions_for_process``      (train/temporal.py::_batches)
  * ``jax.make_array_from_process_local_data`` (parallel/sharded.py::put_batch)

Usage: python _multihost_worker.py <port> <process_id> <num_processes> <out.json>
"""
import json
import os
import sys
from pathlib import Path


def main():
    port, pid, nproc, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    # the environment's sitecustomize registers a tunneled TPU platform and
    # overrides JAX_PLATFORMS; an explicit config update after import wins
    jax.config.update("jax_platforms", "cpu")

    here = Path(__file__).resolve().parent
    sys.path.insert(0, str(here.parent))
    sys.path.insert(0, str(here))

    from chameleon_recsys_tpu.parallel.distributed import (
        initialize_multihost,
        make_pod_mesh,
    )

    initialize_multihost(
        f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()

    import numpy as np

    from conftest import tiny_article_schema, tiny_nar_config, tiny_session_schema
    from chameleon_recsys_tpu.config import RunConfig
    from chameleon_recsys_tpu.data.synthetic import (
        make_synthetic_corpus,
        synthetic_hour_sessions,
    )
    from chameleon_recsys_tpu.train.temporal import TemporalHarness

    cfg = tiny_nar_config(batch_size=8, max_session_length=6)
    art = tiny_article_schema(256)
    sess = tiny_session_schema(256)
    corpus = make_synthetic_corpus(art, ace_dim=8)

    def hour_source(h):
        return synthetic_hour_sessions(
            corpus, sess, h, num_sessions=16,
            max_session_length=cfg.max_session_length,
        )

    plan = make_pod_mesh(model_parallelism=2)
    harness = TemporalHarness(
        cfg,
        RunConfig(
            model_dir=f"/tmp/chameleon_mh_{pid}",
            training_hours_for_each_eval=2,
        ),
        sess, art, corpus.ace_matrix, corpus.metadata,
        mesh_plan=plan, mesh_min_rows=64,
    )
    stats = harness.train_hour(hour_source(0))
    row = harness.evaluate_hour(hour_source(1))

    stream = harness.state.stream
    result = {
        "process_id": pid,
        "avg_ce_loss": stats["avg_ce_loss"],
        "train_steps": stats["steps"],
        "hitrate_at_n": row["hitrate_at_n"],
        "mrr_at_n": row["mrr_at_n"],
        "sessions_count": row["sessions_count"],
        "buffer_ids": np.asarray(stream.buffer_ids).tolist(),
        "recent_pop_sum": int(np.asarray(stream.recent_pop).sum()),
        "current_step": int(stream.current_step),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(f"worker {pid} OK", flush=True)


if __name__ == "__main__":
    main()
