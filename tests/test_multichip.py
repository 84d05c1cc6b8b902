"""Multi-chip sharding: the full train step jitted over an 8-device
(data × model) CPU mesh must compile, run, and agree with single-device
execution."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_dryrun_multichip_8():
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


def test_mesh_shardings_rules():
    import jax
    import jax.numpy as jnp

    from chameleon_recsys_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        params_sharding,
    )

    plan = make_mesh(data_parallelism=4, model_parallelism=2,
                     devices=jax.devices()[:8])
    params = {
        "big_table": jnp.zeros((4096, 8)),
        "small_kernel": jnp.zeros((64, 64)),
        "bias": jnp.zeros((64,)),
    }
    sh = params_sharding(plan, params, min_rows=1024)
    assert "model" in str(sh["big_table"].spec)
    assert sh["small_kernel"].spec == jax.sharding.PartitionSpec()

    batch = {"item_clicked": jnp.zeros((8, 4), jnp.int32)}
    bsh = batch_sharding(plan, batch)
    assert bsh["item_clicked"].spec[0] == "data"
