"""G1-configuration sharded execution on the virtual mesh (round-5).

The toy-shape equivalence suite (tests/test_multichip.py) proves the
sharding math at small dims; this one EXECUTES the exact paper-config
G1 program — 46,034-row sharded tables, CAR 1024, UGRNN 255x2,
capacity-2688 grouped valid-row compaction (reference README.md:255-308
flags) — on an 8-device (4 data x 2 model) CPU mesh and requires
single-device parity: bit-tolerant losses, EXACT integer streaming
state, and near-identical eval ranked lists in f32 (where equality is
meaningful; the production bf16 path shares the same sharded program).
Catches shape-dependent sharding bugs (uneven row splits,
compaction-group remainders at real capacities) the toy dims cannot.
"""
import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


@pytest.mark.slow
def test_g1_shape_mesh_parity_f32():
    from g1_mesh_parity import run_g1_mesh_parity

    stats = run_g1_mesh_parity(
        dp=4, mp=2, train_hours=1, sessions_per_hour=128,
        quiet=True, compute_dtype="float32",
    )
    # the asserts live inside run_g1_mesh_parity; spot-check the report
    assert stats["items"] == 46_034
    assert stats["capacity"] == 2688
    assert stats["ranked_overlap"] >= 0.9
