"""SR-GNN JAX baseline: graph construction parity and learning."""
import numpy as np
import pytest

from chameleon_recsys_tpu.baselines.sr_gnn import SRGNNJax, build_session_graphs


def test_graph_construction_matches_reference_semantics():
    sessions = np.array([[3, 5, 3, 7, 0]])
    nodes, adj_in, adj_out, alias = build_session_graphs(sessions)
    # unique nodes sorted
    np.testing.assert_array_equal(nodes[0, :3], [3, 5, 7])
    assert (nodes[0, 3:] == 0).all()
    # edges 3→5, 5→3, 3→7; raw adjacency A[u][v]=1
    # in-normalization divides columns by in-degree
    # node 3 (idx 0): in-edges from 5; node 5 (idx 1): from 3; node 7 (idx 2): from 3
    a_in = adj_in[0]
    assert a_in[1, 0] == pytest.approx(1.0)  # 5→3 column for node 3
    assert a_in[0, 1] == pytest.approx(1.0)  # 3→5
    assert a_in[0, 2] == pytest.approx(1.0)  # 3→7
    # out-normalization: node 3 has out-degree 2 → each out edge weight 0.5
    a_out = adj_out[0]
    assert a_out[1, 0] == pytest.approx(0.5)  # transpose of 3→5 /2
    assert a_out[2, 0] == pytest.approx(0.5)  # 3→7 /2
    assert a_out[0, 1] == pytest.approx(1.0)  # 5→3 /1
    # alias maps positions to node indices
    np.testing.assert_array_equal(alias[0], [0, 1, 0, 2, 0])


def test_srgnn_learns_last_click():
    n_items = 25
    model = SRGNNJax(n_items, hidden_size=16, lr=5e-2, seed=0)
    rng = np.random.RandomState(0)
    buffer_ids = np.arange(1, n_items)

    def make_batch(b=8, t=4):
        starts = rng.randint(1, n_items - t - 1, size=b)
        items = np.stack([np.arange(s, s + t) for s in starts]).astype(np.int64)
        targets = (items[:, -1] + 1).astype(np.int64)
        return items, targets

    losses = [
        model.fit_batch(*make_batch(), buffer_ids, n_sample=10, rng=rng)
        for _ in range(60)
    ]
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])

    items, targets = make_batch()
    neg = rng.randint(1, n_items, size=(len(targets), 5)).astype(np.int64)
    ranked = model.rank_candidates(items, targets, neg)
    hits = (ranked[:, 0] == targets).mean()
    assert hits > 0.5, hits
