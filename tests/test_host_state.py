"""HostState co-occurrence: vectorized pair counting vs the reference's
per-session permutations loop (clicked_items_state.py:252-256), pending-
buffer flush semantics, and checkpoint interplay."""
from itertools import permutations

import numpy as np
from scipy.sparse import csr_matrix

from chameleon_recsys_tpu.state.host_state import HostState


def _oracle_cooc(num_items, batches):
    rows_all, cols_all = [], []
    for batch in batches:
        for session_items in batch:
            nonzero = session_items[np.nonzero(session_items)]
            for r, c in permutations(nonzero, r=2):
                rows_all.append(r)
                cols_all.append(c)
    return csr_matrix(
        (np.ones(len(rows_all), np.int64), (rows_all, cols_all)),
        shape=(num_items, num_items),
    )


def test_vectorized_matches_permutations_oracle():
    rng = np.random.RandomState(0)
    num_items = 50
    batches = []
    for _ in range(5):
        b = rng.randint(0, num_items, size=(8, 6))
        b[rng.rand(8, 6) < 0.4] = 0          # padding
        b[3] = 0                              # fully-padded session
        b[4, :3] = 7                          # repeated item pairs with itself
        batches.append(b)

    host = HostState(num_items)
    for b in batches:
        host.update_items_coocurrences(b)
    got = host.items_coocurrences
    want = _oracle_cooc(num_items, batches)
    assert (got != want).nnz == 0


def test_pending_flush_is_lazy_and_complete():
    host = HostState(10)
    host.update_items_coocurrences(np.array([[1, 2, 0]]))
    host.update_items_coocurrences(np.array([[2, 3, 0]]))
    assert host._pending_pairs  # nothing read yet -> still buffered
    m = host.items_coocurrences
    assert not host._pending_pairs
    assert m[1, 2] == 1 and m[2, 1] == 1 and m[2, 3] == 1 and m[3, 2] == 1
    # reading twice is idempotent
    assert (host.items_coocurrences != m).nnz == 0


def test_checkpoint_sees_pending_and_restore_discards_later_updates():
    host = HostState(10)
    host.update_items_coocurrences(np.array([[1, 2, 0]]))
    host.save_state_checkpoint()              # property read flushes pending
    host.update_items_coocurrences(np.array([[4, 5, 0]]))
    assert host.items_coocurrences[4, 5] == 1
    host.restore_state_checkpoint()
    m = host.items_coocurrences
    assert m[1, 2] == 1 and m[4, 5] == 0
