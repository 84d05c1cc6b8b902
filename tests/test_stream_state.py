"""StreamState vs a numpy oracle transliterated from the reference semantics
(nar_module/nar/clicked_items_state.py:187-250)."""
import numpy as np
import jax.numpy as jnp

from chameleon_recsys_tpu.config import SECONDS_PER_HOUR
from chameleon_recsys_tpu.state import init_stream_state, update_stream_state

from conftest import tiny_nar_config


class NumpyOracle:
    """Host-side twin of the reference ClickedItemsState (ids+ts buffer,
    newest-first, hour-window truncation, recent-pop renormalization)."""

    def __init__(self, cfg, num_items):
        self.cfg = cfg
        self.num_items = num_items
        self.buffer = np.zeros((cfg.recent_clicks_buffer_max_size, 2), np.int64)
        self.global_pop = np.zeros(num_items, np.int64)

    def update(self, ids_flat, ts_flat):
        valid = ids_flat != 0
        ids, ts = ids_flat[valid], ts_flat[valid]
        batch = np.stack([ids, ts], axis=1)[::-1]
        min_ts = ts.min()
        window = int(round(self.cfg.recent_clicks_buffer_hours * SECONDS_PER_HOUR))
        keep = self.buffer[:, 1] >= (min_ts - window)
        kept = self.buffer[keep & (self.buffer[:, 0] != 0)]
        merged = np.concatenate([batch, kept])[
            : self.cfg.recent_clicks_buffer_max_size
        ]
        self.buffer = np.zeros_like(self.buffer)
        self.buffer[: len(merged)] = merged
        for i in ids:
            self.global_pop[i] += 1

    def recent_pop(self):
        pop = np.zeros(self.num_items, np.int64)
        ids = self.buffer[:, 0]
        for i in ids[ids != 0]:
            pop[i] += 1
        return pop

    def recent_pop_norm(self):
        pop = self.recent_pop()
        return np.maximum(
            pop / (pop.sum() + 1), 1.0 / self.cfg.recent_clicks_for_normalization
        )


def _random_batch(rng, b, l, num_items, hour):
    ids = rng.randint(0, num_items, size=(b, l))
    lengths = rng.randint(2, l + 1, size=b)
    ts = 100000 + hour * SECONDS_PER_HOUR + rng.randint(0, 3600, size=(b, l))
    ts = np.sort(ts, axis=1)
    for i in range(b):
        ids[i, lengths[i]:] = 0
        ts[i, lengths[i]:] = 0
        ids[i, : lengths[i]] = np.maximum(ids[i, : lengths[i]], 1)
    return ids.astype(np.int32), ts.astype(np.int32)


def test_stream_state_matches_oracle():
    cfg = tiny_nar_config(
        recent_clicks_buffer_max_size=50, recent_clicks_buffer_hours=1.0
    )
    num_items = 40
    state = init_stream_state(cfg, num_items)
    oracle = NumpyOracle(cfg, num_items)
    rng = np.random.RandomState(0)

    for hour in range(4):
        for _ in range(3):
            ids, ts = _random_batch(rng, 6, 5, num_items, hour)
            state = update_stream_state(state, jnp.array(ids), jnp.array(ts), cfg)
            oracle.update(ids.reshape(-1), ts.reshape(-1))

            np.testing.assert_array_equal(
                np.asarray(state.buffer_ids), oracle.buffer[:, 0]
            )
            np.testing.assert_array_equal(
                np.asarray(state.buffer_ts), oracle.buffer[:, 1]
            )
            np.testing.assert_array_equal(
                np.asarray(state.recent_pop), oracle.recent_pop()
            )
            np.testing.assert_allclose(
                np.asarray(state.recent_pop_norm),
                oracle.recent_pop_norm(),
                rtol=1e-6,
            )
            np.testing.assert_array_equal(
                np.asarray(state.global_pop), oracle.global_pop
            )


def test_buffer_newest_first_and_window_truncation():
    cfg = tiny_nar_config(
        recent_clicks_buffer_max_size=10, recent_clicks_buffer_hours=1.0
    )
    state = init_stream_state(cfg, 20)
    ids = jnp.array([[1, 2, 3, 0]], jnp.int32)
    ts = jnp.array([[1000, 2000, 3000, 0]], jnp.int32)
    state = update_stream_state(state, ids, ts, cfg)
    # newest-first: reversed flattened order
    np.testing.assert_array_equal(
        np.asarray(state.buffer_ids[:3]), [3, 2, 1]
    )
    # second batch 2 hours later evicts everything outside the 1h window
    ids2 = jnp.array([[5, 6, 0, 0]], jnp.int32)
    ts2 = jnp.array([[1000 + 7200, 1000 + 7300, 0, 0]], jnp.int32)
    state = update_stream_state(state, ids2, ts2, cfg)
    np.testing.assert_array_equal(np.asarray(state.buffer_ids[:3]), [6, 5, 0])
    assert int(state.recent_pop.sum()) == 2
