"""Host-side streaming state: co-occurrence matrix and cold-start tracking.

The dense/ragged pieces of the reference's ``ClickedItemsState`` that only
feed the classical baselines and cold-start analysis stay on the host (they
are sparse, data-dependent structures with no place on the MXU):

  * item co-occurrence csr matrix (clicked_items_state.py:252-256);
  * first-click step tracking (clicked_items_state.py:196-203);
  * per-benchmark opaque state dicts (clicked_items_state.py:36).

The hot state (buffer, popularity) lives on device in ``StreamState``; a
``HostState`` snapshot mirror of those arrays is refreshed lazily only when a
benchmark or metric needs it.
"""
from __future__ import annotations

import copy
from itertools import permutations
from typing import Dict, Optional

import numpy as np
from scipy.sparse import csr_matrix


class HostState:
    def __init__(self, num_items: int):
        self.num_items = num_items
        self.reset()

    def reset(self):
        self.items_coocurrences = csr_matrix(
            (self.num_items, self.num_items), dtype=np.int64
        )
        self.benchmarks_states: Dict[str, object] = {}
        self.items_first_click_step: Dict[int, int] = {}
        self.current_step = 0
        self._checkpoint = None

    # -- co-occurrence ------------------------------------------------------
    def update_items_coocurrences(self, batch_clicked_items: np.ndarray):
        """Counts within-session ordered pairs (clicked_items_state.py:252-256)."""
        rows_all, cols_all = [], []
        for session_items in batch_clicked_items:
            nonzero = session_items[np.nonzero(session_items)]
            pairs = list(permutations(nonzero, r=2))
            if not pairs:
                continue
            r, c = zip(*pairs)
            rows_all.extend(r)
            cols_all.extend(c)
        if rows_all:
            delta = csr_matrix(
                (np.ones(len(rows_all), dtype=np.int64), (rows_all, cols_all)),
                shape=(self.num_items, self.num_items),
            )
            self.items_coocurrences = self.items_coocurrences + delta

    # -- cold-start tracking ------------------------------------------------
    def increment_current_step(self):
        self.current_step += 1

    def update_items_first_click_step(self, batch_clicked_items):
        item_set = set(np.asarray(batch_clicked_items).reshape(-1).tolist())
        item_set.discard(0)
        for item_id in item_set:
            if item_id not in self.items_first_click_step:
                self.items_first_click_step[item_id] = self.current_step

    # -- checkpoint around eval (clicked_items_state.py:49-79) --------------
    def save_state_checkpoint(self):
        self._checkpoint = dict(
            items_coocurrences=self.items_coocurrences.copy(),
            benchmarks_states=copy.deepcopy(self.benchmarks_states),
            items_first_click_step=dict(self.items_first_click_step),
            current_step=self.current_step,
        )

    def restore_state_checkpoint(self):
        if self._checkpoint is None:
            raise RuntimeError("no host-state checkpoint saved")
        self.items_coocurrences = self._checkpoint["items_coocurrences"]
        self.benchmarks_states = self._checkpoint["benchmarks_states"]
        self.items_first_click_step = self._checkpoint["items_first_click_step"]
        self.current_step = self._checkpoint["current_step"]
        self._checkpoint = None
