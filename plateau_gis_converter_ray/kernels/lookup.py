"""Vectorized broadcast-dimension lookups for map-side dim attaches.

The TPC-H-shaped queries broadcast tiny dimension tables (nation names,
supplier->nation, part costs) into ``map_batches`` stages. The obvious
``pd.Series.map(dict)`` is a per-row Python dict probe — on a 600k-row
lineitem batch chain it dominates the stage. :class:`IntLookup` replaces it
with one ``np.searchsorted`` over the sorted key array plus one vectorized
gather (``pyarrow.Array.take`` for string values — C++ memcpy — or numpy
fancy indexing for numeric values). Misses surface as a boolean mask so
filter-semantics (inner-join-like attaches) stay explicit.

Scale note: the lookup ships once per task closure like the dict did; the
sorted arrays are the same bytes, just probe-able at memory bandwidth.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class IntLookup:
    """int64-key -> value lookup, vectorized over whole batches.

    ``values`` may be a numpy array (numeric gather) or anything
    convertible to a ``pyarrow.Array`` (string gather via ``take``).
    """

    def __init__(self, keys, values):
        keys = np.asarray(keys, dtype=np.int64)
        order = np.argsort(keys, kind="stable")
        self.keys = keys[order]
        if isinstance(values, np.ndarray):
            self.values = values[order]
            self._is_np = True
        else:
            arr = values if isinstance(values, pa.Array) else pa.array(values)
            self.values = arr.take(pa.array(order))
            self._is_np = False

    def probe(self, k: np.ndarray):
        """Return (positions, hit_mask) for int64 probe keys ``k``."""
        k = np.asarray(k)
        if k.dtype != np.int64:
            k = k.astype(np.int64)
        if len(self.keys) == 0:
            return np.zeros(len(k), np.int64), np.zeros(len(k), bool)
        pos = np.searchsorted(self.keys, k)
        pos_c = np.minimum(pos, len(self.keys) - 1)
        hit = self.keys[pos_c] == k
        return pos_c, hit

    def gather(self, k: np.ndarray):
        """Values for probe keys ``k`` (caller guarantees all keys hit —
        misses gather an arbitrary neighbor; use :meth:`probe` first when
        the attach is filtering)."""
        pos, _ = self.probe(k)
        if self._is_np:
            return self.values[pos]
        return self.values.take(pa.array(pos))
