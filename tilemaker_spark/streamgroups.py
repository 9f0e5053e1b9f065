"""Streaming grouped execution over sorted Arrow batches.

The groupBy().applyInPandas pattern costs one Python/Arrow round-trip
plus ~2-4 ms of pandas machinery PER GROUP — ruinous when groups are
small and numerous (measured on both the tile encoder and the relation
assembler). The replacement contract:

    df.repartition(n_parts, *keys).sortWithinPartitions(*keys, ...order)
      .mapInPandas(stream_grouped(keys, process_batch), schema)

The JVM does the shuffle and sort; Python receives large sorted Arrow
batches and walks contiguous key runs with numpy. A group that
straddles an Arrow batch boundary is carried into the next batch and
flushed at end-of-partition.

CONTRACT: the repartition MUST pin numPartitions (REPARTITION_BY_NUM).
mapInPandas declares no required distribution, so an unpinned
repartition(col) exchange is fair game for AQE rewrites (local shuffle
read, coalescing) that break the all-rows-of-a-key-in-one-task
guarantee this pattern depends on. A pinned count is user-specified and
AQE never touches it. (Measured: unpinned + AQE split 75% of relation
groups at x64 scale; tests/test_pipeline.py guards this.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def stream_grouped(key_cols: list, process_batch):
    """-> a mapInPandas function. ``process_batch(pdf)`` receives a
    DataFrame containing only COMPLETE groups (contiguous on key_cols)
    and returns the output DataFrame."""

    def runner(batches):
        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            n = len(pdf)
            if n == 0:
                continue
            change = np.zeros(n - 1, dtype=bool)
            for c in key_cols:
                arr = pdf[c].to_numpy()
                change |= arr[1:] != arr[:-1]
            idx = np.flatnonzero(change) + 1
            last_start = int(idx[-1]) if len(idx) else 0
            carry = pdf.iloc[last_start:]
            if last_start:
                yield process_batch(pdf.iloc[:last_start])
        if carry is not None and len(carry):
            yield process_batch(carry)

    return runner


def group_slices(pdf: pd.DataFrame, key_cols: list):
    """Start/end index pairs of contiguous key runs in a sorted frame."""
    n = len(pdf)
    change = np.zeros(n - 1, dtype=bool)
    for c in key_cols:
        arr = pdf[c].to_numpy()
        change |= arr[1:] != arr[:-1]
    starts = np.concatenate(([0], np.flatnonzero(change) + 1, [n]))
    return [(int(starts[i]), int(starts[i + 1])) for i in range(len(starts) - 1)]
