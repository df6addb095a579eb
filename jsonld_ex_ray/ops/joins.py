"""Join operators Ray Data lacks: as-of join (and its range-join cousin).

``asof_join_broadcast``: the right side (e.g. a rates/dimension/event
subset) is sorted once, broadcast via ``ray.put``, and each left batch does
a vectorized ``pandas.merge_asof`` — the classic broadcast temporal join.
Partitioning assumption: the RIGHT side fits in worker memory; the left
side streams. For two large sides, tag-union both into one dataset,
bucket by hash(by-key), and run the same merge inside
``groupby(bucket).map_groups`` (documented here; the broadcast path covers
the overwhelmingly common small-right case).
"""

from __future__ import annotations

import pyarrow as pa


def asof_join_broadcast(
    left_ds,
    right_table: pa.Table,
    *,
    on: str,
    by: str | None = None,
    right_value_cols: list[str] | None = None,
    suffix: str = "_right",
    allow_exact_matches: bool = False,
    direction: str = "backward",
):
    """For each left row, attach the nearest prior (direction='backward')
    right row by ``on`` (within the same ``by`` group). Right-side value
    columns are suffixed. → Dataset(left columns + right value columns)."""
    import pandas as pd
    import ray

    rdf = right_table.to_pandas().sort_values(on).reset_index(drop=True)
    if right_value_cols is None:
        right_value_cols = [c for c in rdf.columns if c not in (on, by)]
    right_ref = ray.put(rdf)

    class AsofMerge:
        def __init__(self, ref):
            self.right = ray.get(ref)  # broadcast: fetched once per worker

        def __call__(self, batch: pa.Table) -> pa.Table:
            left = batch.to_pandas().sort_values(on)
            merged = pd.merge_asof(
                left,
                self.right,
                on=on,
                by=by,
                direction=direction,
                allow_exact_matches=allow_exact_matches,
                suffixes=("", suffix),
            )
            return pa.Table.from_pandas(merged, preserve_index=False)

    return left_ds.map_batches(
        AsofMerge,
        fn_constructor_kwargs={"ref": right_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=2,
    )


def range_join_broadcast(
    left_ds,
    bands: list[tuple[float, float, str]],
    *,
    value_col: str,
    label_col: str = "band",
):
    """Range join against non-overlapping sorted [lo, hi) bands: broadcast
    the band table and assign per batch via ``numpy.searchsorted`` —
    O(log B) per row, no shuffle. Rows outside every band get null."""
    import numpy as np

    bands = sorted(bands)
    lows = np.asarray([b[0] for b in bands], dtype=np.float64)
    highs = np.asarray([b[1] for b in bands], dtype=np.float64)
    labels = [b[2] for b in bands]

    def assign(batch: pa.Table) -> pa.Table:
        vals = np.asarray(batch.column(value_col).to_pylist(), dtype=np.float64)
        idx = np.searchsorted(lows, vals, side="right") - 1
        out = []
        for v, i in zip(vals, idx):
            if i >= 0 and v < highs[i]:
                out.append(labels[i])
            else:
                out.append(None)
        return batch.append_column(label_col, pa.array(out, pa.string()))

    return left_ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
