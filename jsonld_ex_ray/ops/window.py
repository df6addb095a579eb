"""Event-time window aggregates — operators Ray Data lacks natively.

- Tumbling windows: vectorized window-id assignment (epoch floor) +
  map-side combiner aggregation (ops.agg) — no per-event Python.
- Sliding windows: each event fans out to its ``window/slide`` covering
  windows inside ``map_batches`` (bounded expansion), then the same
  combiner path.

Batch semantics (SURVEY.md §2.9): no watermarks/late data — the input is a
bounded table with an event-time column.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .agg import groupby_agg_lowcard


def _epoch_seconds(col: pa.ChunkedArray) -> pa.ChunkedArray:
    # timestamp[us] → int64 seconds (vectorized)
    return pc.divide(pc.cast(col, pa.int64()), 1_000_000)


def tumbling_window_agg(
    ds,
    ts_col: str,
    window_s: int,
    aggs: list[tuple[str, str, str]],
    extra_keys: list[str] | None = None,
):
    """→ pandas DataFrame keyed by ``window_start`` (epoch seconds) [+
    extra_keys] with the requested aggregates."""
    extra_keys = extra_keys or []

    def assign(batch: pa.Table) -> pa.Table:
        secs = _epoch_seconds(batch.column(ts_col))
        # integer division truncates == floor for non-negative epochs
        ws = pc.multiply(pc.divide(secs, window_s), window_s)
        return batch.append_column("window_start", pc.cast(ws, pa.int64()))

    keyed = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    return groupby_agg_lowcard(keyed, ["window_start", *extra_keys], aggs)


def sliding_window_agg(
    ds,
    ts_col: str,
    window_s: int,
    slide_s: int,
    aggs: list[tuple[str, str, str]],
    extra_keys: list[str] | None = None,
):
    """Overlapping windows of ``window_s`` advancing every ``slide_s``:
    an event at t belongs to windows starting in
    (t - window_s, t] aligned to slide_s — fan-out is window_s/slide_s
    rows per event, emitted vectorized-ish per batch."""
    if window_s % slide_s != 0:
        raise ValueError("window_s must be a multiple of slide_s")
    fanout = window_s // slide_s
    extra_keys = extra_keys or []

    def expand_windows(batch: pa.Table) -> pa.Table:
        secs = _epoch_seconds(batch.column(ts_col)).to_pylist()
        n = len(secs)
        starts: list[int] = []
        take_idx: list[int] = []
        for i, s in enumerate(secs):
            last = (s // slide_s) * slide_s  # latest window containing s
            for k in range(fanout):
                w = last - k * slide_s
                if s < w + window_s and s >= w:
                    starts.append(w)
                    take_idx.append(i)
        out = batch.take(pa.array(take_idx, pa.int32()))
        return out.append_column("window_start", pa.array(starts, pa.int64()))

    keyed = ds.map_batches(expand_windows, batch_format="pyarrow", zero_copy_batch=True)
    return groupby_agg_lowcard(keyed, ["window_start", *extra_keys], aggs)
