"""Round-5 tests: segmented_head null-int regression, vectorized
interval-join probe, cardinality-gated group-stats fallbacks, the
substring-dedup CUT pass, and the new oracled kernels (first/last,
ntile, LSH exact-dup recall)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# ---------------------------------------------------------------------------
# segmented_head: NULL numeric group keys form ONE run (ADVICE r4)
# ---------------------------------------------------------------------------


def test_segmented_head_null_int_group_one_run():
    """A nullable int64 group column must treat ALL null rows as one
    partition (SQL row_number PARTITION BY parity), not NaN-per-row runs
    that let every null row pass rank < k."""
    from jsonld_ex_ray.ops.agg import segmented_head

    t = pa.table(
        {
            "g": pa.array([1, 1, 1, None, None, None], type=pa.int64()),
            "v": [3, 1, 2, 6, 4, 5],
        }
    )
    out = segmented_head(t, "g", [("v", "ascending")], 1)
    assert out.num_rows == 2
    assert out.to_pydict() == {"g": [1, None], "v": [1, 4]}


def test_segmented_head_null_group_types_matrix():
    from jsonld_ex_ray.ops.agg import segmented_head

    for typ, vals in [
        (pa.float64(), [1.5, 1.5, None, None]),
        (pa.string(), ["a", "a", None, None]),
        (pa.timestamp("us"), [1000, 1000, None, None]),
    ]:
        t = pa.table(
            {"g": pa.array(vals, type=typ), "v": pa.array([2, 1, 9, 3])}
        )
        out = segmented_head(t, "g", [("v", "ascending")], 1)
        assert out.num_rows == 2, typ
        assert out.column("v").to_pylist() == [1, 3], typ


# ---------------------------------------------------------------------------
# interval_join_banded: vectorized bucket probe (no per-interval Python)
# ---------------------------------------------------------------------------


def test_interval_join_many_intervals_one_band(ray_session):
    """50k intervals all landing in ONE band, plus values spread across
    it: the batched searchsorted/repeat-expand probe must produce exactly
    the brute-force BETWEEN matches (and do so loop-free — this sizing
    finishes fast only if the kernel is vectorized)."""
    import ray.data
    from jsonld_ex_ray.ops.joins import interval_join_banded

    rng = np.random.RandomState(7)
    n_iv = 50_000
    lo = rng.uniform(0, 999, n_iv)
    hi = lo + rng.uniform(0, 0.6, n_iv)  # narrow: every interval in band 0
    vals = rng.uniform(0, 1000, 400)
    left = pd.DataFrame({"v": vals, "lid": np.arange(400, dtype=np.int64)})
    right = pd.DataFrame(
        {"lo": lo, "hi": hi, "rid": np.arange(n_iv, dtype=np.int64)}
    )
    out = (
        interval_join_banded(
            ray.data.from_pandas(left).repartition(4),
            ray.data.from_pandas(right).repartition(4),
            left_val="v",
            right_lo="lo",
            right_hi="hi",
            right_cols=["rid"],
            band_width=1000.0,  # one band for everything
            num_buckets=4,
        )
        .to_pandas()
        .sort_values(["lid", "rid"])
        .reset_index(drop=True)
    )
    # brute force oracle
    m = (vals[:, None] >= lo[None, :]) & (vals[:, None] <= hi[None, :])
    li, ri = np.nonzero(m)
    want = (
        pd.DataFrame({"lid": li.astype(np.int64), "rid": ri.astype(np.int64)})
        .sort_values(["lid", "rid"])
        .reset_index(drop=True)
    )
    assert len(out) == len(want) > 0
    pd.testing.assert_frame_equal(out[["lid", "rid"]], want)
