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
