"""Windowed aggregates + as-of join operators."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_tumbling_covers_every_event_once(ray_session):
    import ray.data

    from jsonld_ex_ray.ops.window import tumbling_window_agg

    ds = ray.data.read_parquet(f"{SF}/events.parquet", columns=["ts", "value"])
    out = tumbling_window_agg(ds, "ts", 3600, [("value", "count", "n")])
    total = pq.read_metadata(f"{SF}/events.parquet").num_rows
    assert out.n.sum() == total
    assert (out.window_start % 3600 == 0).all()


def test_sliding_covers_every_event_fanout_times(ray_session):
    import ray.data

    from jsonld_ex_ray.ops.window import sliding_window_agg

    ds = ray.data.read_parquet(f"{SF}/events.parquet", columns=["ts", "value"])
    out = sliding_window_agg(ds, "ts", 3600, 1800, [("value", "count", "n")])
    total = pq.read_metadata(f"{SF}/events.parquet").num_rows
    assert out.n.sum() == total * 2  # window/slide = 2 windows per event
    assert (out.window_start % 1800 == 0).all()


def test_asof_join_matches_pandas(ray_session):
    import pyarrow.compute as pc
    import ray.data

    from jsonld_ex_ray.ops.joins import asof_join_broadcast

    events = pq.read_table(f"{SF}/events.parquet")
    views = events.filter(pc.equal(events.column("event_type"), pa.scalar("view")))
    right = pa.table(
        {"user_id": views.column("user_id"), "ts": views.column("ts"), "view_ts": views.column("ts")}
    )
    left = ray.data.read_parquet(f"{SF}/events.parquet", columns=["event_id", "user_id", "ts"])
    got = (
        asof_join_broadcast(left, right, on="ts", by="user_id", allow_exact_matches=False)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)[["event_id", "view_ts"]]
    )
    ldf = events.to_pandas()[["event_id", "user_id", "ts"]].sort_values("ts")
    rdf = right.to_pandas().sort_values("ts")
    want = (
        pd.merge_asof(ldf, rdf, on="ts", by="user_id", allow_exact_matches=False)
        .sort_values("event_id")
        .reset_index(drop=True)[["event_id", "view_ts"]]
    )
    pd.testing.assert_frame_equal(got, want)
    assert got.view_ts.notna().any()  # some events do have a prior view
