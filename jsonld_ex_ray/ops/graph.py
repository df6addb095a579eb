"""Iterative graph analytics over the triple table — the pattern for
algorithms the Dataset API can't express in one pass: a bounded number of
iterations, each built from the SAME bucketed-shuffle primitives as the
rest of the engine (hash-bucketed join + bucketed aggregation), so every
iteration is two bounded shuffles regardless of graph size.

PageRank here is the standard damped formulation with dangling-mass
redistribution; ranks sum to 1 every iteration (asserted in tests).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def triples_to_edges(ds):
    """Triple Dataset → (src, dst) edge Dataset (IRI/bnode objects only —
    literals are not nodes)."""

    def edges(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(
            batch.column("obj_kind"), value_set=pa.array(["iri", "bnode"])
        )
        e = batch.filter(keep)
        return pa.table({"src": e.column("subj"), "dst": e.column("obj")})

    return ds.map_batches(edges, batch_format="pyarrow", zero_copy_batch=True)


def connected_components(
    edges_ds,
    *,
    max_iterations: int = 25,
    num_buckets: int = 32,
):
    """Min-label propagation → Dataset(node, component) where
    ``component`` is the smallest node id in the connected component
    (undirected). Each iteration is one bucketed join + one bucketed
    min-aggregation; convergence is detected via a scalar changed-count.
    The transitive closure of near-duplicate PAIRS into clusters —
    pairwise keep-min alone misses chains (a~b, b~c but not a~c)."""
    from .agg import groupby_agg_bucketed
    from .joins import hash_join_bucketed

    # symmetrize once: propagation must flow both ways
    def sym(batch: pa.Table) -> pa.Table:
        src = batch.column("src").combine_chunks()
        dst = batch.column("dst").combine_chunks()
        return pa.table(
            {
                "src": pa.concat_arrays([src.cast(pa.string()), dst.cast(pa.string())]),
                "dst": pa.concat_arrays([dst.cast(pa.string()), src.cast(pa.string())]),
            }
        )

    edges = edges_ds.map_batches(sym, batch_format="pyarrow", zero_copy_batch=True).materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        u = pc.unique(batch.column("src").combine_chunks())
        return pa.table({"node": u, "component": u})

    import polars as pl

    def add_node_bucket(batch: pa.Table) -> pa.Table:
        h = pl.from_arrow(batch.select(["node"])).select(
            pl.col("node").hash(seed=0) % np.uint64(num_buckets)
        )["node"]
        return batch.append_column(
            "__bucket", pa.array(np.asarray(h.to_list(), dtype=np.int64).astype(np.int32))
        )

    def bucket_first(group: pa.Table) -> pa.Table:
        import polars as pl2

        mask = (
            pl2.from_arrow(group.select(["node"]))
            .select(pl2.col("node").is_first_distinct())
            .to_arrow()
            .column(0)
            .cast(pa.bool_())
        )
        return group.filter(mask).drop_columns(["__bucket"])

    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_node_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(bucket_first, batch_format="pyarrow")
        .materialize()
    )

    for _ in range(max_iterations):
        # neighbor labels flow along edges; min per destination
        flowed = hash_join_bucketed(
            edges,
            labels,
            left_on="src",
            right_on="node",
            right_cols=["component"],
            num_buckets=num_buckets,
        )
        incoming = groupby_agg_bucketed(
            flowed.map_batches(
                lambda b: pa.table({"node": b.column("dst"), "cand": b.column("component")}),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            ["node"],
            [("cand", "min", "cand_min")],
            num_buckets=num_buckets,
        )
        merged = hash_join_bucketed(
            labels,
            incoming,
            left_on="node",
            right_on="node",
            right_cols=["cand_min"],
            num_buckets=num_buckets,
            join_type="left",
        )

        def take_min(batch: pa.Table) -> pa.Table:
            cur = batch.column("component")
            cand = pc.fill_null(batch.column("cand_min").cast(pa.string()), "￿")
            new = pc.if_else(pc.less(cand, cur), cand, cur)
            changed = pc.not_equal(new, cur)
            return pa.table(
                {
                    "node": batch.column("node"),
                    "component": new,
                    "__changed": changed.cast(pa.int64()),
                }
            )

        updated = merged.map_batches(
            take_min, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        n_changed = int(
            updated.map_batches(
                lambda b: pa.table({"s": pa.array([pc.sum(b.column("__changed")).as_py() or 0])}),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).to_pandas()["s"].sum()
        )
        labels = updated.drop_columns(["__changed"]).materialize()
        if n_changed == 0:
            break
    return labels


def pagerank(
    edges_ds,
    *,
    iterations: int = 10,
    damping: float = 0.85,
    num_buckets: int = 32,
):
    """→ Dataset(node, rank). Each iteration:

    1. contributions: edges bucket-joined with current ranks on ``src``
       (broadcast is NOT assumed — ranks can be as large as the node
       set), emitting ``rank/out_degree`` per edge;
    2. bucketed sum by ``dst`` + damping + dangling-mass redistribution.

    The rank table is re-broadcast per iteration ONLY in the sense of
    being one side of a bucketed join — nothing materializes on the
    driver except the scalar dangling mass."""
    from .agg import groupby_agg_bucketed
    from .joins import hash_join_bucketed

    edges = edges_ds.materialize()  # reused every iteration

    # node set = union of endpoints (bucketed distinct)
    def endpoints(batch: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [batch.column("src").combine_chunks(), batch.column("dst").combine_chunks()]
        )
        return pa.table({"node": pc.unique(both)})

    import polars as pl

    def add_node_bucket(batch: pa.Table) -> pa.Table:
        h = pl.from_arrow(batch.select(["node"])).select(
            pl.col("node").hash(seed=0) % np.uint64(num_buckets)
        )["node"]
        return batch.append_column(
            "__bucket", pa.array(np.asarray(h.to_list(), dtype=np.int64).astype(np.int32))
        )

    def bucket_unique(group: pa.Table) -> pa.Table:
        return pa.table({"node": pc.unique(group.column("node").combine_chunks())})

    nodes = (
        edges.map_batches(endpoints, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_node_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(bucket_unique, batch_format="pyarrow")
        .materialize()
    )
    n = nodes.count()

    degrees = groupby_agg_bucketed(
        edges, ["src"], [("dst", "count", "out_degree")], num_buckets=num_buckets
    ).materialize()

    # ranks start uniform; schema (node, rank)
    def init_rank(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "rank": pa.array(np.full(batch.num_rows, 1.0 / n)),
            }
        )

    ranks = nodes.map_batches(init_rank, batch_format="pyarrow", zero_copy_batch=True).materialize()

    for _ in range(iterations):
        # rank + out_degree per node (left join: dangling nodes keep null degree)
        with_deg = hash_join_bucketed(
            ranks,
            degrees,
            left_on="node",
            right_on="src",
            right_cols=["out_degree"],
            num_buckets=num_buckets,
            join_type="left",
        )

        def split_mass(batch: pa.Table) -> pa.Table:
            deg = batch.column("out_degree").to_numpy(zero_copy_only=False).astype(np.float64)
            rank = batch.column("rank").to_numpy(zero_copy_only=False)
            dangling = np.isnan(deg) | (deg == 0)
            share = np.where(dangling, 0.0, rank / np.where(dangling, 1.0, deg))
            return pa.table(
                {
                    "node": batch.column("node"),
                    "share": pa.array(share),
                    "dangling_mass": pa.array(np.where(dangling, rank, 0.0)),
                }
            )

        mass = with_deg.map_batches(split_mass, batch_format="pyarrow", zero_copy_batch=True).materialize()
        dangling_total = float(
            mass.map_batches(
                lambda b: pa.table({"s": pa.array([pc.sum(b.column("dangling_mass")).as_py() or 0.0])}),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).to_pandas()["s"].sum()
        )

        contribs = hash_join_bucketed(
            edges,
            mass,
            left_on="src",
            right_on="node",
            right_cols=["share"],
            num_buckets=num_buckets,
        )
        summed = groupby_agg_bucketed(
            contribs.map_batches(
                lambda b: pa.table({"dst": b.column("dst"), "share": b.column("share")}),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            ["dst"],
            [("share", "sum", "incoming")],
            num_buckets=num_buckets,
        )
        # nodes with no inbound edges need rank rows too → left join from nodes
        joined = hash_join_bucketed(
            nodes,
            summed,
            left_on="node",
            right_on="dst",
            right_cols=["incoming"],
            num_buckets=num_buckets,
            join_type="left",
        )
        base = (1.0 - damping) / n + damping * dangling_total / n

        def apply_rank(batch: pa.Table) -> pa.Table:
            inc = batch.column("incoming").to_numpy(zero_copy_only=False).astype(np.float64)
            inc = np.nan_to_num(inc, nan=0.0)
            return pa.table(
                {"node": batch.column("node"), "rank": pa.array(base + damping * inc)}
            )

        ranks = joined.map_batches(
            apply_rank, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

    return ranks
