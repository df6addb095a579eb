"""Distributed SQL set operations (UNION / INTERSECT / EXCEPT, distinct
semantics) as ONE bounded shuffle.

Reference parity: the reference engine exposes set semantics only through
its triple-set dedup (lib/json/ld/flattening.ex merges node maps
set-wise); generic dataset INTERSECT/EXCEPT is part of the
training-data-pipeline surface this engine adds on top.

Shape at scale: each side is reduced to per-block DISTINCT rows inside
``map_batches`` (combiner — duplicate values never leave the block), both
sides are tagged and bucketed by a version-stable hash of the VALUE
columns, and each bucket resolves membership with the vectorized arrow
semi/anti join. Nothing lands on the driver; the result stays a
distributed Dataset. Duplicate-preserving INTERSECT ALL is out of scope
(SQL's multiset semantics need per-value counts — ``groupby_agg_bucketed``
covers that shape if ever needed).
"""

from __future__ import annotations

import pyarrow as pa

from .hashing import bucket_ids


def set_op(
    left_ds,
    right_ds,
    *,
    left_cols: list[str],
    right_cols: list[str] | None = None,
    op: str = "intersect",
    num_buckets: int = 64,
):
    """``op``: ``union`` | ``intersect`` | ``except``. Output columns
    carry the LEFT side's names (SQL convention: the first SELECT names
    the result). ``right_cols`` defaults to ``left_cols`` (same names on
    both sides). ``union`` is SQL UNION (distinct): both sides ride the
    same per-block-distinct combiner and value-hash shuffle, and each
    bucket resolves to one arrow hash-distinct over the concatenated
    sides — no join probe at all, and NULL rows collapse to one because
    arrow group_by hashes a null key as its own single group."""
    if op not in ("union", "intersect", "except"):
        raise ValueError(f"op must be union|intersect|except, got {op!r}")
    right_cols = right_cols or left_cols
    if len(right_cols) != len(left_cols):
        raise ValueError("left_cols and right_cols must have equal length")

    def make_side(cols: list[str], side: int):
        def prep(batch: pa.Table) -> pa.Table:
            t = batch.select(cols).group_by(cols).aggregate([])
            t = t.rename_columns(left_cols)  # unified names for the union
            t = t.append_column("__side", pa.array([side] * t.num_rows, pa.int8()))
            return t.append_column(
                "__bucket", bucket_ids(t, left_cols, num_buckets, seed=0)
            )

        return prep

    def resolve(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__bucket"])
        import pyarrow.compute as pc

        def fill_value(typ):
            if pa.types.is_string(typ) or pa.types.is_large_string(typ):
                return ""
            if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
                return b""
            if pa.types.is_boolean(typ):
                return False
            return 0

        def null_safe(t: pa.Table):
            # SQL set ops treat NULL as equal to NULL (IS NOT DISTINCT
            # FROM), but the arrow hash join never matches null keys —
            # join instead on (null-filled shadow, validity flag) pairs,
            # which are never null and distinguish a filled NULL from a
            # genuine sentinel value.
            keys = []
            for i, c in enumerate(left_cols):
                col = t.column(c)
                typ = col.type
                t = t.append_column(
                    f"__k{i}", pc.fill_null(col, pa.scalar(fill_value(typ), typ))
                ).append_column(f"__v{i}", pc.is_valid(col))
                keys += [f"__k{i}", f"__v{i}"]
            return t, keys

        if op == "union":
            both = group.drop_columns(["__side"])
            return both.group_by(left_cols).aggregate([])

        side = group.column("__side")
        left = group.filter(pc.equal(side, 0)).drop_columns(["__side"])
        right = group.filter(pc.equal(side, 1)).drop_columns(["__side"])
        # per-block distinct can still collide across blocks of one side
        left = left.group_by(left_cols).aggregate([])
        right = right.group_by(left_cols).aggregate([])
        join_type = "left semi" if op == "intersect" else "left anti"
        if right.num_rows == 0:
            return left.schema.empty_table() if op == "intersect" else left
        left_e, keys = null_safe(left)
        right_e, _ = null_safe(right)
        out = left_e.join(right_e.select(keys), keys=keys, join_type=join_type)
        return out.select(left_cols)

    tagged = left_ds.map_batches(
        make_side(left_cols, 0), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right_ds.map_batches(
            make_side(right_cols, 1), batch_format="pyarrow", zero_copy_batch=True
        )
    )
    return tagged.groupby("__bucket").map_groups(resolve, batch_format="pyarrow")
