"""Aggregation helpers that avoid all-to-all shuffles.

``groupby_agg_lowcard``: map-side partial aggregation (combiner) inside
``map_batches`` + a tiny final combine of ``n_blocks × n_groups`` partial
rows. For low-cardinality keys this replaces Ray's sort-based groupby
shuffle entirely — the pattern that matters at 100 TB: each block emits a
handful of partial rows, and the final combine touches kilobytes.

``topk``: per-block top-k inside ``map_batches`` + global sort+limit over
the tiny per-block survivors (k × n_blocks rows), replacing a full sort.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_SUPPORTED = ("sum", "count", "mean", "min", "max")


def groupby_agg_lowcard(ds, keys: list[str], aggs: list[tuple[str, str, str]]):
    """aggs: [(column, op, alias)] with op in sum|count|mean|min|max.
    Returns a pandas DataFrame sorted by keys (result is inherently small:
    one row per distinct key combination)."""
    for _, op, _ in aggs:
        if op not in _SUPPORTED:
            raise ValueError(f"unsupported op {op!r}")

    def partial(batch: pa.Table) -> pa.Table:
        # arrow hash aggregation per block: sums + counts (mean = sum/count
        # at final combine; min/max combine by min/max)
        specs = []
        for col, op, alias in aggs:
            if op == "count":
                specs.append((keys[0], "count", f"__cnt__{alias}"))
            elif op == "mean":
                specs.append((col, "sum", f"__sum__{alias}"))
                specs.append((col, "count", f"__cnt__{alias}"))
            else:
                specs.append((col, op, f"__{op}__{alias}"))
        tbl = batch.group_by(keys).aggregate([(c, o) for c, o, _ in specs])
        # rename arrow's "<col>_<op>" outputs to our stable partial names
        names = list(keys)
        rename = {f"{c}_{o}": n for c, o, n in specs}
        out_names = []
        for name in tbl.schema.names:
            out_names.append(rename.get(name, name))
        return tbl.rename_columns(out_names)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # final combine: tiny (n_blocks × n_groups rows) — safe to collect
    df = partials.to_pandas()
    grouped = df.groupby(keys, as_index=False, sort=True)
    out = grouped[[c for c in df.columns if c not in keys]].sum()
    result = out[keys].copy()
    for col, op, alias in aggs:
        if op == "count":
            result[alias] = out[f"__cnt__{alias}"]
        elif op == "mean":
            result[alias] = out[f"__sum__{alias}"] / out[f"__cnt__{alias}"]
        elif op == "sum":
            result[alias] = out[f"__sum__{alias}"]
        else:
            # min/max of partials re-aggregated: redo with min/max not sum
            agg_fn = "min" if op == "min" else "max"
            result[alias] = grouped[f"__{op}__{alias}"].agg(agg_fn)[f"__{op}__{alias}"]
    return result.sort_values(keys).reset_index(drop=True)


def sample_per_group(ds, group_col: str, id_col: str, n: int):
    """Deterministic stratified sampling: keep the ``n`` rows per group
    with the smallest ``md5(id)`` — reproducible across runs/retries and
    oracle-checkable (unlike RNG sampling). Map-side per-group top-n
    (combiner) → tiny grouped final selection."""
    import hashlib

    def add_rank_key(batch: pa.Table) -> pa.Table:
        keys = [
            hashlib.md5(str(v).encode()).hexdigest()
            for v in batch.column(id_col).to_pylist()
        ]
        return batch.append_column("__rk", pa.array(keys, pa.string()))

    def local_topn(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = (
            df.sort_values([group_col, "__rk"])
            .groupby(group_col, sort=False)
            .head(n)
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    def final_topn(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values("__rk").head(n)
        return pa.Table.from_pandas(df.drop(columns="__rk"), preserve_index=False)

    return (
        ds.map_batches(add_rank_key, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(local_topn, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .map_groups(final_topn, batch_format="pyarrow")
    )


def topk(ds, sort_cols: list[str], descending: list[bool], k: int):
    """Global top-k without a full sort: per-block top-k, then sort+limit
    over the k×n_blocks survivors."""

    def local(batch: pa.Table) -> pa.Table:
        order = [
            (c, "descending" if d else "ascending")
            for c, d in zip(sort_cols, descending)
        ]
        idx = pc.sort_indices(batch, sort_keys=order)[:k]
        return batch.take(idx)

    return (
        ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
        .sort(sort_cols, descending=descending)
        .limit(k)
    )
