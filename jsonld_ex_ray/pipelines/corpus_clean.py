"""The training-data corpus-cleaning pipeline, chained end-to-end —
what a 100-TB pre-training ingest actually runs over the documents
table:

    read(documents) → quality gate → repetition gate (Gopher rules)
      → exact dedup (key-only shuffle + loser broadcast)
      → deterministic split assignment (md5 boundaries)

Every stage is one of the engine's oracled operators, so the WHOLE
composed pipeline is SQL-checkable (see ``corpus_clean`` in
``__ray_entry__.oracle_sql``). The chain stays one lazy Dataset: the
gates fuse into a single streaming pass, exact_dedup adds its bounded
key shuffle + anti-filter, splits are another fused map — no driver
materialization anywhere.

Near-dup (MinHash) and decontamination stages compose the same way —
``clean_corpus(..., near_dup=True)`` — but sit behind a flag because
their outputs are rows-only checkable (LSH banding is not
SQL-expressible). ``cut_spans=True`` additionally rewrites every
surviving doc with duplicated 64-char substring runs removed (the Lee
et al. 2022 intervention, itself an oracled operator — see
``doc_dedup_cut``) before splits are assigned.
"""

from __future__ import annotations


def clean_corpus(
    ds,
    *,
    min_quality: float = 0.51,
    max_dup_word_frac: float = 0.62,
    max_top_word_frac: float = 0.12,
    near_dup: bool = False,
    cut_spans: bool = False,
    cut_window: int = 64,
    cut_stride: int = 32,
):
    """documents Dataset → cleaned Dataset with a ``split`` column."""
    from ..ops.dedup import cut_duplicate_spans, exact_dedup, minhash_lsh_duplicates
    from ..ops.text import assign_splits, filter_quality, filter_repetition

    ds = filter_quality(ds, min_quality=min_quality)
    ds = filter_repetition(
        ds, max_dup_word_frac=max_dup_word_frac, max_top_word_frac=max_top_word_frac
    )
    ds = exact_dedup(ds)
    if cut_spans:
        # the cut pass consumes its input three times (two span scans +
        # the doc tag) — checkpoint the gated stream once, then rewrite;
        # the rewrite keeps only (doc_id, text), so re-attach the other
        # survivor columns via their doc_id (bucketed join, both sides
        # already partition-parallel)
        from ..ops.joins import hash_join_bucketed

        ds = ds.materialize()
        keep_cols = [c for c in ds.schema().names if c != "text"]
        cut = cut_duplicate_spans(
            ds, window=cut_window, stride=cut_stride
        )
        if keep_cols != ["doc_id"]:
            import pyarrow as pa

            side = ds.select_columns(keep_cols)
            ds = hash_join_bucketed(
                cut,
                side,
                left_on="doc_id",
                right_on="doc_id",
                right_cols=[c for c in keep_cols if c != "doc_id"],
                left_schema=pa.schema(
                    [
                        ("doc_id", ds.schema().base_schema.field("doc_id").type),
                        ("text", pa.string()),
                    ]
                ),
            )
        else:
            ds = cut
    if near_dup:
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray

        # the near-dup branch consumes the cleaned stream three times
        # (band rows, candidate-text fetch, final drop filter) —
        # checkpoint it once in the object store or the quality +
        # repetition + exact-dedup chain re-executes per consumer
        ds = ds.materialize()
        dups = minhash_lsh_duplicates(ds).materialize()
        if dups.count():
            tbls = [t for t in ray.get(dups.to_arrow_refs()) if t.num_rows]
            dup_ids = pa.concat_tables(tbls).column("doc_id").combine_chunks()
            ref = ray.put(dup_ids)

            def drop_dups(batch: pa.Table) -> pa.Table:
                ids = ray.get(ref)
                return batch.filter(
                    pc.invert(pc.is_in(batch.column("doc_id"), value_set=ids))
                )

            ds = ds.map_batches(drop_dups, batch_format="pyarrow", zero_copy_batch=True)
    return assign_splits(ds)
