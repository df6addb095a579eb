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
SQL-expressible).
"""

from __future__ import annotations


def clean_corpus(
    ds,
    *,
    min_quality: float = 0.51,
    max_dup_word_frac: float = 0.62,
    max_top_word_frac: float = 0.12,
    near_dup: bool = False,
):
    """documents Dataset → cleaned Dataset with a ``split`` column."""
    from ..ops.dedup import exact_dedup, minhash_lsh_duplicates
    from ..ops.text import assign_splits, filter_quality, filter_repetition

    ds = filter_quality(ds, min_quality=min_quality)
    ds = filter_repetition(
        ds, max_dup_word_frac=max_dup_word_frac, max_top_word_frac=max_top_word_frac
    )
    ds = exact_dedup(ds)
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
