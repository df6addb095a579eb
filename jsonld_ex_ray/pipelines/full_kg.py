"""The complete north-star KG-construction run, chained end-to-end:

    read(source repos) → extract → expand/node-map/toRdf (+ entity link)
      → URDNA2015 canonicalize (groupby doc)        [shuffle 1]
      → exact dedup (bucketed hash)                 [shuffle 2]
      → write triples (partitioned parquet)
      → graph materialize (salted, two-phase)       [shuffle 3+4, on the
        deduped triples read back from the partitioned output]
      → write adjacency + mentions + metrics

Each output lands under its own directory so a rerun can skip finished
sections; the triple write is the checkpoint boundary (everything after
reads back from parquet instead of recomputing).
"""

from __future__ import annotations

import json
import os
import time


def full_kg_run(
    source,
    out_dir: str,
    *,
    linker_dict: dict | None = None,
    mention_names: dict | None = None,
    concurrency=(2, 8),
    override_num_blocks: int | None = None,
) -> dict:
    import ray

    from ..pipeline import (
        build_triples,
        canonicalize_bnodes,
        dedup_triples,
        materialize_graph,
        triples_only,
    )
    from ..stages.linker import detect_and_link_mentions

    os.makedirs(out_dir, exist_ok=True)
    metrics: dict = {}
    t0 = time.monotonic()

    linker_ref = ray.put(linker_dict) if linker_dict else None
    triples = build_triples(
        source,
        concurrency=concurrency,
        linker_dict_ref=linker_ref,
        override_num_blocks=override_num_blocks,
    )

    # persist the raw emission (triples + error records) ONCE — the
    # checkpoint boundary; every wide stage reads back from parquet so the
    # expensive extract/expand pass runs exactly once
    import ray.data

    raw_dir = os.path.join(out_dir, "raw")
    triples.write_parquet(raw_dir)
    metrics["emit_wall_s"] = round(time.monotonic() - t0, 2)
    raw = ray.data.read_parquet(raw_dir)

    t1 = time.monotonic()
    deduped = dedup_triples(canonicalize_bnodes(raw))
    triples_dir = os.path.join(out_dir, "triples")
    deduped.write_parquet(triples_dir)
    metrics["canonicalize_dedup_wall_s"] = round(time.monotonic() - t1, 2)

    persisted = ray.data.read_parquet(triples_dir)
    metrics["n_triples"] = persisted.count()
    import pyarrow.dataset as pads

    metrics["n_errors"] = pads.dataset(raw_dir).count_rows(
        filter=pads.field("pred").is_null()
    )

    # adjacency materialize over the persisted triples
    t2 = time.monotonic()
    adjacency = materialize_graph(persisted)
    adjacency.write_parquet(os.path.join(out_dir, "adjacency"))
    metrics["materialize_wall_s"] = round(time.monotonic() - t2, 2)

    # scored mention links (side output)
    if mention_names:
        t3 = time.monotonic()
        mentions = detect_and_link_mentions(
            triples_only(persisted), ray.put(mention_names), concurrency=concurrency
        )
        mentions.write_parquet(os.path.join(out_dir, "mentions"))
        metrics["mentions_wall_s"] = round(time.monotonic() - t3, 2)

    metrics["total_wall_s"] = round(time.monotonic() - t0, 2)
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f)
    return metrics
