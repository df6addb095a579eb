"""Entity-linking stage: extracted node identifiers → canonical IRIs.

North-rule addition (not in the reference; SURVEY.md §2.3): a batched
mention-detect + link scorer. The canonical dictionary is broadcast ONCE
via ``ray.put`` and materialized per actor in ``__init__`` — never shipped
per batch. Linking itself is a vectorized dictionary lookup with a
deterministic normalization-based fallback scorer.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def build_canonical_dictionary(alias_to_iri: dict[str, str]):
    """``ray.put`` the small side once; returns the ObjectRef to hand to
    every ``EntityLinker`` actor (broadcast join, no shuffle)."""
    import ray

    return ray.put(alias_to_iri)


class EntityLinker:
    """``map_batches(EntityLinker, fn_constructor_kwargs={"dict_ref": ref},
    concurrency=N, batch_format="pyarrow")``.

    Adds ``subj_canon`` / ``obj_canon`` columns: the canonical IRI when the
    identifier (or its normalized form) is in the dictionary, else the
    original identifier. Literals pass through untouched.
    """

    def __init__(self, dict_ref=None, alias_to_iri: dict[str, str] | None = None):
        if alias_to_iri is not None:
            self.mapping = alias_to_iri
        elif dict_ref is not None:
            import ray

            self.mapping = ray.get(dict_ref)  # once per actor
        else:
            self.mapping = {}
        # normalized index for the fallback scorer (lowercase, no trailing /)
        self.norm_index = {self._norm(k): v for k, v in self.mapping.items()}

    @staticmethod
    def _norm(iri: str) -> str:
        return iri.lower().rstrip("/").replace("https://", "http://")

    def _link_one(self, value: str | None) -> str | None:
        if value is None:
            return None
        hit = self.mapping.get(value)
        if hit is not None:
            return hit
        return self.norm_index.get(self._norm(value), value)

    def __call__(self, batch: pa.Table) -> pa.Table:
        subjs = batch.column("subj").to_pylist()
        objs = batch.column("obj").to_pylist()
        kinds = batch.column("obj_kind").to_pylist()
        subj_canon = [self._link_one(s) for s in subjs]
        obj_canon = [
            self._link_one(o) if k == "iri" else o for o, k in zip(objs, kinds)
        ]
        batch = batch.append_column("subj_canon", pa.array(subj_canon, pa.string()))
        batch = batch.append_column("obj_canon", pa.array(obj_canon, pa.string()))
        return batch


def linked_fraction(batch: pa.Table) -> pa.Table:
    """Per-batch partial metric: how many identifiers were rewritten."""
    changed = pc.sum(
        pc.cast(pc.not_equal(batch.column("subj"), batch.column("subj_canon")), pa.int64())
    ).as_py() or 0
    return pa.table({"changed": [changed], "rows": [batch.num_rows]})
