"""File sources/sinks: the engine's equivalent of the reference's
``RDF.Serialization.Format`` integration (``JSON.LD.read_file!`` /
``write_file!``, reference lib/json_ld.ex:10, README.md:115-133).

- ``read_jsonld_files``: directory/glob of ``.jsonld``/``.json``/``.html``
  files → triple Dataset (ray.data.read_binary_files → the same extraction
  + triple kernels as the parquet pipeline; one row per file).
- ``write_nquads``: triple Dataset → partitioned ``.nq`` text shards via a
  Ray datasink (streaming, one file per block — never one giant file).
- ``read_jsonl_docs`` / ``write_jsonl``: NDJSON corpora ↔ the documents
  table shape the text/dedup ops consume — the most common raw
  training-corpus interchange format.
"""

from __future__ import annotations

import pyarrow as pa


def read_jsonld_files(paths, **build_kwargs):
    """Read raw JSON-LD / HTML / JSON files into the triple pipeline.

    ``paths``: file, directory, or list accepted by
    ``ray.data.read_binary_files``. Extraction + expansion semantics are
    identical to the parquet-corpus path (extract.py kernels).
    """
    import ray.data

    from ..pipeline import build_triples

    ds = ray.data.read_binary_files(paths, include_paths=True)

    def to_repo_rows(batch: pa.Table) -> pa.Table:
        paths_col = batch.column("path").to_pylist()
        bodies = batch.column("bytes").to_pylist()
        contents, langs = [], []
        for body in bodies:
            try:
                contents.append(body.decode("utf-8"))
            except UnicodeDecodeError:
                # null → the extraction stage emits a 'missing content'
                # ERROR row (a silent '' made undecodable files vanish)
                contents.append(None)
        for p in paths_col:
            ext = p.rsplit(".", 1)[-1].lower() if "." in p else ""
            langs.append({"jsonld": "jsonld", "json": "json", "html": "html", "md": "markdown"}.get(ext, "text"))
        return pa.table(
            {
                "repo": pa.array(["local"] * len(paths_col), pa.string()),
                "path": pa.array(paths_col, pa.string()),
                "commit": pa.array(["-"] * len(paths_col), pa.string()),
                "lang": pa.array(langs, pa.string()),
                "content": pa.array(contents, pa.string()),
            }
        )

    repo_rows = ds.map_batches(to_repo_rows, batch_format="pyarrow", zero_copy_batch=True)
    return build_triples(repo_rows, **build_kwargs)


def read_nquads(paths, *, scope_bnodes_per_file: bool = False):
    """N-Quads text shards → triple Dataset (subj, pred, obj, obj_kind,
    obj_datatype, obj_lang, graph) — the inverse of ``write_nquads`` and
    the ingest path for external RDF dumps. Parsing is per-line and
    embarrassingly parallel: ``ray.data.read_text`` splits shards into
    blocks and each batch parses independently.

    Blank-node scoping: N-Quads labels are DOCUMENT-scoped, so two
    independent dumps both using ``_:b0`` name two different nodes. Pass
    ``scope_bnodes_per_file=True`` when ingesting unrelated files — every
    label is prefixed with a hash of its source path. The default keeps
    labels as-is because ``write_nquads`` shards ONE dataset across many
    files with dataset-scoped labels (a bnode may span shards); per-file
    scoping would wrongly split such nodes."""
    import hashlib

    import ray.data

    from ..core.nquads import parse_nquads
    from ..core.rdf_generation import XSD_STRING

    ds = ray.data.read_text(paths, include_paths=scope_bnodes_per_file)

    def parse(batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("subj", "pred", "obj", "obj_kind", "obj_datatype", "obj_lang", "graph")}
        if scope_bnodes_per_file:
            src_paths = batch.column("path").to_pylist()
            scopes = [hashlib.md5(p.encode()).hexdigest()[:8] + "-" for p in src_paths]
        else:
            scopes = [""] * batch.num_rows
        bad = 0
        for line, scope in zip(batch.column("text").to_pylist(), scopes):
            try:
                parsed = parse_nquads(line)
            except ValueError:
                bad += 1  # strict parser: malformed lines raise; ingest
                continue  # skips them LOUDLY (logged below), never dies
            for s, p, o, g in parsed:
                out["subj"].append(f"_:{scope}{s[1]}" if s[0] == "bnode" else s[1])
                out["pred"].append(p[1])
                if o[0] == "lit":
                    out["obj"].append(o[1])
                    out["obj_kind"].append("literal")
                    out["obj_datatype"].append(o[2] or XSD_STRING)
                    out["obj_lang"].append(o[3])
                else:
                    out["obj"].append(f"_:{scope}{o[1]}" if o[0] == "bnode" else o[1])
                    out["obj_kind"].append(o[0])
                    out["obj_datatype"].append(None)
                    out["obj_lang"].append(None)
                if g is None:
                    out["graph"].append(None)
                else:
                    out["graph"].append(f"_:{scope}{g[1]}" if g[0] == "bnode" else g[1])
        if bad:
            import logging

            logging.getLogger(__name__).warning(
                "read_nquads: skipped %d malformed line(s) in this batch", bad
            )
        return pa.table(
            {
                "subj": pa.array(out["subj"], pa.string()),
                "pred": pa.array(out["pred"], pa.string()),
                "obj": pa.array(out["obj"], pa.string()),
                "obj_kind": pa.array(out["obj_kind"], pa.string()),
                "obj_datatype": pa.array(out["obj_datatype"], pa.string()),
                "obj_lang": pa.array(out["obj_lang"], pa.string()),
                "graph": pa.array(out["graph"], pa.string()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)


def _term_to_nq(value: str | None, kind: str | None, datatype: str | None, lang: str | None) -> str:
    from ..core.nquads import term_to_nquads
    from ..core.rdf_generation import XSD_STRING

    if value is None:
        return ""
    if kind == "literal":
        return term_to_nquads(("lit", value, datatype or XSD_STRING, lang))
    if value.startswith("_:"):
        return term_to_nquads(("bnode", value[2:]))
    return term_to_nquads(("iri", value))


def triples_to_nquads_lines(batch: pa.Table) -> pa.Table:
    """Vectorize triple rows → N-Quads lines (reusable map_batches kernel)."""
    subs = batch.column("subj").to_pylist()
    preds = batch.column("pred").to_pylist()
    objs = batch.column("obj").to_pylist()
    kinds = batch.column("obj_kind").to_pylist()
    dts = batch.column("obj_datatype").to_pylist()
    langs = batch.column("obj_lang").to_pylist()
    graphs = batch.column("graph").to_pylist()
    lines = []
    for s, p, o, k, dt, lg, g in zip(subs, preds, objs, kinds, dts, langs, graphs):
        if s is None or p is None:
            continue  # error record
        parts = [
            _term_to_nq(s, None, None, None),
            _term_to_nq(p, None, None, None),
            _term_to_nq(o, k, dt, lg),
        ]
        if g is not None:
            parts.append(_term_to_nq(g, None, None, None))
        lines.append(" ".join(parts) + " .")
    return pa.table({"line": pa.array(lines, pa.string())})


def write_nquads(ds, out_dir: str) -> None:
    """Write a triple Dataset as partitioned N-Quads text shards."""
    from ray.data.datasource import BlockBasedFileDatasink

    class NQuadsSink(BlockBasedFileDatasink):
        def __init__(self, path: str):
            super().__init__(path, file_format="nq")

        def write_block_to_file(self, block, file) -> None:
            tbl = block.to_arrow() if hasattr(block, "to_arrow") else block
            text = "\n".join(tbl.column("line").to_pylist())
            if text:
                text += "\n"
            file.write(text.encode("utf-8"))

    lines = ds.map_batches(
        triples_to_nquads_lines, batch_format="pyarrow", zero_copy_batch=True
    )
    lines.write_datasink(NQuadsSink(out_dir))


def _docs_normalizer(text_field: str, id_field: str | None, keep: list[str]):
    """Shared map_batches kernel normalizing any tabular read to the
    documents-table shape: ``(doc_id:string, text:string, *keep)``, with
    ``doc_id = md5(text)`` (the exact-dedup identity, vectorized DuckDB
    kernel) when the corpus carries no id field; an ``error_code``
    column passes through when the tolerant parser produced one."""
    import pyarrow.compute as pc

    from jsonld_ex_ray.ops.hashing import md5_hex

    def normalize(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column(text_field), pa.string())
        if id_field is not None:
            doc_id = pc.cast(batch.column(id_field), pa.string())
        else:
            doc_id = md5_hex(text, null_as="")
        cols = {"doc_id": doc_id, "text": text}
        for f in keep:
            cols[f] = batch.column(f)
        if "error_code" in batch.schema.names:
            cols["error_code"] = batch.column("error_code")
        return pa.table(cols)

    return normalize


def read_csv_docs(
    paths,
    *,
    text_field: str = "text",
    id_field: str | None = None,
    keep_fields: list[str] | None = None,
    **read_csv_kwargs,
):
    """CSV/TSV corpus → documents Dataset, same contract as
    ``read_jsonl_docs`` strict mode: ``ray.data.read_csv`` (pyarrow's
    C++ CSV reader — vectorized, transparent ``.gz``), normalized to
    ``(doc_id:string, text:string, *keep_fields)`` with md5(text) ids
    when the corpus carries none. Extra kwargs pass through to
    ``read_csv`` (e.g. ``parse_options`` for TSV delimiters)."""
    import ray.data

    normalize = _docs_normalizer(text_field, id_field, list(keep_fields or []))
    ds = ray.data.read_csv(paths, **read_csv_kwargs)
    return ds.map_batches(normalize, batch_format="pyarrow", zero_copy_batch=True)


def read_jsonl_docs(
    paths,
    *,
    text_field: str = "text",
    id_field: str | None = None,
    keep_fields: list[str] | None = None,
    strict: bool = True,
):
    """NDJSON (.jsonl) corpus → documents Dataset with the schema the
    text/dedup ops consume: ``(doc_id:string, text:string,
    *keep_fields)``.

    ``strict=True`` (the scale path): ``ray.data.read_json`` — pyarrow's
    C++ NDJSON reader, vectorized, no per-line Python; ``.jsonl.gz``
    decompresses transparently (arrow infers the codec from the
    extension); a malformed line fails its file loudly. ``strict=False`` (the ingest-from-the-wild
    path): ``read_text`` + per-line stdlib parse inside ``map_batches``,
    malformed lines (bad JSON, non-objects, blank lines) become rows
    with ``error_code='invalid json'`` and the raw line preserved in
    ``text`` instead of poisoning the file — per-row Python, priced in
    and documented, for corpora where a read must not die on one bad
    line. Schema divergence, deliberate: the strict path keeps
    ``keep_fields`` in their native arrow types; the tolerant path
    returns every kept value as a STRING (non-string scalars and nested
    values keep their JSON text) so one weird line can't flip a
    column's type mid-read.

    ``id_field=None`` derives ``doc_id`` as ``md5(text)`` via the
    vectorized DuckDB kernel — byte-identical docs share an id, the
    exact-dedup identity; pass a real field when the corpus carries one."""
    import ray.data

    keep = list(keep_fields or [])
    normalize = _docs_normalizer(text_field, id_field, keep)

    if strict:
        ds = ray.data.read_json(paths)
        return ds.map_batches(normalize, batch_format="pyarrow", zero_copy_batch=True)

    # drop_empty_lines=False: a blank line is a MALFORMED line and must
    # surface as an error row, not silently vanish (row count parity
    # with `wc -l` is what makes triage against the source file sane)
    ds = ray.data.read_text(paths, drop_empty_lines=False)

    def parse_lines(batch: pa.Table) -> pa.Table:
        import json

        fields = [text_field] + ([id_field] if id_field else []) + keep
        out: dict[str, list] = {f: [] for f in fields}
        errs: list[str | None] = []
        for line in batch.column("text").to_pylist():
            try:
                obj = json.loads(line)
                if not isinstance(obj, dict):
                    raise ValueError("not an object")
            except (ValueError, TypeError):
                for f in fields:
                    # preserve the raw line for triage instead of dropping it
                    out[f].append(line if f == text_field else None)
                errs.append("invalid json")
                continue
            for f in fields:
                v = obj.get(f)
                # schema stability under wild data: every kept value is a
                # STRING here — str scalars pass through, everything else
                # (numbers, bools, nested objects/arrays) keeps its JSON
                # text. The strict path keeps native arrow types; this
                # divergence is deliberate and documented above.
                out[f].append(
                    v if v is None or isinstance(v, str) else json.dumps(v)
                )
            errs.append(None)
        t = pa.table(
            {f: pa.array(out[f], pa.string()) for f in fields}
            | {"error_code": pa.array(errs, pa.string())}
        )
        return normalize(t)

    return ds.map_batches(parse_lines, batch_format="pyarrow", zero_copy_batch=True)


def write_jsonl(ds, out_dir: str, *, fields: list[str] | None = None) -> None:
    """Write a Dataset as partitioned ``.jsonl`` shards (one file per
    block — streaming, resumable layout, never one giant file; the
    interchange inverse of ``read_jsonl_docs``). ``fields`` selects and
    orders the emitted keys (default: every column, schema order)."""
    from ray.data.datasource import BlockBasedFileDatasink

    class JsonlSink(BlockBasedFileDatasink):
        def __init__(self, path: str):
            super().__init__(path, file_format="jsonl")

        def write_block_to_file(self, block, file) -> None:
            import json
            import math

            def jsonable(v):
                # NaN/Inf would emit bare literals the strict reader
                # (pyarrow C++ NDJSON) rejects → JSON null instead —
                # RECURSIVELY (list<float> embedding columns carry NaNs
                # too); non-JSON types (timestamps, bytes, decimals)
                # fall back to str() so a sink task never dies on a
                # column type
                if isinstance(v, float) and not math.isfinite(v):
                    return None
                if isinstance(v, list):
                    return [jsonable(x) for x in v]
                if isinstance(v, dict):
                    return {k: jsonable(x) for k, x in v.items()}
                return v

            tbl = block.to_arrow() if hasattr(block, "to_arrow") else block
            if fields:
                tbl = tbl.select(fields)
            names = tbl.schema.names
            cols = [tbl.column(n).to_pylist() for n in names]
            lines = [
                json.dumps(
                    {n: jsonable(v) for n, v in zip(names, row)},
                    ensure_ascii=False,
                    default=str,
                )
                for row in zip(*cols)
            ]
            text = "\n".join(lines)
            if text:
                text += "\n"
            file.write(text.encode("utf-8"))

    ds.write_datasink(JsonlSink(out_dir))
