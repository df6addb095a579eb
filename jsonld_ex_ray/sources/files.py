"""File sources/sinks: the engine's equivalent of the reference's
``RDF.Serialization.Format`` integration (``JSON.LD.read_file!`` /
``write_file!``, reference lib/json_ld.ex:10, README.md:115-133).

- ``read_jsonld_files``: directory/glob of ``.jsonld``/``.json``/``.html``
  files → triple Dataset (ray.data.read_binary_files → the same extraction
  + triple kernels as the parquet pipeline; one row per file).
- ``write_nquads``: triple Dataset → partitioned ``.nq`` text shards via a
  Ray datasink (streaming, one file per block — never one giant file).
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
                contents.append("")
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
