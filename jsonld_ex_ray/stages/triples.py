"""Triple-emission stage: payload rows → (subj, pred, obj) triple rows.

A stateful ``map_batches`` actor class (resolver + expand + node-map + toRdf
fused into one kernel per SURVEY.md §3.1 "engine shape"): the remote-context
loader cache is built ONCE per actor in ``__init__`` and reused across
batches; everything else is pure per-document CPU.

Blank-node determinism: the kernel relabels each document's ``_:b{n}`` to
``_:{doc_hash}-b{n}`` (doc_hash = sha1(doc_id)[:16]) — the URDNA2015-style
per-document canonicalization of the north rule executed WITHOUT a shuffle,
possible because extraction keeps one payload per row (SURVEY.md §2.3).
A shuffle-based equivalent lives in pipeline.canonicalize_bnodes for
multi-payload-namespace cases.
"""

from __future__ import annotations

import hashlib
import json

import pyarrow as pa

from ..core.context import is_well_formed_language  # noqa: F401 (re-export for kernels)
from ..core.api import expand
from ..core.errors import JsonLdError
from ..core.flatten import node_map_generation
from ..core.loader import CachingLoader, StaticLoader
from ..core.options import JsonLdOptions
from ..core.to_rdf import node_map_to_rdf
from ..gen import CONTEXT_REGISTRY

TRIPLE_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_kind", pa.string()),  # iri | bnode | literal
        ("obj_datatype", pa.string()),
        ("obj_lang", pa.string()),
        ("graph", pa.string()),
        ("doc_id", pa.string()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("content_sha256", pa.string()),
        ("error_code", pa.string()),
        ("error_message", pa.string()),
    ]
)

_META_COLS = ("doc_id", "repo", "path", "commit", "content_sha256")


def _doc_hash(doc_id: str) -> str:
    return hashlib.sha1(doc_id.encode("utf-8")).hexdigest()[:16]


def _term_str(term: tuple, doc_hash: str) -> str:
    if term[0] == "bnode":
        return f"_:{doc_hash}-{term[1]}"
    return term[1]


class JsonLdToTriples:
    """Actor-pool kernel: ``map_batches(JsonLdToTriples, concurrency=N)``.

    ``context_registry`` maps URL → document for the offline resolver; in
    production this would be an HTTP-backed loader behind the same
    ``DocumentLoader`` protocol (reference lib/json/ld/document_loader.ex).
    """

    def __init__(
        self,
        context_registry: dict | None = None,
        options: JsonLdOptions | None = None,
        cache_size: int = 4096,
    ):
        registry = CONTEXT_REGISTRY if context_registry is None else context_registry
        self.loader = CachingLoader(StaticLoader(registry), maxsize=cache_size)
        base = options or JsonLdOptions()
        self.options = base.with_(document_loader=self.loader)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {name: [] for name in TRIPLE_SCHEMA.names}
        metas = {c: batch.column(c).to_pylist() for c in _META_COLS}
        payloads = batch.column("payload").to_pylist()
        in_err_code = batch.column("error_code").to_pylist()
        in_err_msg = batch.column("error_message").to_pylist()

        for i, payload in enumerate(payloads):
            meta = {c: metas[c][i] for c in _META_COLS}
            if payload is None:  # pass extraction error rows through
                self._emit_error(out, meta, in_err_code[i], in_err_msg[i])
                continue
            try:
                doc = json.loads(payload)
                expanded = expand(doc, self.options)
                node_map, issuer = node_map_generation(expanded)
                quads = node_map_to_rdf(node_map, issuer, self.options)
            except JsonLdError as e:
                self._emit_error(out, meta, e.code, e.message[:500])
                continue
            except (ValueError, RecursionError) as e:
                self._emit_error(out, meta, "processing failed", str(e)[:500])
                continue
            dh = _doc_hash(meta["doc_id"])
            for s, p, o, g in quads:
                out["subj"].append(_term_str(s, dh))
                out["pred"].append(_term_str(p, dh))
                if o[0] == "lit":
                    out["obj"].append(o[1])
                    out["obj_kind"].append("literal")
                    out["obj_datatype"].append(o[2])
                    out["obj_lang"].append(o[3])
                else:
                    out["obj"].append(_term_str(o, dh))
                    out["obj_kind"].append(o[0])
                    out["obj_datatype"].append(None)
                    out["obj_lang"].append(None)
                out["graph"].append(_term_str(g, dh) if g is not None else None)
                for c in _META_COLS:
                    out[c].append(meta[c])
                out["error_code"].append(None)
                out["error_message"].append(None)
        return pa.Table.from_pydict(out, schema=TRIPLE_SCHEMA)

    @staticmethod
    def _emit_error(out: dict, meta: dict, code: str | None, msg: str | None) -> None:
        for name in ("subj", "pred", "obj", "obj_kind", "obj_datatype", "obj_lang", "graph"):
            out[name].append(None)
        for c in _META_COLS:
            out[c].append(meta[c])
        out["error_code"].append(code or "unknown")
        out["error_message"].append(msg or "")
