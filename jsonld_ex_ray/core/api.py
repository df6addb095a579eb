"""Top-level JSON-LD processor API.

Mirrors the reference ``JsonLdProcessor`` surface (lib/json_ld.ex:98-320):
``expand``, ``compact``, ``flatten``, ``to_rdf``, ``from_rdf``. These are
pure per-document functions; the Ray pipeline calls them inside
``map_batches`` kernels (SURVEY.md §3.1 "engine shape").
"""

from __future__ import annotations

import json
from typing import Any

from .context import NOT_PRESENT, Context
from .errors import JsonLdError
from .expansion import expand_element
from .loader import RemoteDocument
from .options import JsonLdOptions, to_options


def _load_input(
    input_: Any, options: JsonLdOptions
) -> tuple[Any, str | None, str | None, str | None]:
    """Resolve input to (document, document_url, context_url,
    base_override). Strings are URLs (reference lib/json_ld.ex:103-111);
    base_override comes from an HTML ``<base href>`` and takes precedence
    over ``options.base`` (html suite #te020-#te022)."""
    if isinstance(input_, RemoteDocument):
        doc = input_.document
        if isinstance(doc, str):
            doc = json.loads(doc)
        return doc, input_.document_url, input_.context_url, None
    if isinstance(input_, str):
        loader = options.document_loader
        if loader is None:
            raise JsonLdError("loading document failed", f"no loader for {input_}")
        remote = loader.load(input_, options)
        doc = remote.document
        if remote.content_type in ("text/html", "application/xhtml+xml") and isinstance(doc, str):
            from .iri import resolve
            from .remote import extract_html_document, html_base_href

            fragment = input_.split("#", 1)[1] if "#" in input_ else None
            base_href = html_base_href(doc)
            doc = extract_html_document(doc, fragment, options.extract_all_scripts)
            base_override = None
            if base_href:
                effective = options.base or remote.document_url
                base_override = resolve(effective, base_href)
            return doc, remote.document_url, remote.context_url, base_override
        if isinstance(doc, str):
            try:
                doc = json.loads(doc)
            except ValueError as e:
                raise JsonLdError("loading document failed", str(e))
        return doc, remote.document_url, remote.context_url, None
    return input_, None, None, None


def _initial_context(options: JsonLdOptions, doc_url: str | None) -> Context:
    ctx = Context(options)
    ctx.original_base_url = doc_url
    if options.base is not None:
        ctx.base_iri = options.base
    elif doc_url is not None:
        ctx.base_iri = doc_url
    else:
        ctx.base_iri = NOT_PRESENT
    return ctx


def expand(input_: Any, options: JsonLdOptions | dict | None = None) -> list:
    """JSON-LD Expansion (reference lib/json_ld.ex:98-169)."""
    options = to_options(options)
    doc, doc_url, context_url, base_override = _load_input(input_, options)
    active = _initial_context(options, doc_url)
    if base_override is not None:
        active.base_iri = base_override

    if options.expand_context is not None:
        ec = options.expand_context
        if isinstance(ec, dict) and "@context" in ec:
            ec = ec["@context"]
        active = active.process(ec, None)

    # Link-header context (reference lib/json_ld.ex:151-162): applied
    # after expandContext, before the document's own contexts
    if context_url is not None:
        active = active.process(context_url, doc_url)

    expanded = expand_element(
        active, None, doc, doc_url, ordered=options.ordered
    )
    if isinstance(expanded, dict) and set(expanded) == {"@graph"}:
        expanded = expanded["@graph"]
    if expanded is None:
        return []
    return expanded if isinstance(expanded, list) else [expanded]


def flatten(
    input_: Any,
    context: Any = None,
    options: JsonLdOptions | dict | None = None,
) -> Any:
    """JSON-LD Flattening (reference lib/json_ld.ex:264-299)."""
    from .flattening import flatten_expanded

    options = to_options(options)
    doc, doc_url, context_url, base_override = _load_input(input_, options)
    if base_override is not None:
        options = options.with_(base=base_override)
    expanded = expand(
        RemoteDocument(document=doc, document_url=doc_url, context_url=context_url)
        if doc_url
        else doc,
        options.with_(ordered=False),
    )
    flattened = flatten_expanded(expanded, ordered=options.ordered)
    if context is not None:
        from .compaction import compact_top_level

        return compact_top_level(
            expand(flattened, options), context, options, doc_url, force_graph=True
        )
    return flattened


def compact(
    input_: Any,
    context: Any,
    options: JsonLdOptions | dict | None = None,
) -> dict:
    """JSON-LD Compaction (reference lib/json_ld.ex:189-245)."""
    from .compaction import compact_top_level

    options = to_options(options)
    doc, doc_url, context_url, base_override = _load_input(input_, options)
    if base_override is not None:
        options = options.with_(base=base_override)
    expanded = expand(
        RemoteDocument(document=doc, document_url=doc_url, context_url=context_url)
        if doc_url
        else doc,
        options,
    )
    return compact_top_level(expanded, context, options, doc_url)


def to_rdf(input_: Any, options: JsonLdOptions | dict | None = None) -> list:
    """Deserialize JSON-LD to RDF → list of quad tuples
    (subj, pred, obj_term, graph) — see to_rdf.py for term encoding.
    Reference lib/json_ld.ex:320 → lib/json/ld/decoder.ex."""
    from .flattening import node_map_generation
    from .rdf_generation import node_map_to_rdf

    options = to_options(options)
    try:
        doc, doc_url, context_url, base_override = _load_input(input_, options)
    except JsonLdError as e:
        # HTML with no ld+json scripts: expand errors (html #te006) but
        # toRdf yields an empty dataset (html #tr006)
        if e.code == "loading document failed" and "no ld+json script" in e.message:
            return []
        raise
    if base_override is not None:
        options = options.with_(base=base_override)
    expanded = expand(
        RemoteDocument(document=doc, document_url=doc_url, context_url=context_url)
        if doc_url
        else doc,
        options.with_(ordered=False),
    )
    node_map, issuer = node_map_generation(expanded)
    return node_map_to_rdf(node_map, issuer, options)


def from_rdf(quads: list, options: JsonLdOptions | dict | None = None) -> list:
    """Serialize RDF as JSON-LD (reference lib/json_ld.ex:310 → encoder.ex)."""
    from .rdf_serialization import serialize_rdf

    options = to_options(options)
    return serialize_rdf(quads, options)


def frame(
    input_: Any, frame_doc: Any, options: JsonLdOptions | dict | None = None
) -> dict:
    """JSON-LD 1.1 Framing (json-ld11-framing §3.2 frame()). The reference
    does not implement framing (its README lists it as a known gap) — this
    follows the W3C spec: expand input + frame, frame the merged node map,
    compact with the frame's context, unwrap @graph per ``omitGraph``."""
    from .compaction import compact_top_level
    from .framing import expand_frame, frame_expanded

    options = to_options(options)
    fdoc, fdoc_url, _fctx, _ = _load_input(frame_doc, options)
    if not isinstance(fdoc, (dict, list)):
        raise JsonLdError("invalid frame", f"frame must be an object: {type(fdoc)}")
    doc, doc_url, context_url, base_override = _load_input(input_, options)
    if base_override is not None:
        options = options.with_(base=base_override)
    expanded = expand(
        RemoteDocument(document=doc, document_url=doc_url, context_url=context_url)
        if doc_url
        else doc,
        options.with_(ordered=False),
    )
    expanded_frame = expand_frame(fdoc, options, fdoc_url or doc_url)
    framed = frame_expanded(expanded, expanded_frame, options)

    context = fdoc.get("@context") if isinstance(fdoc, dict) else None
    compacted = compact_top_level(
        framed, {"@context": context} if context is not None else {}, options, doc_url
    )
    from .framing import _replace_null_sentinel

    compacted = _replace_null_sentinel(compacted)
    omit_graph = options.omit_graph
    if expanded_frame and "@omitGraph" in expanded_frame[0]:
        omit_graph = bool(expanded_frame[0]["@omitGraph"])  # frame overrides
    if omit_graph is None:
        omit_graph = options.processing_mode != "json-ld-1.0"
    # compact_top_level wraps multiple nodes in (compacted) @graph already;
    # when omitGraph is False a single node must still be wrapped
    from .compaction import compact_iri as _compact_iri
    from .context import Context as _Ctx

    if not omit_graph:
        active = _Ctx(options)
        if context is not None:
            active = active.process(context, doc_url)
        graph_key = _compact_iri(active, "@graph", vocab=True)
        body = {k: v for k, v in compacted.items() if k != "@context"}
        if graph_key not in compacted:
            result = {graph_key: [body] if body else []}
            if context is not None:
                result["@context"] = context
            return result
    return compacted
