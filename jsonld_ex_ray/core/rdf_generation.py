"""Deserialize JSON-LD to RDF (API §8; reference lib/json/ld/decoder.ex).

RDF terms are plain tuples so they cross Arrow/pickle boundaries cheaply:

- ``("iri", value)``
- ``("bnode", label)``              # label WITHOUT the "_:" prefix
- ``("lit", lexical, datatype_iri, lang_or_None)``

Quads are ``(subj, pred, obj, graph_or_None)`` tuples of terms. The engine's
triple *table* schema flattens these into string columns (pipeline layer).

Canonical lexical forms (xsd:boolean/integer/double incl. the
``value != trunc(value) or value >= 1.0e21`` double rule) mirror reference
decoder.ex:179-222; rdf:JSON canonicalization (JCS) decoder.ex:169-176;
i18n/compound-literal direction encodings decoder.ex:229-258.
"""

from __future__ import annotations

import math
from typing import Any

from .errors import JsonLdError
from .flattening import BlankNodeIssuer
from .iri import is_absolute_iri, is_blank_node_id, is_keyword
from .options import JsonLdOptions

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = RDF + "type"
RDF_FIRST = RDF + "first"
RDF_REST = RDF + "rest"
RDF_NIL = RDF + "nil"
_RDF_TYPE_TERM = ("iri", RDF_TYPE)
_RDF_FIRST_TERM = ("iri", RDF_FIRST)
_RDF_REST_TERM = ("iri", RDF_REST)
_RDF_NIL_TERM = ("iri", RDF_NIL)
RDF_JSON = RDF + "JSON"
RDF_LANGSTRING = RDF + "langString"
RDF_VALUE = RDF + "value"
RDF_LANGUAGE = RDF + "language"
RDF_DIRECTION = RDF + "direction"
XSD_STRING = XSD + "string"
XSD_BOOLEAN = XSD + "boolean"
XSD_INTEGER = XSD + "integer"
XSD_DOUBLE = XSD + "double"
I18N = "https://www.w3.org/ns/i18n#"

Term = tuple
Quad = tuple  # (subj, pred, obj, graph|None)


_TERM_CACHE: dict[str, "Term | None | bool"] = {}


def _iri_or_bnode(value: str) -> Term | None:
    """Well-formedness gate: ill-formed identifiers are silently dropped
    (reference decoder.ex:49-51, 59-61, 86-87, 225-226). Memoized —
    subjects/predicates/types repeat massively across a corpus, and the
    returned tuples are immutable so sharing them is safe."""
    hit = _TERM_CACHE.get(value, False)
    if hit is not False:
        return hit
    if is_blank_node_id(value):
        term: Term | None = ("bnode", value[2:])
    elif is_absolute_iri(value):
        term = ("iri", value)
    else:
        term = None
    if len(_TERM_CACHE) > 65536:
        _TERM_CACHE.clear()
    _TERM_CACHE[value] = term
    return term


def canonical_double(value: float) -> str:
    """XSD canonical double lexical (reference decoder.ex:190-211)."""
    if math.isnan(value):
        return "NaN"
    if math.isinf(value):
        return "INF" if value > 0 else "-INF"
    mantissa, _, exponent = f"{value:.15E}".partition("E")
    mantissa = mantissa.rstrip("0")
    if mantissa.endswith("."):
        mantissa += "0"
    exp = int(exponent)
    # renormalize if mantissa rounded to e.g. "10." (can't happen with .15E)
    return f"{mantissa}E{exp}"


def canonical_integer(value: Any) -> str:
    return str(int(value))


def jcs_canonicalize(value: Any) -> str:
    """RFC 8785 (JCS) canonical JSON for rdf:JSON literals
    (reference decoder.ex:169-176 via RDF.JSON)."""
    out: list[str] = []
    _jcs(value, out)
    return "".join(out)


def _jcs(v: Any, out: list[str]) -> None:
    if v is None:
        out.append("null")
    elif v is True:
        out.append("true")
    elif v is False:
        out.append("false")
    elif isinstance(v, str):
        import json as _json

        out.append(_json.dumps(v, ensure_ascii=False))
    elif isinstance(v, int):
        out.append(str(v))
    elif isinstance(v, float):
        out.append(_ecma_number(v))
    elif isinstance(v, list):
        out.append("[")
        for i, item in enumerate(v):
            if i:
                out.append(",")
            _jcs(item, out)
        out.append("]")
    elif isinstance(v, dict):
        out.append("{")
        # JCS sorts keys by UTF-16 code units
        keys = sorted(v.keys(), key=lambda s: [ord(c) for c in s])
        for i, k in enumerate(keys):
            if i:
                out.append(",")
            _jcs(k, out)
            out.append(":")
            _jcs(v[k], out)
        out.append("}")
    else:
        raise JsonLdError("invalid JSON literal", repr(v))


def _ecma_number(value: float) -> str:
    """ECMAScript Number::toString (used by JCS for doubles)."""
    if value != value or math.isinf(value):
        raise JsonLdError("invalid JSON literal", repr(value))
    if value == int(value) and abs(value) < 1e21:
        return str(int(value))
    r = repr(value)
    if "e" in r:
        mant, _, exp = r.partition("e")
        iexp = int(exp)
        if mant.endswith(".0"):
            mant = mant[:-2]
        return f"{mant}e{'+' if iexp >= 0 else '-'}{abs(iexp)}"
    return r


def object_to_rdf(
    item: dict,
    quads: list[Quad],
    graph: Term | None,
    issuer: BlankNodeIssuer,
    options: JsonLdOptions,
) -> Term | None:
    """Object to RDF Conversion (§8.5; reference decoder.ex:142-272)."""
    if isinstance(item, dict) and "@id" in item and "@value" not in item and "@list" not in item:
        return _iri_or_bnode(item["@id"])
    if isinstance(item, dict) and "@list" in item:
        return list_to_rdf(item["@list"], quads, graph, issuer, options)

    value = item["@value"]
    datatype = item.get("@type")
    language = item.get("@language")
    direction = item.get("@direction")

    if datatype == "@json":
        value = jcs_canonicalize(value)
        datatype = RDF_JSON
    elif isinstance(value, bool):
        value = "true" if value else "false"
        if datatype is None:
            datatype = XSD_BOOLEAN
        else:
            value = str(value)  # unreachable normalization
    elif isinstance(value, (int, float)) and (
        isinstance(value, float) or datatype == XSD_DOUBLE
    ):
        if (
            (isinstance(value, float) and (value != math.trunc(value) or math.isinf(value) or math.isnan(value)))
            or abs(float(value)) >= 1.0e21
            or datatype == XSD_DOUBLE
        ):
            value = canonical_double(float(value))
            if datatype is None:
                datatype = XSD_DOUBLE
        else:
            value = canonical_integer(value)
            if datatype is None:
                datatype = XSD_INTEGER
    elif isinstance(value, int):
        value = canonical_integer(value)
        if datatype is None:
            datatype = XSD_INTEGER
    elif datatype is None:
        if language is not None:
            datatype = RDF_LANGSTRING
        else:
            datatype = XSD_STRING

    if not isinstance(value, str):
        value = str(value)

    if direction is not None and options.rdf_direction == "i18n-datatype":
        datatype = f"{I18N}{(language or '').lower()}_{direction}"
        return ("lit", value, datatype, None)
    if direction is not None and options.rdf_direction == "compound-literal":
        bnode = ("bnode", issuer.issue()[2:])
        quads.append((bnode, ("iri", RDF_VALUE), ("lit", value, XSD_STRING, None), graph))
        if language is not None:
            quads.append(
                (bnode, ("iri", RDF_LANGUAGE), ("lit", language.lower(), XSD_STRING, None), graph)
            )
        quads.append(
            (bnode, ("iri", RDF_DIRECTION), ("lit", direction, XSD_STRING, None), graph)
        )
        return bnode

    if language is not None:
        from .context import is_well_formed_language

        if not is_well_formed_language(language):
            # ill-formed language-tagged literals are rejected with a
            # warning (toRdf #twf05)
            options.emit_warning(f"@language must be valid BCP47: {language!r}")
            return None
        if datatype is None:
            datatype = RDF_LANGSTRING
        return ("lit", value, datatype, language)
    return ("lit", value, datatype, None)


def list_to_rdf(
    items: list,
    quads: list[Quad],
    graph: Term | None,
    issuer: BlankNodeIssuer,
    options: JsonLdOptions,
) -> Term:
    """List to RDF Conversion (§8.6; reference decoder.ex:275-297)."""
    if not items:
        return ("iri", RDF_NIL)
    bnodes = [("bnode", issuer.issue()[2:]) for _ in items]
    for i, item in enumerate(items):
        subject = bnodes[i]
        obj = object_to_rdf(item, quads, graph, issuer, options)
        if obj is not None:
            quads.append((subject, _RDF_FIRST_TERM, obj, graph))
        rest: Term = bnodes[i + 1] if i + 1 < len(bnodes) else _RDF_NIL_TERM
        quads.append((subject, _RDF_REST_TERM, rest, graph))
    return bnodes[0]


def node_map_to_rdf(
    node_map: dict, issuer: BlankNodeIssuer, options: JsonLdOptions
) -> list[Quad]:
    """§8.4 Deserialize JSON-LD to RDF (reference decoder.ex:44-115).

    Graph/subject/property iteration is sorted ALWAYS, matching the
    reference's deterministic output (decoder.ex:46,56,64)."""
    quads: list[Quad] = []
    for graph_name in sorted(node_map.keys()):
        if graph_name == "@default":
            graph_term: Term | None = None
        else:
            graph_term = _iri_or_bnode(graph_name)
            if graph_term is None:
                continue
        graph = node_map[graph_name]
        for subject in sorted(graph.keys()):
            subj_term = _iri_or_bnode(subject)
            if subj_term is None:
                continue
            node = graph[subject]
            for prop in sorted(node.keys()):
                values = node[prop]
                if prop == "@type":
                    for t in values:
                        t_term = _iri_or_bnode(t)
                        if t_term is not None:
                            quads.append((subj_term, _RDF_TYPE_TERM, t_term, graph_term))
                    continue
                if is_keyword(prop):
                    continue
                if is_blank_node_id(prop) and not options.produce_generalized_rdf:
                    continue
                pred_term = _iri_or_bnode(prop)
                if pred_term is None:
                    # an "iri" result already implies is_absolute_iri(prop)
                    continue
                for item in values:
                    obj_term = object_to_rdf(item, quads, graph_term, issuer, options)
                    if obj_term is not None:
                        quads.append((subj_term, pred_term, obj_term, graph_term))
    # set semantics: RDF.Graph.add collapses duplicates (decoder.ex:98-99)
    seen = set()
    out = []
    for q in quads:
        if q not in seen:
            seen.add(q)
            out.append(q)
    return out
