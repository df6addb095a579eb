"""Node Map Generation + Flattening (JSON-LD 1.1 §7; reference
lib/json/ld/flattening.ex:12-372).

The reference uses a per-call GenServer for the blank-node identifier map
(lib/json/ld/node_identifier_map.ex) and Agent processes for @list
accumulators (flattening.ex:389-409). Here both are plain doc-local Python
state (``BlankNodeIssuer`` / lists): state scope is one document, so no
actors are needed — the pipeline relabels ``_:b{n}`` → ``_:{doc_id}-b{n}``
before any cross-document union (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Any

from .errors import JsonLdError
from .iri import is_blank_node_id


class BlankNodeIssuer:
    """Deterministic `_:b<n>` issuer (reference node_identifier_map.ex:41)."""

    def __init__(self, prefix: str = "b"):
        self.prefix = prefix
        self.counter = 0
        self.issued: dict[str, str] = {}

    def issue(self, identifier: str | None = None) -> str:
        if identifier is not None and identifier in self.issued:
            return self.issued[identifier]
        bnode = f"_:{self.prefix}{self.counter}"
        self.counter += 1
        if identifier is not None:
            self.issued[identifier] = bnode
        return bnode


def strict_equal(a: Any, b: Any) -> bool:
    """Deep equality that does NOT collapse bool with 0/1 (Python's
    ``True == 1`` would merge distinct JSON-LD values; cf. toRdf #te061)."""
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) == set(b) and all(strict_equal(a[k], b[k]) for k in a)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(strict_equal(x, y) for x, y in zip(a, b))
    return a == b


def _deep_in(item: Any, values: list) -> bool:
    return any(strict_equal(item, v) for v in values)


def node_map_generation(
    element: Any,
    node_map: dict | None = None,
    active_graph: str = "@default",
    active_subject: Any = None,
    active_property: str | None = None,
    list_: dict | None = None,
    issuer: BlankNodeIssuer | None = None,
) -> tuple[dict, BlankNodeIssuer]:
    """Fold expanded JSON-LD into ``graph → id → node`` (spec §7 step table;
    reference flattening.ex:87-372 incl. value dedup at 163, 245, 258-259)."""
    if node_map is None:
        node_map = {"@default": {}}
    if issuer is None:
        issuer = BlankNodeIssuer()
    _generate(element, node_map, active_graph, active_subject, active_property, list_, issuer)
    return node_map, issuer


def _generate(
    element: Any,
    node_map: dict,
    active_graph: str,
    active_subject: Any,
    active_property: str | None,
    list_: dict | None,
    issuer: BlankNodeIssuer,
) -> None:
    # 1. arrays
    if isinstance(element, list):
        for item in element:
            _generate(item, node_map, active_graph, active_subject, active_property, list_, issuer)
        return

    graph = node_map.setdefault(active_graph, {})
    subject_node = (
        graph.get(active_subject) if isinstance(active_subject, str) else None
    )

    # 3. rename blank-node types (value objects keep @type as a string)
    if isinstance(element, dict) and "@type" in element:
        t = element["@type"]
        if isinstance(t, list):
            element["@type"] = [
                issuer.issue(x) if is_blank_node_id(x) else x for x in t
            ]
        elif is_blank_node_id(t):
            element["@type"] = issuer.issue(t)

    # 4. value object
    if isinstance(element, dict) and "@value" in element:
        if list_ is None:
            if subject_node is not None and active_property is not None:
                values = subject_node.setdefault(active_property, [])
                if not _deep_in(element, values):
                    values.append(element)
        else:
            list_["@list"].append(element)
        return

    # 5. list object
    if isinstance(element, dict) and "@list" in element:
        result: dict = {"@list": []}
        _generate(element["@list"], node_map, active_graph, active_subject, active_property, result, issuer)
        if list_ is None:
            if subject_node is not None and active_property is not None:
                subject_node.setdefault(active_property, []).append(result)
        else:
            list_["@list"].append(result)
        return

    if not isinstance(element, dict):
        return

    # 6. node object
    if "@id" in element:
        id_ = element.pop("@id")
        if id_ is None:
            return
        if is_blank_node_id(id_):
            id_ = issuer.issue(id_)
    else:
        id_ = issuer.issue()

    node = graph.setdefault(id_, {"@id": id_})

    # 6.5 reverse: active_subject is a reference map
    if isinstance(active_subject, dict):
        values = node.setdefault(active_property, [])
        if not _deep_in(active_subject, values):
            values.append(active_subject)
    elif active_property is not None:
        reference = {"@id": id_}
        if list_ is None:
            if subject_node is not None:
                values = subject_node.setdefault(active_property, [])
                if not _deep_in(reference, values):
                    values.append(reference)
        else:
            list_["@list"].append(reference)

    # 6.7 merge @type
    if "@type" in element:
        existing = node.setdefault("@type", [])
        for t in element.pop("@type"):
            if t not in existing:
                existing.append(t)

    # 6.8 @index conflict
    if "@index" in element:
        idx = element.pop("@index")
        if "@index" in node and node["@index"] != idx:
            raise JsonLdError("conflicting indexes", id_)
        node["@index"] = idx

    # 6.9 @reverse
    if "@reverse" in element:
        referenced = {"@id": id_}
        reverse_map = element.pop("@reverse")
        for prop, values in reverse_map.items():
            for value in values:
                _generate(value, node_map, active_graph, referenced, prop, None, issuer)

    # 6.10 @graph
    if "@graph" in element:
        _generate(element.pop("@graph"), node_map, id_, None, None, None, issuer)

    # 6.11 @included
    if "@included" in element:
        _generate(element.pop("@included"), node_map, active_graph, None, None, None, issuer)

    # 6.12 remaining properties
    for prop in sorted(element.keys()):
        value = element[prop]
        if is_blank_node_id(prop):
            prop = issuer.issue(prop)
        node.setdefault(prop, [])
        _generate(value, node_map, active_graph, id_, prop, None, issuer)


def flatten_expanded(expanded: list, ordered: bool = False) -> list:
    """Flattening (spec §7.1; reference flattening.ex:12-54): merge named
    graphs into default-graph ``@graph`` entries, drop id-only nodes."""
    node_map, _ = node_map_generation(expanded)
    default_graph = node_map["@default"]
    for graph_name in sorted(k for k in node_map if k != "@default"):
        graph = node_map[graph_name]
        entry = default_graph.setdefault(graph_name, {"@id": graph_name})
        entry["@graph"] = [
            graph[sid] for sid in sorted(graph) if set(graph[sid]) != {"@id"}
        ]
    return [
        default_graph[sid]
        for sid in sorted(default_graph)
        if set(default_graph[sid]) != {"@id"}
    ]
