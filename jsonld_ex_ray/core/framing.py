"""JSON-LD 1.1 Framing (W3C json-ld11-framing).

The reference explicitly does NOT implement framing (reference
README.md:29-32 lists it as a known gap), so there is no Elixir behavior
to mirror: this module follows the W3C spec directly — frame matching
(§2.2: @id / @type / property patterns, match-none, wildcard,
``@requireAll``), the framing algorithm (§3.1: ``@embed`` once/always/
never with circular-reference protection, ``@explicit``, ``@default`` /
``@omitDefault``, list framing, named-graph recursion, ``@reverse``
framing), blank-node pruning, and ``omitGraph`` unwrapping.

Frames are expanded by a dedicated walker (not the conformance-critical
expansion kernel): frames legally contain empty arrays/maps as match
patterns and framing keywords, which ordinary expansion rejects.
"""

from __future__ import annotations

import copy
from typing import Any

from .context import NOT_PRESENT, Context, is_keyword
from .errors import JsonLdError
from .options import JsonLdOptions

_FRAME_FLAGS = ("@embed", "@explicit", "@requireAll", "@omitDefault", "@omitGraph")
_NULL_SENTINEL = "urn:x-jsonld-ex:frame-null"


def _is_frame_keyword(k: str) -> bool:
    """Core keywords plus the framing-spec additions (which the core
    KEYWORDS set intentionally excludes)."""
    return is_keyword(k) or k in _FRAME_FLAGS or k == "@default"


def _as_array(v: Any) -> list:
    return v if isinstance(v, list) else [v]


def _is_node_ref(v: Any) -> bool:
    return isinstance(v, dict) and set(v) == {"@id"}


def _is_value(v: Any) -> bool:
    return isinstance(v, dict) and "@value" in v


def _is_list(v: Any) -> bool:
    return isinstance(v, dict) and "@list" in v


# ---------------------------------------------------------------------------
# frame expansion
# ---------------------------------------------------------------------------


def expand_frame(frame: Any, options: JsonLdOptions, doc_url: str | None = None) -> list:
    """Expand a frame document: term/IRI expansion via the ordinary context
    machinery, with frame-specific value shapes preserved (empty arrays =
    match none, empty maps = wildcard, framing keywords, @default)."""
    active = Context(options)
    active.original_base_url = doc_url
    if options.base is not None:
        active.base_iri = options.base
    elif doc_url is not None:
        active.base_iri = doc_url
    else:
        active.base_iri = NOT_PRESENT
    if isinstance(frame, dict) and "@context" in frame:
        active = active.process(frame["@context"], doc_url)
    expanded = _expand_frame_object(active, frame)
    return [e for e in _as_array(expanded) if isinstance(e, dict)]


def _expand_frame_object(active: Context, frame: Any) -> Any:
    from .context import expand_iri
    from .expansion import expand_value

    if isinstance(frame, list):
        return [_expand_frame_object(active, f) for f in frame]
    if not isinstance(frame, dict):
        return frame
    out: dict[str, Any] = {}
    for key in frame:
        if key == "@context":
            continue
        value = frame[key]
        if key in _FRAME_FLAGS or key == "@default":
            expanded_key = key  # framing keywords are not core keywords
        else:
            expanded_key = expand_iri(active, key, vocab=True)
        if expanded_key is None or (
            not _is_frame_keyword(expanded_key) and ":" not in expanded_key
        ):
            continue
        if expanded_key == "@id":
            if value == [] or value == {}:
                out["@id"] = value if value == [] else [{}]
            else:
                # a {} wildcard may also arrive ARRAY-WRAPPED ({"@id": [{}]});
                # non-strings must bypass expand_iri (its memo key would be
                # unhashable) and survive as the wildcard they are
                out["@id"] = [
                    expand_iri(active, v, document_relative=True)
                    if isinstance(v, str)
                    else v
                    for v in _as_array(value)
                ]
        elif expanded_key == "@type":
            if value == [] or value == {}:
                out["@type"] = value if value == [] else [{}]
            else:
                expanded_types: list[Any] = []
                for v in _as_array(value):
                    if isinstance(v, dict) and "@default" in v:
                        expanded_types.append(
                            {
                                "@default": [
                                    expand_iri(active, d, vocab=True, document_relative=True)
                                    for d in _as_array(v["@default"])
                                ]
                            }
                        )
                    elif isinstance(v, dict) and not v:
                        expanded_types.append({})
                    else:
                        expanded_types.append(
                            expand_iri(active, v, vocab=True, document_relative=True)
                        )
                out["@type"] = expanded_types
        elif expanded_key in _FRAME_FLAGS:
            v = value[0] if isinstance(value, list) and value else value
            if isinstance(v, dict) and "@value" in v:
                v = v["@value"]
            out[expanded_key] = v
        elif expanded_key == "@default":
            dv = []
            for v in _as_array(value):
                if isinstance(v, dict):
                    dv.append(_expand_frame_object(active, v))
                elif v is None or v == "@null":
                    # the @null keyword survives frame expansion verbatim
                    # (json-ld11-framing: a @default of @null emits JSON
                    # null in the framed output)
                    dv.append("@null")
                else:
                    dv.append(expand_value(active, key, v))
            out["@default"] = dv
        elif expanded_key == "@reverse":
            if isinstance(value, dict):
                rev = {}
                for rk, rv in value.items():
                    rk_exp = expand_iri(active, rk, vocab=True)
                    rev[rk_exp] = _as_array(_expand_frame_object(active, rv))
                out["@reverse"] = rev
        elif expanded_key in ("@graph", "@list", "@set", "@included"):
            inner = [
                _expand_frame_object(active, v) if isinstance(v, (dict, list)) else v
                for v in _as_array(value)
            ]
            if expanded_key == "@set":
                return inner  # @set unwraps
            out[expanded_key] = inner
        elif expanded_key in ("@value", "@language", "@direction"):
            out[expanded_key] = value
        elif is_keyword(expanded_key):
            out[expanded_key] = value
        else:
            if value == []:
                out[expanded_key] = []
            else:
                vals = []
                for v in _as_array(value):
                    if isinstance(v, dict):
                        ev = _expand_frame_object(active, v)
                        vals.extend(ev if isinstance(ev, list) else [ev])
                    else:
                        vals.append(expand_value(active, key, v))
                out[expanded_key] = vals
    return out


# ---------------------------------------------------------------------------
# matching (§2.2)
# ---------------------------------------------------------------------------


def _flag(frame: dict, name: str, default):
    if name in frame:
        v = frame[name]
        if isinstance(v, list) and v:
            v = v[0]
        if isinstance(v, dict) and "@value" in v:
            v = v["@value"]
        return v
    return default


def _value_pattern_match(pattern: dict, value: dict) -> bool:
    def member_match(pk: str, fold=None):
        pv = pattern.get(pk)
        actual = value.get(pk)
        if pv is None or pv == {} or pv == [{}] or (isinstance(pv, list) and {} in pv):
            return True  # wildcard / unconstrained
        if pv == []:
            return actual is None  # match none
        cands = _as_array(pv)
        cands = [c["@value"] if isinstance(c, dict) and "@value" in c else c for c in cands]
        if fold:
            cands = [fold(c) if isinstance(c, str) else c for c in cands]
            actual = fold(actual) if isinstance(actual, str) else actual
        return actual in cands

    if not isinstance(value, dict) or "@value" not in value:
        return False
    return (
        member_match("@value")
        and member_match("@type")
        and member_match("@language", fold=str.lower)
    )


def _node_pattern_match(state, pattern: dict, obj: Any) -> bool:
    """Shallow node-pattern match for property values: @id / @type
    constraints of the subframe applied to the referenced node."""
    if not isinstance(obj, dict) or "@id" not in obj:
        return False
    node = state.current_nodes().get(obj["@id"], obj)
    ids = pattern.get("@id")
    if ids == []:
        return False  # §2.2 match-none (empty list is falsy — check first)
    if ids and ids != [{}] and {} not in _as_array(ids):
        if obj["@id"] not in _as_array(ids):
            return False
    types = pattern.get("@type")
    if types is not None:
        node_types = node.get("@type", [])
        if types == []:
            if node_types:
                return False
        elif types == [{}] or {} in _as_array(types):
            if not node_types:
                return False
        elif not any(isinstance(t, dict) and "@default" in t for t in _as_array(types)):
            if not set(_as_array(types)) & set(node_types):
                return False
    return True


def _filter_subject(state, subject: dict, frame: dict, require_all: bool) -> bool:
    matches_some = False
    non_keyword_props = [
        k for k in frame if not _is_frame_keyword(k) or k in ("@id", "@type")
    ]
    wildcard = True
    for prop in non_keyword_props:
        v = frame[prop]
        if prop == "@id":
            wildcard = False
            if v == []:
                # json-ld11-framing §2.2 match-none: every flattened node
                # carries an @id, so an empty @id array matches nothing
                return False
            if v == [{}] or (isinstance(v, list) and {} in v):
                matches_some = True
                continue
            if subject.get("@id") in _as_array(v):
                matches_some = True
                continue
            return False
        if prop == "@type":
            wildcard = False
            node_types = subject.get("@type", [])
            if v == []:
                if node_types:
                    return False
                matches_some = True
            elif v == [{}] or (isinstance(v, list) and {} in v):
                if not node_types:
                    return False
                matches_some = True
            elif isinstance(v, list) and any(
                isinstance(t, dict) and "@default" in t for t in v
            ):
                matches_some = True  # type with @default: match any
            else:
                if not (set(_as_array(v)) & set(node_types)):
                    return False
                matches_some = True
            continue
        if _is_frame_keyword(prop):
            continue
        wildcard = False
        frame_vals = frame[prop] if isinstance(frame[prop], list) else [frame[prop]]
        present = bool(subject.get(prop))
        if frame_vals == []:
            # match none: subject must NOT have the property
            if present:
                return False
            matches_some = True
            continue
        has_default = any(
            isinstance(fv, dict) and "@default" in fv for fv in frame_vals
        )
        if has_default:
            matches_some = True
            continue
        if not present:
            if require_all:
                return False
            continue
        # spec: an ARRAY of patterns matches when ANY pattern matches —
        # not just the first element
        dict_pats = [fv for fv in frame_vals if isinstance(fv, dict)]
        value_pats = [p for p in dict_pats if _is_value(p)]
        node_pats = [
            p for p in dict_pats if not _is_value(p) and ("@id" in p or "@type" in p)
        ]
        if value_pats or node_pats:
            hit = any(
                _value_pattern_match(p, o) for p in value_pats for o in subject[prop]
            ) or any(
                _node_pattern_match(state, p, o) for p in node_pats for o in subject[prop]
            )
            if hit:
                matches_some = True
            elif require_all:
                return False
        else:
            matches_some = True
    return wildcard or matches_some or not non_keyword_props


def _filter_subjects(state, subjects: list[str], frame: dict, require_all: bool) -> dict:
    out = {}
    nodes = state.current_nodes()
    for sid in subjects:
        node = nodes.get(sid)
        if node is not None and _filter_subject(state, node, frame, require_all):
            out[sid] = node
    return out


# ---------------------------------------------------------------------------
# framing algorithm (§3.1)
# ---------------------------------------------------------------------------


class _FrameState:
    def __init__(self, graph_map: dict, graph: str, options: JsonLdOptions):
        self.graph_map = graph_map
        self.graph = graph
        self.options = options
        self.graph_stack: list[str] = []
        self.subject_stack: list[tuple[dict, str]] = []
        self.unique_embeds: dict[str, dict] = {graph: {}}

    def current_nodes(self) -> dict:
        return self.graph_map.get(self.graph, {})


def _add_output(parent, prop: str | None, value: Any) -> None:
    if isinstance(parent, list):
        parent.append(value)
    else:
        parent.setdefault(prop, []).append(value)


def _remove_embed(state: _FrameState, sid: str) -> None:
    """@last collision: remove the earlier embed, replacing it with a node
    reference (the spec's removeEmbed), including list-holder parents
    (@reverse/@included/top-level), then drop the removed subtree's own
    embeds-map entries so descendants re-embed instead of emitting refs
    to nodes no longer in the output."""
    embeds = state.unique_embeds[state.graph]
    entry = embeds.get(sid)
    if not entry:
        return
    parent, prop = entry["parent"], entry["prop"]
    ref = {"@id": sid}
    if isinstance(parent, dict) and prop in parent:
        parent[prop] = [
            ref if (isinstance(v, dict) and v.get("@id") == sid) else v
            for v in parent[prop]
        ]
    elif isinstance(parent, list):
        for i, v in enumerate(parent):
            if isinstance(v, dict) and v.get("@id") == sid:
                parent[i] = ref
    _remove_dependents(embeds, sid)


def _remove_dependents(embeds: dict, sid: str) -> None:
    for other in list(embeds):
        e = embeds.get(other)
        if e is None:
            continue
        p = e.get("parent")
        if isinstance(p, dict) and p.get("@id") == sid:
            del embeds[other]
            _remove_dependents(embeds, other)


def _frame_subjects(
    state: _FrameState,
    subjects: list[str],
    frame_in: Any,
    parent,
    prop: str | None,
    embedded: bool = False,
) -> None:
    frame = {}
    if isinstance(frame_in, list):
        if frame_in and isinstance(frame_in[0], dict):
            frame = frame_in[0]
    elif isinstance(frame_in, dict):
        frame = frame_in
    o = state.options
    embed = _flag(frame, "@embed", o.embed)
    explicit = _flag(frame, "@explicit", o.explicit)
    require_all = _flag(frame, "@requireAll", o.require_all)
    if embed not in ("@once", "@always", "@never", "@last", "@link", True, False, None):
        raise JsonLdError("invalid @embed value", repr(embed))
    if embed == "@link":
        # valid per spec but unimplemented (linked/shared node objects are
        # not JSON-serializable output) — fail loudly like jsonld.js
        # rather than silently behaving as @always
        raise JsonLdError("invalid @embed value", "@embed: @link is not implemented")
    if embed is True:
        embed = "@once"
    if embed is False:
        embed = "@never"

    matches = _filter_subjects(state, subjects, frame, bool(require_all))
    for sid in sorted(matches):
        subject = matches[sid]
        output: dict[str, Any] = {"@id": sid}

        if not embedded:
            # each top-level result tree tracks its own unique embeds
            state.unique_embeds = {state.graph: {}}
        # embed control only applies when the node is being EMBEDDED into
        # a parent (spec: checks gated on the embedded flag) — top-level
        # matches always frame fully
        circular = any(s.get("@id") == sid for s, g in state.subject_stack if g == state.graph)
        if embedded and (embed == "@never" or circular):
            _add_output(parent, prop, {"@id": sid})
            continue
        embeds = state.unique_embeds.setdefault(state.graph, {})
        if embedded and embed in ("@once", "@last"):
            if sid in embeds:
                if embed == "@last":
                    _remove_embed(state, sid)
                else:
                    _add_output(parent, prop, {"@id": sid})
                    continue
        embeds[sid] = {"parent": parent, "prop": prop}

        state.subject_stack.append((subject, state.graph))

        # named-graph recursion (§3.1 step 4.5.1): the matched node names
        # a graph — recurse with the frame's @graph subframe, or with a
        # wildcard {} when the frame has none; never for @merged/@default
        if sid in state.graph_map and sid not in ("@merged", "@default"):
            if "@graph" in frame:
                subframe = frame["@graph"][0] if frame["@graph"] else {}
            else:
                subframe = {}
            state.graph_stack.append(state.graph)
            state.graph = sid
            state.unique_embeds.setdefault(sid, {})
            _frame_subjects(
                state,
                sorted(state.current_nodes().keys()),
                [subframe],
                output,
                "@graph",
                embedded=True,
            )
            state.graph = state.graph_stack.pop()

        for p in sorted(subject):
            objects = subject[p]
            if is_keyword(p):
                if p == "@type":
                    output["@type"] = copy.deepcopy(objects)
                continue
            if explicit and p not in frame:
                continue
            if p in frame and isinstance(frame[p], list) and frame[p] and isinstance(frame[p][0], dict):
                subframe = [frame[p][0]]
            else:
                # implicit frame inherits the explicit flags
                subframe = [{"@embed": embed, "@explicit": explicit, "@requireAll": require_all}]
            for obj in objects:
                if _is_list(obj):
                    # implicit list frame inherits the explicit flags, same
                    # as the non-list implicit subframe — an embedded list
                    # item must honour the parent's @embed/@explicit
                    list_frame = [
                        {"@embed": embed, "@explicit": explicit, "@requireAll": require_all}
                    ]
                    if (
                        p in frame
                        and isinstance(frame[p], list)
                        and frame[p]
                        and isinstance(frame[p][0], dict)
                        and "@list" in frame[p][0]
                    ):
                        lf = frame[p][0]["@list"]
                        if lf and isinstance(lf[0], dict):
                            list_frame = [lf[0]]
                    list_out: dict[str, Any] = {"@list": []}
                    for item in obj["@list"]:
                        if _is_node_ref(item) or (
                            isinstance(item, dict) and "@id" in item
                        ):
                            _frame_subjects(
                                state, [item["@id"]], list_frame, list_out, "@list",
                                embedded=True,
                            )
                        else:
                            list_out["@list"].append(copy.deepcopy(item))
                    _add_output(output, p, list_out)
                elif isinstance(obj, dict) and "@id" in obj:
                    _frame_subjects(
                        state, [obj["@id"]], subframe, output, p, embedded=True
                    )
                else:
                    # value object: apply any value pattern in the frame
                    pattern = (
                        frame[p][0]
                        if p in frame
                        and isinstance(frame[p], list)
                        and frame[p]
                        and isinstance(frame[p][0], dict)
                        and "@value" in frame[p][0]
                        else None
                    )
                    if pattern is None or _value_pattern_match(pattern, obj):
                        _add_output(output, p, copy.deepcopy(obj))

        # defaults for frame properties absent from the node
        for p in sorted(frame):
            if p == "@type":
                tv = frame[p]
                if (
                    "@type" not in output
                    and isinstance(tv, list)
                    and tv
                    and isinstance(tv[0], dict)
                    and "@default" in tv[0]
                ):
                    output["@type"] = copy.deepcopy(tv[0]["@default"])
                continue
            if _is_frame_keyword(p) or p in output:
                continue
            pf = {}
            if isinstance(frame[p], list) and frame[p] and isinstance(frame[p][0], dict):
                pf = frame[p][0]
            if _flag(pf, "@omitDefault", o.omit_default):
                continue
            default = pf.get("@default", "@null")
            defaults = []
            for d in _as_array(copy.deepcopy(default)):
                if d == "@null" or d is None:
                    defaults.append({"@value": _NULL_SENTINEL})
                else:
                    defaults.append(d)
            output[p] = defaults

        # @included: frame ALL subjects against each included subframe and
        # attach the matches alongside the node (json-ld11-framing §3.1)
        if "@included" in frame and isinstance(frame["@included"], list):
            # included matches are their own result trees (embedded=False:
            # fresh unique-embed space, full embedding even if the node
            # already appears inside the main tree) — but the fresh space
            # is SCOPED to the recursion: the outer tree's embed-once
            # bookkeeping is restored afterwards, or later siblings of
            # this node would re-embed already-embedded nodes
            saved_embeds = state.unique_embeds
            try:
                for inc_frame in frame["@included"]:
                    holder: list = []
                    _frame_subjects(
                        state,
                        sorted(state.current_nodes().keys()),
                        [inc_frame if isinstance(inc_frame, dict) else {}],
                        holder,
                        None,
                        embedded=False,
                    )
                    if holder:
                        output.setdefault("@included", []).extend(holder)
            finally:
                state.unique_embeds = saved_embeds

        # @reverse framing
        if "@reverse" in frame and isinstance(frame["@reverse"], dict):
            for rprop, rframe in frame["@reverse"].items():
                nodes = state.current_nodes()
                for cand_id in sorted(nodes):
                    cand = nodes[cand_id]
                    refs = cand.get(rprop, [])
                    if any(
                        isinstance(r, dict) and r.get("@id") == sid for r in refs
                    ):
                        rev = output.setdefault("@reverse", {})
                        holder: list = []
                        _frame_subjects(
                            state, [cand_id], rframe, holder, None, embedded=True
                        )
                        rev.setdefault(rprop, []).extend(holder)

        state.subject_stack.pop()
        _add_output(parent, prop, output)


# ---------------------------------------------------------------------------
# post-processing
# ---------------------------------------------------------------------------


def _prune_bnodes(element: Any, counts: dict[str, int]) -> Any:
    """Remove blank-node @ids used only once (spec: prune blank node
    identifiers)."""
    if isinstance(element, list):
        return [_prune_bnodes(e, counts) for e in element]
    if isinstance(element, dict):
        out = {}
        for k, v in element.items():
            if (
                k == "@id"
                and isinstance(v, str)
                and v.startswith("_:")
                and counts.get(v, 0) <= 1
            ):
                continue
            out[k] = _prune_bnodes(v, counts)
        return out
    return element


def _count_bnodes(element: Any, counts: dict[str, int]) -> None:
    if isinstance(element, list):
        for e in element:
            _count_bnodes(e, counts)
    elif isinstance(element, dict):
        for k, v in element.items():
            if k == "@id" and isinstance(v, str) and v.startswith("_:"):
                counts[v] = counts.get(v, 0) + 1
            else:
                _count_bnodes(v, counts)


def _replace_null_sentinel(element: Any) -> Any:
    if isinstance(element, list):
        out = [_replace_null_sentinel(e) for e in element]
        return out
    if isinstance(element, dict):
        return {k: _replace_null_sentinel(v) for k, v in element.items()}
    if element == _NULL_SENTINEL:
        return None
    return element


def _merge_node_maps(graph_map: dict) -> dict:
    """@merged: union of all graphs' nodes (properties concatenated with
    value dedup)."""
    from .flattening import strict_equal

    merged: dict[str, dict] = {}
    for _gname, nodes in graph_map.items():
        for sid, node in nodes.items():
            target = merged.setdefault(sid, {"@id": sid})
            for k, v in node.items():
                if k == "@id":
                    continue
                if k == "@type":
                    tgt = target.setdefault("@type", [])
                    for t in v:
                        if t not in tgt:
                            tgt.append(t)
                    continue
                if not isinstance(v, list):
                    target[k] = v
                    continue
                tgt = target.setdefault(k, [])
                for item in v:
                    if not any(strict_equal(item, x) for x in tgt):
                        tgt.append(item)
    return merged


def frame_expanded(
    expanded_input: list, expanded_frame: list, options: JsonLdOptions
) -> list:
    """Frame expanded input against an expanded frame → framed (still
    expanded) output with null sentinels in place of @null defaults."""
    from .flattening import node_map_generation

    node_map, _ = node_map_generation(expanded_input)
    if options.frame_default:
        graph = "@default"
        graph_map = node_map
    else:
        graph = "@merged"
        graph_map = dict(node_map)
        graph_map["@merged"] = _merge_node_maps(node_map)
    state = _FrameState(graph_map, graph, options)

    frame_obj = expanded_frame[0] if expanded_frame else {}
    # a frame wrapped in a sole @graph frames the nodes inside
    if set(frame_obj) <= {"@graph", *_FRAME_FLAGS} and "@graph" in frame_obj:
        inner = frame_obj["@graph"]
        merged = dict(inner[0]) if inner and isinstance(inner[0], dict) else {}
        for f in _FRAME_FLAGS:
            if f in frame_obj and f not in merged:
                merged[f] = frame_obj[f]
        frame_obj = merged

    results: list = []
    _frame_subjects(
        state, sorted(state.current_nodes().keys()), [frame_obj], results, None
    )
    if options.processing_mode == "json-ld-1.0":
        # pruneBlankNodeIdentifiers defaults from processing mode: 1.0
        # framing retains every blank-node @id
        return results
    counts: dict[str, int] = {}
    _count_bnodes(results, counts)
    return _prune_bnodes(results, counts)
