"""JSON-LD 1.1 Compaction (API §8): Compaction Algorithm, IRI Compaction,
Value Compaction, Inverse Context Creation, Term Selection.

Semantics mirror the reference (lib/json/ld/compaction.ex:12-1365 and
lib/json/ld/context.ex:450-559 for the inverse context). Needed for the
``compact``/``flatten(ctx)`` API surface; the triple pipeline never calls it
(SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Any

from .context import NOT_PRESENT, Context
from .errors import JsonLdError
from .iri import relativize
from .options import JsonLdOptions

def _container_key(container: frozenset[str]) -> str:
    return "".join(sorted(container)) or "@none"


def _is_value(v: Any) -> bool:
    return isinstance(v, dict) and "@value" in v


def _is_list(v: Any) -> bool:
    return isinstance(v, dict) and "@list" in v


def _is_subject_ref(v: Any) -> bool:
    return isinstance(v, dict) and set(v) == {"@id"}


def _is_graph_object(v: Any) -> bool:
    return isinstance(v, dict) and "@graph" in v and not (
        set(v) - {"@graph", "@id", "@index"}
    )


def _is_simple_graph(v: Any) -> bool:
    return _is_graph_object(v) and "@id" not in v


def _as_array(v: Any) -> list:
    return v if isinstance(v, list) else [v]


# ---------------------------------------------------------------------------
# Inverse Context Creation (§4.3; reference context.ex:450-559)
# ---------------------------------------------------------------------------


def inverse_context(active: Context) -> dict:
    if active.inverse_context is not None:
        return active.inverse_context
    result: dict = {}
    default_language = (active.default_language or "@none").lower()
    # shortest-then-lexicographic term ordering (context.ex:458-463)
    for term in sorted(active.term_definitions, key=lambda t: (len(t), t)):
        td = active.term_definitions[term]
        if td is None or td.iri_mapping is None:
            continue
        container = _container_key(td.container_mapping)
        container_map = result.setdefault(td.iri_mapping, {})
        type_lang = container_map.setdefault(
            container, {"@language": {}, "@type": {}, "@any": {}}
        )
        type_lang["@any"].setdefault("@none", term)
        if td.reverse_property:
            type_lang["@type"].setdefault("@reverse", term)
        elif td.type_mapping == "@none":
            type_lang["@language"].setdefault("@any", term)
            type_lang["@type"].setdefault("@any", term)
        elif td.type_mapping is not None:
            type_lang["@type"].setdefault(td.type_mapping, term)
        elif td.language_mapping is not NOT_PRESENT and td.direction_mapping is not NOT_PRESENT:
            lang, direction = td.language_mapping, td.direction_mapping
            if lang and direction:
                key = f"{lang}_{direction}".lower()
            elif lang:
                key = lang.lower()
            elif direction:
                key = f"_{direction}".lower()
            else:
                key = "@null"
            type_lang["@language"].setdefault(key, term)
        elif td.language_mapping is not NOT_PRESENT:
            key = (td.language_mapping or "@null").lower()
            type_lang["@language"].setdefault(key, term)
        elif td.direction_mapping is not NOT_PRESENT:
            key = f"_{td.direction_mapping}".lower() if td.direction_mapping else "@none"
            type_lang["@language"].setdefault(key, term)
        elif active.base_direction:
            key = f"{(active.default_language or '')}_{active.base_direction}".lower()
            type_lang["@language"].setdefault(key, term)
            type_lang["@language"].setdefault("@none", term)
            type_lang["@type"].setdefault("@none", term)
        else:
            type_lang["@language"].setdefault(default_language, term)
            type_lang["@language"].setdefault("@none", term)
            type_lang["@type"].setdefault("@none", term)
    active.inverse_context = result
    return result


# ---------------------------------------------------------------------------
# Term Selection (§4.4; reference compaction.ex:1345-1365)
# ---------------------------------------------------------------------------


def select_term(
    inverse: dict, iri: str, containers: list[str], type_language: str, preferred: list[str]
) -> str | None:
    container_map = inverse.get(iri, {})
    for container in containers:
        tl_map = container_map.get(container)
        if tl_map is None:
            continue
        value_map = tl_map[type_language]
        for pref in preferred:
            if pref in value_map:
                return value_map[pref]
    return None


# ---------------------------------------------------------------------------
# IRI Compaction (§4.5; reference compaction.ex:776-1237)
# ---------------------------------------------------------------------------


def compact_iri(
    active: Context,
    var: str | None,
    value: Any = None,
    *,
    vocab: bool = False,
    reverse: bool = False,
) -> str | None:
    if var is None:
        return None
    inverse = inverse_context(active)

    if vocab and var in inverse:
        # 2.1 default language considering base direction
        if active.base_direction:
            default_language = f"{(active.default_language or '')}_{active.base_direction}".lower()
        else:
            default_language = (active.default_language or "@none").lower()

        if isinstance(value, dict) and "@preserve" in value:
            value = _as_array(value["@preserve"])[0]

        containers: list[str] = []
        type_language = "@language"
        type_language_value: str | None = "@null"

        if isinstance(value, dict) and "@index" in value and not _is_graph_object(value):
            containers += ["@index", "@index@set"]

        if reverse:
            type_language = "@type"
            type_language_value = "@reverse"
            containers.append("@set")
        elif _is_list(value):
            if "@index" not in value:
                containers.append("@list")
            lst = value["@list"]
            common_type: str | None = None
            common_language: str | None = default_language if not lst else None
            for item in lst:
                item_language, item_type = "@none", "@none"
                if _is_value(item):
                    if "@direction" in item:
                        item_language = f"{item.get('@language', '')}_{item['@direction']}".lower()
                    elif "@language" in item:
                        item_language = item["@language"].lower()
                    elif "@type" in item:
                        item_type = item["@type"]
                    else:
                        item_language = "@null"
                else:
                    item_type = "@id"
                common_language = (
                    item_language
                    if common_language is None
                    else (common_language if common_language == item_language else "@none")
                )
                common_type = (
                    item_type
                    if common_type is None
                    else (common_type if common_type == item_type else "@none")
                )
                if common_language == "@none" and common_type == "@none":
                    break
            common_language = common_language or "@none"
            common_type = common_type or "@none"
            if common_type != "@none":
                type_language = "@type"
                type_language_value = common_type
            else:
                type_language_value = common_language
        elif _is_graph_object(value):
            if "@index" in value:
                containers += ["@graph@index", "@graph@index@set"]
            if "@id" in value:
                containers += ["@graph@id", "@graph@id@set"]
            containers += ["@graph", "@graph@set", "@set"]
            if "@index" not in value:
                containers += ["@graph@index", "@graph@index@set"]
            if "@id" not in value:
                containers += ["@graph@id", "@graph@id@set"]
            containers += ["@index", "@index@set"]
            type_language = "@type"
            type_language_value = "@id"
        else:
            if _is_value(value):
                if "@direction" in value and "@index" not in value:
                    type_language_value = f"{value.get('@language', '')}_{value['@direction']}".lower()
                    containers += ["@language", "@language@set"]
                elif "@language" in value and "@index" not in value:
                    type_language_value = value["@language"].lower()
                    containers += ["@language", "@language@set"]
                elif "@type" in value:
                    type_language = "@type"
                    type_language_value = value["@type"]
            else:
                type_language = "@type"
                type_language_value = "@id"
                containers += ["@id", "@id@set", "@type", "@set@type"]
            containers.append("@set")

        containers.append("@none")
        if active.options.processing_mode != "json-ld-1.0" and (
            not isinstance(value, dict) or "@index" not in value
        ):
            containers += ["@index", "@index@set"]
        if active.options.processing_mode != "json-ld-1.0" and (
            isinstance(value, dict) and set(value) == {"@value"}
        ):
            containers += ["@language", "@language@set"]

        if type_language_value is None:
            type_language_value = "@null"
        preferred: list[str] = []
        if type_language_value == "@reverse":
            preferred.append("@reverse")
        if type_language_value in ("@id", "@reverse") and isinstance(value, dict) and "@id" in value:
            candidate = compact_iri(active, value["@id"], vocab=True)
            ctd = active.term_definitions.get(candidate) if candidate else None
            if ctd is not None and ctd.iri_mapping == value["@id"]:
                preferred += ["@vocab", "@id", "@none"]
            else:
                preferred += ["@id", "@vocab", "@none"]
        else:
            preferred += [type_language_value, "@none"]
            if _is_list(value) and value["@list"] == []:
                type_language = "@any"
        preferred.append("@any")
        # lang_dir fallback: "de_ltr" also tries "_ltr"
        for pv in list(preferred):
            idx = pv.find("_")
            if idx > 0:
                preferred.append(pv[idx:])

        term = select_term(inverse, var, containers, type_language, preferred)
        if term is not None:
            return term

    # 3. vocab-mapping suffix
    if vocab and active.vocabulary_mapping:
        vm = active.vocabulary_mapping
        if var.startswith(vm) and len(var) > len(vm):
            suffix = var[len(vm):]
            if suffix not in active.term_definitions:
                return suffix

    # 4. compact IRI synthesis (shortest_or_least, compaction.ex:1112-1172)
    candidate: str | None = None
    for term, td in active.term_definitions.items():
        if ":" in term:
            continue
        if (
            td is None
            or td.iri_mapping is None
            or not td.prefix_flag
            or var == td.iri_mapping
            or not var.startswith(td.iri_mapping)
        ):
            continue
        cand = term + ":" + var[len(td.iri_mapping):]
        if candidate is not None and not (
            len(cand) < len(candidate) or (len(cand) == len(candidate) and cand < candidate)
        ):
            continue
        cand_td = active.term_definitions.get(cand)
        if cand_td is None or (cand_td.iri_mapping == var and value is None):
            candidate = cand
    if candidate is not None:
        return candidate

    # 5. IRI-confused-with-prefix guard
    colon = var.find(":")
    if colon > 0:
        prefix = var[:colon]
        ptd = active.term_definitions.get(prefix)
        if ptd is not None and ptd.prefix_flag and ptd.iri_mapping:
            if ptd.iri_mapping + var[colon + 1:] != var:
                raise JsonLdError("IRI confused with prefix", var)

    # 6. base-relative rewrite
    if not vocab:
        base = active.effective_base
        if base is not None and active.options.compact_to_relative:
            return relativize(base, var)
    return var


# ---------------------------------------------------------------------------
# Value Compaction (§4.6; reference compaction.ex:1244-1334)
# ---------------------------------------------------------------------------


def compact_value(active: Context, active_property: str | None, value: dict) -> Any:
    td = active.term_definitions.get(active_property) if active_property else None
    container = td.container_mapping if td is not None else frozenset()
    type_mapping = td.type_mapping if td is not None else None
    if td is not None and td.language_mapping is not NOT_PRESENT:
        language = td.language_mapping
    else:
        language = active.default_language
    if td is not None and td.direction_mapping is not NOT_PRESENT:
        direction = td.direction_mapping
    else:
        direction = active.base_direction

    if _is_subject_ref(value):
        if type_mapping == "@id":
            return compact_iri(active, value["@id"], vocab=False)
        if type_mapping == "@vocab":
            return compact_iri(active, value["@id"], vocab=True)
        return {compact_iri(active, "@id", vocab=True): compact_iri(active, value["@id"], vocab=False)}

    result = dict(value)
    if "@index" in result and "@index" in container:
        del result["@index"]

    # a surviving @index (term has no @index container) pins the map form:
    # unwrapping to a bare scalar would silently DROP the @index on
    # round-trip (jsonld.js/pyld preserve it; the Elixir reference shares
    # this gap — conformance-neutral, the W3C suite never isolates it)
    indexed = "@index" in result

    if type_mapping == "@none":
        pass  # @type:@none terms make no type/language assumptions: keep map
    elif not indexed and "@type" in result and result["@type"] == type_mapping:
        result = result["@value"]
    elif not indexed and ("@language" in result or "@direction" in result) and (
        (result.get("@language") or "").lower() == (language or "").lower()
        and result.get("@direction") == direction
        and isinstance(result.get("@value"), str)
    ):
        result = result["@value"]
    elif set(result) == {"@value"}:
        v = result["@value"]
        if not isinstance(v, str) or (language is None and direction is None):
            result = v

    if isinstance(result, dict):
        compacted = {}
        for k, v in result.items():
            if k == "@type":
                compacted[compact_iri(active, "@type", vocab=True)] = compact_iri(
                    active, v, vocab=True
                )
            else:
                compacted[compact_iri(active, k, vocab=True)] = v
        result = compacted
    return result


# ---------------------------------------------------------------------------
# Compaction Algorithm (§4.1... reference compaction.ex:12-760)
# ---------------------------------------------------------------------------


def compact_element(
    active: Context,
    active_property: str | None,
    element: Any,
    *,
    compact_arrays: bool = True,
    ordered: bool = False,
) -> Any:
    options = active.options
    # 2. scalars
    if element is None or isinstance(element, (str, int, float, bool)):
        return element

    # 3. arrays
    if isinstance(element, list):
        result = []
        for item in element:
            compacted = compact_element(
                active, active_property, item, compact_arrays=compact_arrays, ordered=ordered
            )
            if compacted is not None:
                result.append(compacted)
        td = active.term_definitions.get(active_property) if active_property else None
        container = td.container_mapping if td is not None else frozenset()
        if (
            len(result) == 1
            and compact_arrays
            and active_property not in ("@graph", "@set")
            and not (container & {"@list", "@set"})
        ):
            return result[0]
        return result

    # 4. maps
    # 1. type-scoped context = the context at entry (pre-revert) — used for
    # compacting @type values and for scoped-context lookups
    type_scoped = active

    # 5. revert previous (type-scoped) context for node objects
    if active.previous_context is not None and not _is_value(element) and not _is_subject_ref(element):
        active = active.previous_context

    # 6. property-scoped context; the term definition is looked up in the
    # TYPE-SCOPED context per the spec errata, as the reference does
    # (compaction.ex:76-78)
    td_prop = type_scoped.term_definitions.get(active_property) if active_property else None
    if td_prop is not None and td_prop.local_context is not NOT_PRESENT:
        active = active.process(
            td_prop.local_context, td_prop.base_url, override_protected=True
        )
    td_prop = active.term_definitions.get(active_property) if active_property else None

    # 7. value objects / subject references
    if _is_value(element) or _is_subject_ref(element):
        result = compact_value(active, active_property, element)
        if not isinstance(result, (dict, list)) or (
            td_prop is not None and td_prop.type_mapping == "@json"
        ):
            return result

    # 8. list object under a @list container compacts to its bare items
    if _is_list(element) and td_prop is not None and "@list" in td_prop.container_mapping:
        return compact_element(
            active, active_property, element["@list"], compact_arrays=compact_arrays, ordered=ordered
        )

    inside_reverse = active_property == "@reverse"
    result: dict = {}

    # apply type-scoped contexts (sorted compacted types)
    if "@type" in element:
        compacted_types = sorted(
            compact_iri(type_scoped, t, vocab=True) for t in _as_array(element["@type"])
        )
        for ctype in compacted_types:
            ttd = type_scoped.term_definitions.get(ctype)
            if ttd is not None and ttd.local_context is not NOT_PRESENT:
                active = active.process(ttd.local_context, ttd.base_url, propagate=False)

    keys = sorted(element.keys()) if ordered else list(element.keys())
    for expanded_property in keys:
        expanded_value = element[expanded_property]

        if expanded_property == "@id":
            compacted = compact_iri(active, expanded_value, vocab=False)
            result[compact_iri(active, "@id", vocab=True)] = compacted
            continue

        if expanded_property == "@type":
            types = [
                compact_iri(type_scoped, t, vocab=True) for t in _as_array(expanded_value)
            ]
            alias = compact_iri(active, "@type", vocab=True)
            atd = active.term_definitions.get(alias)
            as_array_type = (
                options.processing_mode != "json-ld-1.0"
                and atd is not None
                and "@set" in atd.container_mapping
            ) or not compact_arrays
            value_out: Any = types if (len(types) > 1 or as_array_type) else types[0]
            result[alias] = value_out
            continue

        if expanded_property == "@reverse":
            compacted = compact_element(
                active, "@reverse", expanded_value, compact_arrays=compact_arrays, ordered=ordered
            )
            if isinstance(compacted, dict):
                for prop in list(compacted.keys()):
                    ptd = active.term_definitions.get(prop)
                    if ptd is not None and ptd.reverse_property:
                        value = compacted.pop(prop)
                        use_array = "@set" in ptd.container_mapping or not compact_arrays
                        _add_value(result, prop, value, as_array=use_array)
                if compacted:
                    result[compact_iri(active, "@reverse", vocab=True)] = compacted
            continue

        if expanded_property == "@preserve":
            compacted = compact_element(
                active, active_property, expanded_value, compact_arrays=compact_arrays, ordered=ordered
            )
            if compacted != []:
                result["@preserve"] = compacted
            continue

        if expanded_property == "@index":
            td_ap = active.term_definitions.get(active_property) if active_property else None
            if td_ap is not None and "@index" in td_ap.container_mapping:
                continue  # re-expressed by the index container
            result[compact_iri(active, "@index", vocab=True)] = expanded_value
            continue

        if expanded_property in ("@direction", "@language", "@value"):
            result[compact_iri(active, expanded_property, vocab=True)] = expanded_value
            continue

        # 12.7 empty arrays are preserved under their compacted key
        if expanded_value == []:
            item_active_property = compact_iri(
                active, expanded_property, value=expanded_value, vocab=True, reverse=inside_reverse
            )
            nest_result, _ = _nest_target(active, result, item_active_property)
            existing = nest_result.get(item_active_property)
            if existing is None:
                nest_result[item_active_property] = []
            elif not isinstance(existing, list):
                nest_result[item_active_property] = [existing]
            continue

        # 12.8 item-wise compaction
        for expanded_item in _as_array(expanded_value):
            item_active_property = compact_iri(
                active, expanded_property, value=expanded_item, vocab=True, reverse=inside_reverse
            )
            nest_result, _ = _nest_target(active, result, item_active_property)
            td_item = active.term_definitions.get(item_active_property)
            container = td_item.container_mapping if td_item is not None else frozenset()
            as_array = (
                "@set" in container
                or expanded_property in ("@graph", "@list")
                or not compact_arrays
            )

            inner = expanded_item
            if _is_list(expanded_item):
                inner = expanded_item["@list"]
            elif _is_graph_object(expanded_item):
                inner = expanded_item["@graph"]
            compacted_item = compact_element(
                active, item_active_property, inner, compact_arrays=compact_arrays, ordered=ordered
            )

            if _is_list(expanded_item):
                if not isinstance(compacted_item, list):
                    compacted_item = [compacted_item]
                if "@list" not in container:
                    wrapped = {
                        compact_iri(active, "@list", vocab=True): compacted_item
                    }
                    if "@index" in expanded_item:
                        wrapped[compact_iri(active, "@index", vocab=True)] = expanded_item["@index"]
                    _add_value(nest_result, item_active_property, wrapped, as_array=as_array)
                else:
                    if item_active_property in nest_result:
                        raise JsonLdError(
                            "compaction to list of lists", item_active_property
                        )
                    nest_result[item_active_property] = compacted_item
                continue

            if _is_graph_object(expanded_item):
                if "@graph" in container and "@id" in container:
                    map_object = nest_result.setdefault(item_active_property, {})
                    if "@id" in expanded_item:
                        map_key = compact_iri(active, expanded_item["@id"], vocab=False)
                    else:
                        map_key = compact_iri(active, "@none", vocab=True)
                    _add_value(map_object, map_key, compacted_item, as_array=as_array)
                elif "@graph" in container and "@index" in container and _is_simple_graph(expanded_item):
                    map_object = nest_result.setdefault(item_active_property, {})
                    map_key = expanded_item.get("@index", compact_iri(active, "@none", vocab=True))
                    _add_value(map_object, map_key, compacted_item, as_array=as_array)
                elif "@graph" in container and _is_simple_graph(expanded_item):
                    if isinstance(compacted_item, list) and len(compacted_item) > 1:
                        compacted_item = {compact_iri(active, "@included", vocab=True): compacted_item}
                    _add_value(nest_result, item_active_property, compacted_item, as_array=as_array)
                else:
                    wrapped = {compact_iri(active, "@graph", vocab=True): compacted_item}
                    if "@id" in expanded_item:
                        wrapped[compact_iri(active, "@id", vocab=True)] = compact_iri(
                            active, expanded_item["@id"], vocab=False
                        )
                    if "@index" in expanded_item:
                        wrapped[compact_iri(active, "@index", vocab=True)] = expanded_item["@index"]
                    _add_value(nest_result, item_active_property, wrapped, as_array=as_array)
                continue

            if container & {"@language", "@index", "@id", "@type"} and "@graph" not in container:
                map_object = nest_result.setdefault(item_active_property, {})
                if "@language" in container:
                    ckey = "@language"
                elif "@index" in container:
                    ckey = "@index"
                elif "@id" in container:
                    ckey = "@id"
                else:
                    ckey = "@type"
                map_key = None
                if "@language" in container:
                    if _is_value(expanded_item):
                        compacted_item = expanded_item["@value"]
                    map_key = expanded_item.get("@language")
                elif "@index" in container:
                    index_key = td_item.index_mapping if td_item is not None else None
                    if index_key is None:
                        map_key = expanded_item.get("@index")
                        # drop the redundant alias entry the expansion added
                        alias_idx = compact_iri(active, "@index", vocab=True)
                        if (
                            map_key is not None
                            and isinstance(compacted_item, dict)
                            and compacted_item.get(alias_idx) == map_key
                        ):
                            del compacted_item[alias_idx]
                    else:
                        # property-valued index
                        from .context import expand_iri as _expand_iri

                        container_key = compact_iri(
                            active, _expand_iri(active, index_key, vocab=True), vocab=True
                        )
                        if isinstance(compacted_item, dict) and container_key in compacted_item:
                            values = _as_array(compacted_item[container_key])
                            head = values[0]
                            rest = values[1:]
                            if isinstance(head, str):
                                map_key = head
                                if not rest:
                                    del compacted_item[container_key]
                                elif len(rest) == 1 and compact_arrays:
                                    compacted_item[container_key] = rest[0]
                                else:
                                    compacted_item[container_key] = rest
                elif "@id" in container:
                    alias_id = compact_iri(active, "@id", vocab=True)
                    if isinstance(compacted_item, dict):
                        map_key = compacted_item.pop(alias_id, None)
                else:  # @type
                    alias_type = compact_iri(active, "@type", vocab=True)
                    if isinstance(compacted_item, dict) and alias_type in compacted_item:
                        values = _as_array(compacted_item[alias_type])
                        map_key = values[0]
                        rest = values[1:]
                        if not rest:
                            del compacted_item[alias_type]
                        elif len(rest) == 1 and compact_arrays:
                            compacted_item[alias_type] = rest[0]
                        else:
                            compacted_item[alias_type] = rest
                        # single remaining @id entry recompacts as a reference
                        if (
                            isinstance(compacted_item, dict)
                            and len(compacted_item) == 1
                            and "@id" in expanded_item
                        ):
                            compacted_item = compact_element(
                                active,
                                item_active_property,
                                {"@id": expanded_item["@id"]},
                                compact_arrays=compact_arrays,
                                ordered=ordered,
                            )
                if map_key is None:
                    map_key = compact_iri(active, "@none", vocab=True)
                _add_value(map_object, map_key, compacted_item, as_array=as_array)
                continue

            _add_value(nest_result, item_active_property, compacted_item, as_array=as_array)

    return result


def _nest_target(active: Context, result: dict, item_active_property: str | None) -> tuple[dict, Any]:
    """Resolve the @nest host map for a compacted key (spec 12.8.2-12.8.3)."""
    td = active.term_definitions.get(item_active_property) if item_active_property else None
    if td is not None and td.nest_value is not None:
        from .context import expand_iri as _expand_iri

        nest_term = td.nest_value
        if nest_term != "@nest" and _expand_iri(active, nest_term, vocab=True) != "@nest":
            raise JsonLdError("invalid @nest value", nest_term)
        return result.setdefault(nest_term, {}), td
    return result, td


def _add_value(obj: dict, key: str, value: Any, *, as_array: bool) -> None:
    if as_array and key not in obj:
        obj[key] = []
    if key in obj:
        existing = obj[key]
        if not isinstance(existing, list):
            obj[key] = existing = [existing]
        if isinstance(value, list):
            existing.extend(value)
        else:
            existing.append(value)
    else:
        obj[key] = value


# ---------------------------------------------------------------------------
# top-level API (reference lib/json_ld.ex:189-245)
# ---------------------------------------------------------------------------


def compact_top_level(
    expanded: list,
    context: Any,
    options: JsonLdOptions,
    doc_url: str | None = None,
    force_graph: bool = False,
) -> dict:
    """``force_graph`` (used by flatten-with-context): the result keeps a
    top-level @graph entry even for a single node, per the deterministic-
    structure requirement of JsonLdProcessor.flatten (html suite #tf001)."""
    ctx_value = context
    if isinstance(ctx_value, dict) and "@context" in ctx_value:
        ctx_value = ctx_value["@context"]

    active = Context(options)
    active.original_base_url = doc_url
    if options.base is not None:
        active.base_iri = options.base
    elif doc_url is not None and options.compact_to_relative:
        active.base_iri = doc_url
    active = active.process(ctx_value, doc_url)

    compacted = compact_element(
        active, None, expanded, compact_arrays=options.compact_arrays, ordered=options.ordered
    )
    if compacted is None or compacted == []:
        result: dict = {}
    elif isinstance(compacted, list):
        result = {compact_iri(active, "@graph", vocab=True): compacted}
    elif force_graph:
        result = {compact_iri(active, "@graph", vocab=True): [compacted]}
    else:
        result = compacted

    if ctx_value and result:
        # drop empty contexts ([] / {} / null)
        if not (
            ctx_value is None
            or ctx_value == {}
            or ctx_value == []
            or (isinstance(ctx_value, list) and all(c is None for c in ctx_value))
        ):
            result = {"@context": context if not isinstance(context, dict) or "@context" not in context else context["@context"], **result}
    return result
