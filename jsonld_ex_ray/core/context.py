"""Active context: Context Processing (§4.1), Create Term Definition (§4.2),
IRI Expansion (§5.3) of the JSON-LD 1.1 API.

Semantics match the reference implementation (lib/json/ld/context.ex,
lib/json/ld/context/term_definition.ex, lib/json/ld/iri_expansion.ex)
including its guard rails: remote-context cycle detection and the
``max_contexts_loaded`` overflow cap (context.ex:41,108,176).

These are plain in-memory structures: one active context lives per document
inside a ``map_batches`` kernel; only *remote* context resolution touches
shared state (the resolver actor's loader cache).
"""

from __future__ import annotations

import re
from typing import Any

from .errors import JsonLdError
from .iri import (
    compact_iri_parts,
    has_keyword_form,
    is_absolute_iri,
    is_blank_node_id,
    is_keyword,
    resolve,
)
from .options import JsonLdOptions

# well-formed BCP47-ish language tag (reference lib/json/ld/utils.ex:11-23)
_LANGUAGE_RE = re.compile(r"^[a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8})*$")

_GEN_DELIMS = set(":/?#[]@")

# A sentinel distinguishing "no @base seen" from "@base: null".
NOT_PRESENT = "__not_present__"


def is_well_formed_language(tag: str) -> bool:
    return _LANGUAGE_RE.match(tag) is not None


class TermDefinition:
    __slots__ = (
        "iri_mapping",
        "prefix_flag",
        "protected",
        "reverse_property",
        "base_url",
        "local_context",
        "container_mapping",
        "index_mapping",
        "language_mapping",
        "direction_mapping",
        "nest_value",
        "type_mapping",
    )

    def __init__(self) -> None:
        self.iri_mapping: str | None = None
        self.prefix_flag = False
        self.protected = False
        self.reverse_property = False
        self.base_url: str | None = None
        self.local_context: Any = NOT_PRESENT
        self.container_mapping: frozenset[str] = frozenset()
        self.index_mapping: str | None = None
        # language/direction use NOT_PRESENT to distinguish explicit null
        self.language_mapping: Any = NOT_PRESENT
        self.direction_mapping: Any = NOT_PRESENT
        self.nest_value: str | None = None
        self.type_mapping: str | None = None

    def _key(self, include_protected: bool = True) -> tuple:
        return (
            self.iri_mapping,
            self.prefix_flag,
            self.protected if include_protected else None,
            self.reverse_property,
            self.base_url,
            _freeze(self.local_context),
            self.container_mapping,
            self.index_mapping,
            self.language_mapping,
            self.direction_mapping,
            self.nest_value,
            self.type_mapping,
        )

    def same_except_protected(self, other: "TermDefinition") -> bool:
        return self._key(False) == other._key(False)

    def copy(self) -> "TermDefinition":
        td = TermDefinition()
        for slot in self.__slots__:
            setattr(td, slot, getattr(self, slot))
        return td


def _freeze(v: Any) -> Any:
    if isinstance(v, dict):
        return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
    if isinstance(v, list):
        return tuple(_freeze(x) for x in v)
    return v


class Context:
    """Active context (reference lib/json/ld/context.ex:18-39)."""

    __slots__ = (
        "term_definitions",
        "base_iri",  # NOT_PRESENT | None | str
        "original_base_url",
        "api_base_iri",
        "vocabulary_mapping",
        "default_language",
        "base_direction",
        "inverse_context",
        "previous_context",
        "options",
        "_iri_cache",  # expand_iri memo (local-context-free calls only)
    )

    def __init__(self, options: JsonLdOptions | None = None, base_iri: Any = NOT_PRESENT):
        self.options = options or JsonLdOptions()
        self.term_definitions: dict[str, TermDefinition] = {}
        self.base_iri: Any = base_iri
        self.original_base_url: str | None = None
        self.api_base_iri: str | None = self.options.base
        self.vocabulary_mapping: str | None = None
        self.default_language: str | None = None
        self.base_direction: str | None = None
        self.inverse_context: dict | None = None
        self.previous_context: "Context | None" = None
        self._iri_cache: dict = {}

    # -- base IRI used for document-relative expansion -------------------
    @property
    def effective_base(self) -> str | None:
        if self.base_iri is NOT_PRESENT:
            return self.api_base_iri
        return self.base_iri

    def copy(self) -> "Context":
        c = Context.__new__(Context)
        c.options = self.options
        c.term_definitions = dict(self.term_definitions)
        c.base_iri = self.base_iri
        c.original_base_url = self.original_base_url
        c.api_base_iri = self.api_base_iri
        c.vocabulary_mapping = self.vocabulary_mapping
        c.default_language = self.default_language
        c.base_direction = self.base_direction
        c.inverse_context = None
        c.previous_context = self.previous_context
        c._iri_cache = {}
        return c

    def has_protected_terms(self) -> bool:
        return any(td.protected for td in self.term_definitions.values())

    # ---------------------------------------------------------------------
    # §4.1 Context Processing Algorithm
    # ---------------------------------------------------------------------
    def process(
        self,
        local_context: Any,
        base_url: str | None = None,
        *,
        remote_contexts: tuple[str, ...] = (),
        override_protected: bool = False,
        propagate: bool = True,
        validate_scoped_context: bool = True,
    ) -> "Context":
        options = self.options
        result = self.copy()
        result.inverse_context = None

        # 2. propagate from @propagate in a map context
        if isinstance(local_context, dict) and "@propagate" in local_context:
            p = local_context["@propagate"]
            if isinstance(p, bool):
                propagate = p

        # 3.
        if not propagate and result.previous_context is None:
            result.previous_context = self

        # 4.
        contexts = local_context if isinstance(local_context, list) else [local_context]

        for context in contexts:
            # 5.1 null context: reset
            if context is None:
                if not override_protected and result.has_protected_terms():
                    raise JsonLdError(
                        "invalid context nullification",
                        "attempt to clear a context with protected terms",
                    )
                prev = result
                result = Context(options)
                # spec §4.1 5.1.2: both base IRI and original base URL reset
                # to the active context's original base URL (may be null)
                result.base_iri = self.original_base_url
                result.original_base_url = self.original_base_url
                if not propagate:
                    result.previous_context = prev
                continue

            # 5.2 remote context by reference
            if isinstance(context, str):
                context_url = resolve(base_url, context)
                if not validate_scoped_context and context_url in remote_contexts:
                    continue
                if context_url in remote_contexts:
                    raise JsonLdError(
                        "context overflow", f"recursive context inclusion: {context_url}"
                    )
                if len(remote_contexts) >= options.max_contexts_loaded:
                    raise JsonLdError(
                        "context overflow",
                        f"more than {options.max_contexts_loaded} remote contexts",
                    )
                loaded = _load_context(options, context_url)
                result = result.process(
                    loaded["context"],
                    loaded["base_url"],
                    remote_contexts=remote_contexts + (context_url,),
                    override_protected=override_protected,
                    propagate=True,
                    validate_scoped_context=validate_scoped_context,
                )
                continue

            # 5.3
            if not isinstance(context, dict):
                raise JsonLdError(
                    "invalid local context", f"context must be null/string/map: {context!r}"
                )

            # 5.5 @version
            if "@version" in context:
                v = context["@version"]
                if v != 1.1:
                    raise JsonLdError("invalid @version value", repr(v))
                if options.processing_mode == "json-ld-1.0":
                    raise JsonLdError("processing mode conflict", "@version 1.1 in 1.0 mode")

            # 5.6 @import
            if "@import" in context:
                if options.processing_mode == "json-ld-1.0":
                    raise JsonLdError("invalid context entry", "@import in 1.0 mode")
                imp = context["@import"]
                if not isinstance(imp, str):
                    raise JsonLdError("invalid @import value", repr(imp))
                import_url = resolve(base_url, imp)
                loaded = _load_context(options, import_url)
                import_context = loaded["context"]
                if not isinstance(import_context, dict):
                    raise JsonLdError(
                        "invalid remote context", f"@import target not a map: {import_url}"
                    )
                if "@import" in import_context:
                    raise JsonLdError("invalid context entry", "@import inside imported context")
                merged = dict(import_context)
                merged.update(context)
                context = merged

            # 5.7 @base (only on the outermost, non-remote invocation)
            if "@base" in context and not remote_contexts:
                value = context["@base"]
                if value is None:
                    result.base_iri = None
                elif isinstance(value, str) and is_absolute_iri(value):
                    result.base_iri = value
                elif isinstance(value, str) and result.effective_base is not None:
                    result.base_iri = resolve(result.effective_base, value)
                else:
                    raise JsonLdError("invalid base IRI", repr(value))
                result._iri_cache.clear()

            # 5.8 @vocab
            if "@vocab" in context:
                value = context["@vocab"]
                if value is None:
                    result.vocabulary_mapping = None
                elif isinstance(value, str):
                    if is_blank_node_id(value) or is_absolute_iri(value) or value == "":
                        if (
                            options.processing_mode == "json-ld-1.0"
                            and value == ""
                        ):
                            raise JsonLdError("invalid vocab mapping", repr(value))
                        expanded = expand_iri(
                            result, value, vocab=True, document_relative=True
                        )
                        result.vocabulary_mapping = expanded
                    else:
                        if options.processing_mode == "json-ld-1.0":
                            raise JsonLdError("invalid vocab mapping", repr(value))
                        expanded = expand_iri(
                            result, value, vocab=True, document_relative=True
                        )
                        if not (
                            isinstance(expanded, str)
                            and (is_absolute_iri(expanded) or is_blank_node_id(expanded))
                        ):
                            raise JsonLdError("invalid vocab mapping", repr(value))
                        result.vocabulary_mapping = expanded
                else:
                    raise JsonLdError("invalid vocab mapping", repr(value))
                result._iri_cache.clear()

            # 5.9 @language
            if "@language" in context:
                value = context["@language"]
                if value is None:
                    result.default_language = None
                elif isinstance(value, str):
                    if not is_well_formed_language(value):
                        options.emit_warning(f"@language must be valid BCP47: {value!r}")
                    result.default_language = (
                        value.lower() if options.lowercase_language else value
                    )
                else:
                    raise JsonLdError("invalid default language", repr(value))
                result._iri_cache.clear()

            # 5.10 @direction
            if "@direction" in context:
                if options.processing_mode == "json-ld-1.0":
                    raise JsonLdError("invalid context entry", "@direction in 1.0 mode")
                value = context["@direction"]
                if value is None:
                    result.base_direction = None
                elif value in ("ltr", "rtl"):
                    result.base_direction = value
                else:
                    raise JsonLdError("invalid base direction", repr(value))
                result._iri_cache.clear()

            # 5.11 @propagate validation
            if "@propagate" in context:
                if options.processing_mode == "json-ld-1.0":
                    raise JsonLdError("invalid context entry", "@propagate in 1.0 mode")
                if not isinstance(context["@propagate"], bool):
                    raise JsonLdError(
                        "invalid @propagate value", repr(context["@propagate"])
                    )

            # 5.13 term definitions
            defined: dict[str, bool] = {}
            protected = context.get("@protected", False)
            if "@protected" in context and options.processing_mode == "json-ld-1.0":
                raise JsonLdError("invalid context entry", "@protected in 1.0 mode")
            if not isinstance(protected, bool):
                raise JsonLdError("invalid @protected value", repr(protected))
            for key in context:
                if key in (
                    "@base",
                    "@direction",
                    "@import",
                    "@language",
                    "@propagate",
                    "@protected",
                    "@version",
                    "@vocab",
                ):
                    continue
                create_term_definition(
                    result,
                    context,
                    key,
                    defined,
                    base_url=base_url,
                    protected=protected,
                    override_protected=override_protected,
                    remote_contexts=remote_contexts,
                )

        return result


def _load_context(options: JsonLdOptions, url: str) -> dict:
    """Dereference a remote context URL → {"context": ..., "base_url": ...}."""
    loader = options.document_loader
    if loader is None:
        raise JsonLdError("loading remote context failed", f"no document loader for {url}")
    try:
        remote = loader.load(url, options)
    except JsonLdError as e:
        raise JsonLdError("loading remote context failed", f"{url}: {e.message}")
    doc = remote.document
    if isinstance(doc, str):
        if remote.content_type in ("text/html", "application/xhtml+xml"):
            # HTML-served context: extract the ld+json script (ours —
            # the reference fails this case, remote-doc #t0013)
            from .remote import extract_html_document

            try:
                doc = extract_html_document(doc)
            except JsonLdError as e:
                raise JsonLdError("loading remote context failed", f"{url}: {e.message}")
        else:
            import json as _json

            try:
                doc = _json.loads(doc)
            except ValueError as e:
                raise JsonLdError("loading remote context failed", f"{url}: {e}")
    if not isinstance(doc, dict) or "@context" not in doc:
        raise JsonLdError("invalid remote context", f"no @context in {url}")
    return {"context": doc["@context"], "base_url": remote.document_url}


# ---------------------------------------------------------------------------
# §4.2 Create Term Definition
# ---------------------------------------------------------------------------

_TERM_DEFINITION_KEYS = frozenset(
    {
        "@id",
        "@reverse",
        "@type",
        "@container",
        "@context",
        "@direction",
        "@index",
        "@language",
        "@nest",
        "@prefix",
        "@protected",
    }
)

_CONTAINER_VALUES = frozenset(
    {"@graph", "@id", "@index", "@language", "@list", "@set", "@type"}
)


def create_term_definition(
    active: Context,
    local_context: dict,
    term: str,
    defined: dict[str, bool],
    *,
    base_url: str | None = None,
    protected: bool = False,
    override_protected: bool = False,
    remote_contexts: tuple[str, ...] = (),
) -> None:
    options = active.options

    # 1-2. cyclic detection
    if term in defined:
        if defined[term]:
            return
        raise JsonLdError("cyclic IRI mapping", term)
    if term == "":
        raise JsonLdError("invalid term definition", "empty term")
    defined[term] = False

    value = local_context[term]

    # 4. @type may be redefined in 1.1 with restricted form
    if term == "@type":
        if options.processing_mode == "json-ld-1.0":
            raise JsonLdError("keyword redefinition", "@type")
        if not isinstance(value, dict) or not value:
            raise JsonLdError("keyword redefinition", "@type")
        for k, v in value.items():
            if k == "@container" and v == "@set":
                continue
            if k == "@protected":
                continue
            raise JsonLdError("keyword redefinition", "@type")
    elif is_keyword(term):
        raise JsonLdError("keyword redefinition", term)
    elif has_keyword_form(term):
        options.emit_warning(f"term {term!r} looks like a keyword; ignored")
        return

    # 6.
    previous_definition = active.term_definitions.pop(term, None)
    active._iri_cache.clear()

    simple_term = False
    if value is None:
        value = {"@id": None}
    elif isinstance(value, str):
        value = {"@id": value}
        simple_term = True
    elif isinstance(value, dict):
        simple_term = False
    else:
        raise JsonLdError("invalid term definition", repr(value))

    definition = TermDefinition()
    # default protection comes from the LOCAL CONTEXT's @protected, not
    # only the caller's parameter (jsonld.js derives it the same way):
    # dependency-created terms (a compact-IRI prefix created from inside
    # expand_iri's re-expansion validation) must inherit the context's
    # protection, or a later context silently redefines them
    if (
        not protected
        and local_context.get("@protected") is True
        and options.processing_mode != "json-ld-1.0"
    ):
        protected = True
    definition.protected = protected

    # 11. @protected
    if "@protected" in value:
        p = value["@protected"]
        if options.processing_mode == "json-ld-1.0":
            raise JsonLdError("invalid term definition", "@protected in 1.0 mode")
        if not isinstance(p, bool):
            raise JsonLdError("invalid @protected value", repr(p))
        definition.protected = p

    # 12. @type
    if "@type" in value:
        t = value["@type"]
        if not isinstance(t, str):
            raise JsonLdError("invalid type mapping", repr(t))
        t = expand_iri(active, t, vocab=True, local_context=local_context, defined=defined)
        if t in ("@json", "@none"):
            if options.processing_mode == "json-ld-1.0":
                raise JsonLdError("invalid type mapping", repr(t))
        elif t not in ("@id", "@vocab") and not (
            isinstance(t, str) and is_absolute_iri(t)
        ):
            raise JsonLdError("invalid type mapping", repr(t))
        definition.type_mapping = t

    # 13. @reverse — does NOT short-circuit: index/context/language/nest/
    # prefix handling still applies (reference term_definition.ex:231-241
    # runs the full handler chain after handle_reverse_definition)
    is_reverse = "@reverse" in value
    if is_reverse:
        if "@id" in value or "@nest" in value:
            raise JsonLdError("invalid reverse property", term)
        rev = value["@reverse"]
        if not isinstance(rev, str):
            raise JsonLdError("invalid IRI mapping", repr(rev))
        if has_keyword_form(rev):
            options.emit_warning(f"@reverse value {rev!r} looks like a keyword")
            return
        iri = expand_iri(
            active, rev, vocab=True, local_context=local_context, defined=defined
        )
        if not (isinstance(iri, str) and (is_absolute_iri(iri) or is_blank_node_id(iri))):
            raise JsonLdError("invalid IRI mapping", repr(rev))
        definition.iri_mapping = iri
        if "@container" in value:
            c = value["@container"]
            if c not in ("@set", "@index", None):
                raise JsonLdError("invalid reverse property", repr(c))
            if c is not None:
                definition.container_mapping = frozenset({c})
        definition.reverse_property = True

    # 14. @id
    if is_reverse:
        pass
    elif "@id" in value and value["@id"] != term:
        idv = value["@id"]
        if idv is None:
            # keep term mapped to null: explicitly decouples from @vocab
            definition.iri_mapping = None
        else:
            if not isinstance(idv, str):
                raise JsonLdError("invalid IRI mapping", repr(idv))
            if not is_keyword(idv) and has_keyword_form(idv):
                options.emit_warning(f"@id value {idv!r} looks like a keyword; term ignored")
                return
            iri = expand_iri(
                active, idv, vocab=True, local_context=local_context, defined=defined
            )
            if not (
                is_keyword(iri)
                or (isinstance(iri, str) and (is_absolute_iri(iri) or is_blank_node_id(iri)))
            ):
                raise JsonLdError("invalid IRI mapping", repr(idv))
            if iri == "@context":
                raise JsonLdError("invalid keyword alias", "@context")
            definition.iri_mapping = iri
            # interior colon only — the TRAILING char is excluded for every
            # term length (ref slice(1..-2)); the old 2-char special case
            # made "a:" spuriously fail re-expansion validation while
            # "ab:" passed
            if ":" in term[1:-1] or "/" in term:
                defined[term] = True
                reexpanded = expand_iri(
                    active, term, vocab=True, local_context=local_context, defined=defined
                )
                if reexpanded != iri:
                    raise JsonLdError(
                        "invalid IRI mapping", f"{term!r} expands inconsistently"
                    )
            elif simple_term and isinstance(iri, str) and (
                (iri and iri[-1] in _GEN_DELIMS) or is_blank_node_id(iri)
            ):
                definition.prefix_flag = True
    elif ":" in term[1:]:
        # 15. compact-IRI-shaped term
        parts = compact_iri_parts(term)
        if parts:
            prefix, suffix = parts
            if prefix in local_context:
                # thread the protection flags through (ref term_definition
                # .ex:494-503): a prefix created as a DEPENDENCY of a
                # @protected term must itself be protected, or a later
                # context silently redefines it
                create_term_definition(
                    active,
                    local_context,
                    prefix,
                    defined,
                    base_url=base_url,
                    protected=protected,
                    override_protected=override_protected,
                    remote_contexts=remote_contexts,
                )
            prefix_def = active.term_definitions.get(prefix)
            if prefix_def is not None and prefix_def.iri_mapping:
                definition.iri_mapping = prefix_def.iri_mapping + suffix
            else:
                definition.iri_mapping = term
        else:
            definition.iri_mapping = term
    elif "/" in term:
        # 16. relative-IRI-shaped term — expanded WITHOUT the local context
        # (avoids bogus cyclic-IRI-mapping; cf. expand test #ter49)
        iri = expand_iri(active, term, vocab=True)
        if not (isinstance(iri, str) and is_absolute_iri(iri)):
            raise JsonLdError("invalid IRI mapping", term)
        definition.iri_mapping = iri
    elif term == "@type":
        definition.iri_mapping = "@type"
    else:
        # 18.
        if active.vocabulary_mapping is None:
            raise JsonLdError("invalid IRI mapping", f"no vocab mapping for {term!r}")
        definition.iri_mapping = active.vocabulary_mapping + term

    # 19. @container (reverse already validated its restricted form)
    if "@container" in value and not is_reverse:
        container = value["@container"]
        definition.container_mapping = _validate_container(container, options)
        if "@type" in definition.container_mapping:
            tm = definition.type_mapping
            if tm is None:
                definition.type_mapping = "@id"
            elif tm not in ("@id", "@vocab"):
                raise JsonLdError("invalid type mapping", repr(tm))

    # 20. @index
    if "@index" in value:
        if options.processing_mode == "json-ld-1.0" or "@index" not in definition.container_mapping:
            raise JsonLdError("invalid term definition", "@index without @container: @index")
        idx = value["@index"]
        if not isinstance(idx, str):
            raise JsonLdError("invalid term definition", repr(idx))
        expanded_idx = expand_iri(active, idx, vocab=True)
        if not (isinstance(expanded_idx, str) and is_absolute_iri(expanded_idx)):
            raise JsonLdError("invalid term definition", repr(idx))
        definition.index_mapping = idx

    # 21. scoped @context
    if "@context" in value:
        if options.processing_mode == "json-ld-1.0":
            raise JsonLdError("invalid term definition", "scoped @context in 1.0 mode")
        scoped = value["@context"]
        try:
            active.process(
                scoped,
                base_url,
                override_protected=True,
                remote_contexts=remote_contexts,
                validate_scoped_context=False,
            )
        except JsonLdError as e:
            raise JsonLdError("invalid scoped context", f"{term!r}: {e.message}")
        definition.local_context = scoped
        definition.base_url = base_url

    # 22. @language
    if "@language" in value and "@type" not in value:
        lang = value["@language"]
        if lang is None:
            definition.language_mapping = None
        elif isinstance(lang, str):
            if not is_well_formed_language(lang):
                options.emit_warning(f"@language must be valid BCP47: {lang!r}")
            definition.language_mapping = (
                lang.lower() if options.lowercase_language else lang
            )
        else:
            raise JsonLdError("invalid language mapping", repr(lang))

    # 23. @direction
    if "@direction" in value and "@type" not in value:
        d = value["@direction"]
        if options.processing_mode == "json-ld-1.0":
            raise JsonLdError("invalid term definition", "@direction in 1.0 mode")
        if d is None or d in ("ltr", "rtl"):
            definition.direction_mapping = d
        else:
            raise JsonLdError("invalid base direction", repr(d))

    # 24. @nest
    if "@nest" in value:
        if options.processing_mode == "json-ld-1.0":
            raise JsonLdError("invalid term definition", "@nest in 1.0 mode")
        nest = value["@nest"]
        if not isinstance(nest, str) or (nest != "@nest" and is_keyword(nest)):
            raise JsonLdError("invalid @nest value", repr(nest))
        definition.nest_value = nest

    # 25. @prefix
    if "@prefix" in value:
        if (
            options.processing_mode == "json-ld-1.0"
            or ":" in term
            or "/" in term
        ):
            raise JsonLdError("invalid term definition", "@prefix on compound term")
        p = value["@prefix"]
        if not isinstance(p, bool):
            raise JsonLdError("invalid @prefix value", repr(p))
        definition.prefix_flag = p
        if definition.prefix_flag and is_keyword(definition.iri_mapping):
            raise JsonLdError("invalid term definition", "prefix maps to keyword")

    # 26. no other keys
    extra = set(value) - _TERM_DEFINITION_KEYS
    if extra:
        raise JsonLdError("invalid term definition", f"unexpected keys {sorted(extra)}")

    _finalize(active, term, definition, previous_definition, defined, override_protected)


def _finalize(
    active: Context,
    term: str,
    definition: TermDefinition,
    previous: TermDefinition | None,
    defined: dict[str, bool],
    override_protected: bool,
) -> None:
    # 27. protected redefinition check
    if not override_protected and previous is not None and previous.protected:
        if not definition.same_except_protected(previous):
            raise JsonLdError("protected term redefinition", term)
        definition = previous
    active.term_definitions[term] = definition
    active._iri_cache.clear()
    defined[term] = True


def _validate_container(container: Any, options: JsonLdOptions) -> frozenset[str]:
    values = container if isinstance(container, list) else [container]
    if options.processing_mode == "json-ld-1.0":
        if isinstance(container, list) or container in ("@graph", "@id", "@type") or not isinstance(container, str):
            raise JsonLdError("invalid container mapping", repr(container))
    for v in values:
        if not isinstance(v, str) or v not in _CONTAINER_VALUES:
            raise JsonLdError("invalid container mapping", repr(container))
    s = frozenset(values)
    if len(s) != len(values):
        raise JsonLdError("invalid container mapping", repr(container))
    if len(s) == 1:
        return s
    if "@graph" in s:
        if s <= {"@graph", "@id", "@set"} or s <= {"@graph", "@index", "@set"}:
            if "@id" in s and "@index" in s:
                raise JsonLdError("invalid container mapping", repr(container))
            return s
        raise JsonLdError("invalid container mapping", repr(container))
    if "@set" in s and len(s) == 2:
        other = next(iter(s - {"@set"}))
        if other in ("@index", "@id", "@type", "@language", "@graph"):
            return s
    raise JsonLdError("invalid container mapping", repr(container))


# ---------------------------------------------------------------------------
# §5.3 IRI Expansion
# ---------------------------------------------------------------------------


def expand_iri(
    active: Context,
    value: str | None,
    *,
    document_relative: bool = False,
    vocab: bool = False,
    local_context: dict | None = None,
    defined: dict[str, bool] | None = None,
) -> str | None:
    if value is None or is_keyword(value):
        return value
    # memoize local-context-free expansions per (frozen) active context —
    # keys/types repeat across a document's nodes; term definitions only
    # mutate while a local_context is being processed, which bypasses this
    if local_context is None:
        key = (value, vocab, document_relative)
        cached = active._iri_cache.get(key)
        if cached is not None:
            return cached if cached is not False else None
        result = _expand_iri_uncached(
            active, value, document_relative=document_relative, vocab=vocab
        )
        active._iri_cache[key] = result if result is not None else False
        return result
    return _expand_iri_uncached(
        active,
        value,
        document_relative=document_relative,
        vocab=vocab,
        local_context=local_context,
        defined=defined,
    )


def _expand_iri_uncached(
    active: Context,
    value: str,
    *,
    document_relative: bool = False,
    vocab: bool = False,
    local_context: dict | None = None,
    defined: dict[str, bool] | None = None,
) -> str | None:
    if has_keyword_form(value):
        active.options.emit_warning(f"value {value!r} looks like a keyword; ignored")
        return None
    # 3. on-demand term creation against the local context being processed
    if local_context is not None and value in local_context and defined is not None and defined.get(value) is not True:
        create_term_definition(active, local_context, value, defined)
    td = active.term_definitions.get(value)
    # 4. keyword alias
    if td is not None and is_keyword(td.iri_mapping):
        return td.iri_mapping
    # 5. vocab-relative term lookup
    if vocab and td is not None:
        return td.iri_mapping  # may be None (explicitly decoupled term)
    # 6. compact IRI
    if ":" in value[1:]:
        idx = value.index(":", 1)
        prefix, suffix = value[:idx], value[idx + 1 :]
        if prefix == "_" or suffix.startswith("//"):
            return value
        if (
            local_context is not None
            and prefix in local_context
            and defined is not None
            and defined.get(prefix) is not True
        ):
            create_term_definition(active, local_context, prefix, defined)
        pd = active.term_definitions.get(prefix)
        if pd is not None and pd.iri_mapping and pd.prefix_flag:
            return pd.iri_mapping + suffix
        if is_absolute_iri(value):
            return value
    # 7. vocab mapping
    if vocab and active.vocabulary_mapping is not None:
        return active.vocabulary_mapping + value
    # 8. document relative
    if document_relative:
        base = active.effective_base
        if base is not None:
            return resolve(base, value)
    return value
