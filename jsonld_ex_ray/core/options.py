"""Processing options (JSON-LD 1.1 API §6.1 ``JsonLdOptions``).

Mirrors the reference option surface (lib/json/ld/options.ex:38-96): base,
compact_arrays, compact_to_relative, document_loader, expand_context,
extract_all_scripts, ordered, use_rdf_type, use_native_types, rdf_direction,
produce_generalized_rdf, processing_mode, frame_expansion, lowercase_language,
warn. Frozen so instances can be captured in Ray task closures / actor ctors.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, replace
from typing import Any, Callable


@dataclass(frozen=True)
class JsonLdOptions:
    base: str | None = None
    compact_arrays: bool = True
    compact_to_relative: bool = True
    document_loader: Any = None  # loader.DocumentLoader protocol
    expand_context: Any = None
    extract_all_scripts: bool = False
    frame_expansion: bool = False
    ordered: bool = False
    processing_mode: str = "json-ld-1.1"
    produce_generalized_rdf: bool = False
    rdf_direction: str | None = None  # None | "i18n-datatype" | "compound-literal"
    use_native_types: bool = False
    use_rdf_type: bool = False
    # framing (json-ld11-framing §2.1 JsonLdOptions additions; the
    # reference has no framing, so these follow the spec defaults):
    embed: str = "@once"
    explicit: bool = False
    omit_default: bool = False
    omit_graph: bool | None = None  # None → True in json-ld-1.1
    require_all: bool = False
    frame_default: bool = False  # False → frame the @merged graph
    # implementation-defined (reference parity):
    lowercase_language: bool = False
    warn: str | Callable[[str], None] = "ignore"  # ignore | log | raise | callable
    max_contexts_loaded: int = 50  # reference lib/json/ld/context.ex:41
    max_redirects: int = 5

    def with_(self, **kw: Any) -> "JsonLdOptions":
        return replace(self, **kw)

    def emit_warning(self, message: str) -> None:
        w = self.warn
        if w == "ignore":
            return
        if w == "raise":
            raise JsonLdWarningError(message)
        if callable(w):
            w(message)
            return
        warnings.warn(message, stacklevel=2)


class JsonLdWarningError(Exception):
    pass


def to_options(value: JsonLdOptions | dict | None) -> JsonLdOptions:
    if value is None:
        return JsonLdOptions()
    if isinstance(value, JsonLdOptions):
        return value
    return JsonLdOptions(**value)
