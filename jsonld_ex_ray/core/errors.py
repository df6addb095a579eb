"""JSON-LD error taxonomy.

Single exception class carrying the spec error code string, mirroring the
reference's error surface (reference: lib/json/ld/exceptions.ex:1-543 defines
~50 spec codes). In the Ray pipeline these never abort a job: per-document
failures are captured as rows in an ``errors`` side output.
"""

from __future__ import annotations


class JsonLdError(Exception):
    """A JSON-LD spec error with its registered error code string.

    Codes are the JSON-LD 1.1 API error codes, e.g. ``"invalid @id value"``,
    ``"colliding keywords"``, ``"context overflow"``.
    """

    def __init__(self, code: str, message: str = ""):
        self.code = code
        self.message = message or code
        super().__init__(f"{code}: {message}" if message else code)


# The registered spec error codes (JSON-LD 1.1 API §C; cf. reference
# lib/json/ld/exceptions.ex). Kept as a set for test assertions.
ERROR_CODES = frozenset(
    {
        "colliding keywords",
        "conflicting indexes",
        "context overflow",
        "cyclic IRI mapping",
        "invalid @id value",
        "invalid @import value",
        "invalid @included value",
        "invalid @index value",
        "invalid @nest value",
        "invalid @prefix value",
        "invalid @propagate value",
        "invalid @protected value",
        "invalid @reverse value",
        "invalid @version value",
        "invalid base direction",
        "invalid base IRI",
        "invalid container mapping",
        "invalid context entry",
        "invalid context nullification",
        "invalid default language",
        "invalid IRI mapping",
        "invalid JSON literal",
        "invalid keyword alias",
        "invalid language map value",
        "invalid language mapping",
        "invalid language-tagged string",
        "invalid language-tagged value",
        "invalid local context",
        "invalid remote context",
        "invalid reverse property",
        "invalid reverse property map",
        "invalid reverse property value",
        "invalid reverse value",
        "invalid scoped context",
        "invalid script element",
        "invalid set or list object",
        "invalid term definition",
        "invalid type mapping",
        "invalid type value",
        "invalid typed value",
        "invalid value object",
        "invalid value object value",
        "invalid vocab mapping",
        "IRI confused with prefix",
        "keyword redefinition",
        "loading document failed",
        "loading remote context failed",
        "multiple context link headers",
        "processing mode conflict",
        "protected term redefinition",
    }
)
