"""Document loaders.

The reference's loader is an HTTP behaviour (`JSON.LD.DocumentLoader`,
reference lib/json/ld/document_loader.ex:11-14) with a pluggable client.
This sandbox has no network, so the engine ships:

- ``StaticLoader`` — an in-memory URL→document map (tests, offline registries);
- ``FileLoader`` — maps a URL prefix onto a local directory (used by the W3C
  manifest harness to serve ``https://w3c.github.io/json-ld-api/tests/...``
  from the vendored suite);
- ``CachingLoader`` — LRU wrapper; in the Ray pipeline one lives per resolver
  actor (the reference re-fetches every time — its biggest scalability gap,
  cf. SURVEY.md §2.3).

All loaders return ``RemoteDocument`` (reference
lib/json/ld/document_loader/remote_document.ex:36-44).
"""

from __future__ import annotations

import json
import os
from collections import OrderedDict
from dataclasses import dataclass
from typing import Any, Protocol

from .errors import JsonLdError


@dataclass
class RemoteDocument:
    document: Any
    document_url: str
    content_type: str = "application/ld+json"
    context_url: str | None = None
    profile: str | None = None


class DocumentLoader(Protocol):
    def load(self, url: str, options: Any = None) -> RemoteDocument: ...


class StaticLoader:
    """URL → already-parsed JSON document. Deterministic, no I/O."""

    def __init__(self, documents: dict[str, Any] | None = None):
        self.documents = dict(documents or {})

    def add(self, url: str, document: Any) -> None:
        self.documents[url] = document

    def load(self, url: str, options: Any = None) -> RemoteDocument:
        # fragments select content WITHIN a document (HTML scripts) — the
        # registry is keyed by base URL, like every other loader here
        base = url if url in self.documents else url.split("#", 1)[0]
        if base not in self.documents:
            raise JsonLdError("loading document failed", f"not in static registry: {url}")
        return RemoteDocument(document=self.documents[base], document_url=base)


class FileLoader:
    """Serve ``url_prefix + rel`` from ``root + rel`` (read-only).
    Content type follows the file extension; HTML bodies are returned raw
    (script extraction happens at the API layer, where the URL fragment
    and ``extractAllScripts`` are known)."""

    _CONTENT_TYPES = {
        "jsonld": "application/ld+json",
        "json": "application/json",
        "html": "text/html",
        "xhtml": "application/xhtml+xml",
    }

    def __init__(self, url_prefix: str, root: str):
        self.url_prefix = url_prefix.rstrip("/") + "/"
        self.root = root

    def load(self, url: str, options: Any = None) -> RemoteDocument:
        base = url.split("#", 1)[0]
        if not base.startswith(self.url_prefix):
            raise JsonLdError("loading document failed", f"outside prefix: {url}")
        rel = base[len(self.url_prefix) :]
        path = os.path.realpath(os.path.join(self.root, rel))
        # containment check: '..' segments (or symlinks) in the URL tail
        # must not escape the serve root
        root_real = os.path.realpath(self.root)
        if not (path == root_real or path.startswith(root_real + os.sep)):
            raise JsonLdError("loading document failed", f"outside serve root: {url}")
        if not os.path.isfile(path):
            raise JsonLdError("loading document failed", f"no such file: {url}")
        ext = rel.rsplit(".", 1)[-1].lower() if "." in rel else ""
        content_type = self._CONTENT_TYPES.get(ext, "application/ld+json")
        with open(path, "r", encoding="utf-8") as f:
            text = f.read()
        if content_type in ("text/html", "application/xhtml+xml"):
            return RemoteDocument(document=text, document_url=base, content_type=content_type)
        try:
            doc = json.loads(text)
        except ValueError as e:
            raise JsonLdError("loading document failed", f"bad JSON at {url}: {e}")
        return RemoteDocument(document=doc, document_url=base, content_type=content_type)


class CachingLoader:
    """Bounded LRU over any loader. Caches successes AND failures (as the
    error code) so hot bad URLs don't hammer the backend."""

    def __init__(self, inner: DocumentLoader, maxsize: int = 1024):
        self.inner = inner
        self.maxsize = maxsize
        self._cache: OrderedDict[str, tuple[bool, Any]] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def load(self, url: str, options: Any = None) -> RemoteDocument:
        if url in self._cache:
            self.hits += 1
            self._cache.move_to_end(url)
            ok, value = self._cache[url]
            if ok:
                return value
            raise JsonLdError(value[0], value[1])
        self.misses += 1
        try:
            doc = self.inner.load(url, options)
        except JsonLdError as e:
            self._store(url, (False, (e.code, e.message)))
            raise
        self._store(url, (True, doc))
        return doc

    def _store(self, url: str, entry: tuple[bool, Any]) -> None:
        self._cache[url] = entry
        if len(self._cache) > self.maxsize:
            self._cache.popitem(last=False)
