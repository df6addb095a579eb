"""Remote-document semantics over a simulated HTTP layer.

Mirrors the reference's loader behavior (lib/json/ld/document_loader/
remote_document.ex:60-261): content-type dispatch (``application/ld+json``
/ ``*+json`` / ``application/json``), Link-header ``json-ld#context``
discovery (multiple → error), Link-header ``rel=alternate`` redirect to a
JSON-LD representation, redirect following with a cap (default 5,
default_client.ex:21-23), and — beyond the reference's scope — HTML
``<script type="application/ld+json">`` extraction for HTML documents and
HTML-served contexts.

No network exists in this sandbox (or in the pipeline's workers): the
transport is a pluggable ``fetch`` callable returning ``SimResponse``.
Tests drive it from the W3C remote-doc manifest's declarative HTTP options.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from .errors import JsonLdError
from .iri import resolve
from .loader import RemoteDocument

JSONLD_CONTEXT_REL = "http://www.w3.org/ns/json-ld#context"

_LINK_RE = re.compile(r'<([^>]*)>((?:\s*;\s*[a-zA-Z0-9_\-]+\s*=\s*(?:"[^"]*"|[^;,\s]+))*)')
_PARAM_RE = re.compile(r';\s*([a-zA-Z0-9_\-]+)\s*=\s*(?:"([^"]*)"|([^;,\s]+))')


@dataclass
class SimResponse:
    status: int = 200
    content_type: str = "application/ld+json"
    body: str = ""
    link_headers: list[str] = field(default_factory=list)
    location: str | None = None  # redirect target


def parse_link_header(value: str) -> list[dict]:
    """Parse an HTTP Link header into [{target, rel, type, ...}]
    (reference remote_document.ex:199-261)."""
    links = []
    for m in _LINK_RE.finditer(value):
        target = m.group(1)
        params = {}
        for pm in _PARAM_RE.finditer(m.group(2) or ""):
            params[pm.group(1).lower()] = pm.group(2) if pm.group(2) is not None else pm.group(3)
        links.append({"target": target, **params})
    return links


_SCRIPT_TAG_RE = re.compile(r"<script\b([^>]*)>(.*?)</script\s*>", re.IGNORECASE | re.DOTALL)
_TYPE_ATTR_RE = re.compile(
    # the media type must END or be followed by ';parameters' — a bare
    # prefix match would accept types like application/ld+json-ext
    r"""type\s*=\s*["']application/ld\+json\s*(?:;[^"']*)?["']""", re.IGNORECASE
)
_ID_ATTR_RE = re.compile(r"""id\s*=\s*["']([^"']*)["']""", re.IGNORECASE)
_BASE_TAG_RE = re.compile(r"""<base\b[^>]*href\s*=\s*["']([^"']*)["']""", re.IGNORECASE)


def html_base_href(body: str) -> str | None:
    m = _BASE_TAG_RE.search(body)
    return m.group(1) if m else None


def extract_html_document(
    body: str, fragment: str | None = None, extract_all: bool = False
):
    """HTML JSON-LD script extraction (API §6; beyond the reference's scope,
    README.md:31): fragment selects a script by ``id``; ``extractAllScripts``
    merges every script (arrays concatenated); otherwise the first script.
    Selected scripts with invalid JSON raise ``invalid script element``."""
    scripts: list[tuple[str | None, str]] = []
    for m in _SCRIPT_TAG_RE.finditer(body):
        attrs, content = m.group(1), m.group(2)
        if not _TYPE_ATTR_RE.search(attrs):
            continue
        idm = _ID_ATTR_RE.search(attrs)
        scripts.append((idm.group(1) if idm else None, content.strip()))

    def parse(block: str):
        try:
            return json.loads(block)
        except ValueError as e:
            raise JsonLdError("invalid script element", str(e))

    if fragment:
        for sid, content in scripts:
            if sid == fragment:
                return parse(content)
        raise JsonLdError("loading document failed", f"no script with id {fragment!r}")
    if not scripts:
        if extract_all:
            # extracting all: no content → empty array (html #te007/#tr007)
            return []
        # single-script mode: absence is an error in expand (#te006) but
        # tolerated as empty by toRdf (#tr006) — see api.to_rdf
        raise JsonLdError("loading document failed", "no ld+json script in HTML")
    if extract_all:
        merged: list = []
        for _, content in scripts:
            d = parse(content)
            merged.extend(d if isinstance(d, list) else [d])
        return merged
    return parse(scripts[0][1])


def _rel_matches(link: dict, rel: str) -> bool:
    """RFC 8288 rel matching: the attribute is a whitespace-separated,
    case-insensitive list of relation types."""
    return rel.lower() in (link.get("rel") or "").lower().split()


_PROFILE_RE = re.compile(r'profile="?([^;"]+)"?')


def _profile_of(content_type: str) -> str | None:
    """Profile parameter of a content-type header (reference
    remote_document.ex:186-197)."""
    m = _PROFILE_RE.search(content_type or "")
    return m.group(1) if m else None


class HTTPSemanticsLoader:
    """Shared HTTP dispatch semantics over an abstract ``_get`` transport
    (reference remote_document.ex:60-261): content-type dispatch,
    Link-header context discovery, rel=alternate following, redirect cap
    + loop detection, HTML passthrough for script extraction."""

    max_redirects: int = 5
    # accepted for constructor compatibility only: HTML script extraction
    # happens at the API layer (api.py), where the URL fragment and
    # options.extract_all_scripts are in scope — loaders return raw HTML
    extract_all_scripts: bool = False

    def _get(self, url: str) -> SimResponse:  # pragma: no cover - abstract
        raise NotImplementedError

    def load(self, url: str, options=None) -> RemoteDocument:
        seen: list[str] = []
        current = url
        for _ in range(self.max_redirects + 1):
            if current in seen:
                raise JsonLdError("loading document failed", f"redirect loop at {current}")
            seen.append(current)
            resp = self._get(current)

            # HTTP redirects — a 3xx WITHOUT a Location is a protocol
            # error, never a document (an empty body would otherwise
            # fall through to content-type dispatch and json.loads(''))
            if resp.status in (301, 302, 303, 307, 308):
                if not resp.location:
                    raise JsonLdError(
                        "loading document failed",
                        f"redirect without Location at {current}",
                    )
                current = resolve(current, resp.location)
                continue

            ct = resp.content_type.split(";")[0].strip().lower()
            links = [
                link
                for header in resp.link_headers
                for link in parse_link_header(header)
            ]

            def parse_body(body: str):
                try:
                    return json.loads(body)
                except ValueError as e:
                    # raw JSONDecodeError would escape every JsonLdError-
                    # only handler (context loading, failure caching)
                    raise JsonLdError(
                        "loading document failed", f"invalid JSON body at {current}: {e}"
                    )

            if ct == "application/ld+json":
                return RemoteDocument(
                    document=parse_body(resp.body),
                    document_url=current,
                    content_type=ct,
                    profile=_profile_of(resp.content_type),
                )
            if ct == "application/json" or ct.endswith("+json"):
                context_links = [l for l in links if _rel_matches(l, JSONLD_CONTEXT_REL)]
                if len(context_links) > 1:
                    raise JsonLdError("multiple context link headers", current)
                context_url = (
                    resolve(current, context_links[0]["target"]) if context_links else None
                )
                return RemoteDocument(
                    document=parse_body(resp.body),
                    document_url=current,
                    content_type=ct,
                    context_url=context_url,
                )

            # non-JSON: follow rel=alternate ld+json representation
            alternates = [
                l
                for l in links
                if _rel_matches(l, "alternate") and l.get("type") == "application/ld+json"
            ]
            if alternates:
                current = resolve(current, alternates[0]["target"])
                continue

            if ct in ("text/html", "application/xhtml+xml"):
                # raw HTML travels to the consumer: the API layer extracts
                # with the URL fragment + extractAllScripts in scope, the
                # context loader extracts @context-bearing scripts
                return RemoteDocument(
                    document=resp.body,
                    document_url=current,
                    content_type=ct,
                )

            raise JsonLdError(
                "loading document failed", f"unusable content type {ct!r} at {current}"
            )
        raise JsonLdError("loading document failed", f"too many redirects from {url}")


class SimulatedHTTPLoader(HTTPSemanticsLoader):
    """DocumentLoader over a fake HTTP transport.

    ``responses``: url → SimResponse. URLs not present 404. Tests drive it
    from the W3C remote-doc manifest's declarative HTTP options;
    ``HttpLoader`` is the real-transport sibling."""

    def __init__(
        self,
        responses: dict[str, SimResponse],
        max_redirects: int = 5,
        extract_all_scripts: bool = False,
    ):
        self.responses = responses
        self.max_redirects = max_redirects
        self.extract_all_scripts = extract_all_scripts

    def _get(self, url: str) -> SimResponse:
        base = url.split("#", 1)[0]
        resp = self.responses.get(base)
        if resp is None:
            raise JsonLdError("loading document failed", f"404: {url}")
        return resp


class HttpLoader(HTTPSemanticsLoader):
    """Real HTTP ``DocumentLoader`` (urllib, stdlib-only) behind the same
    dispatch semantics — reference default_client.ex:21-34 +
    remote_document.ex:154-173: accept header (with optional request
    profile), 5-redirect cap enforced by the shared loop (urllib's
    auto-redirect is disabled so loop detection and the cap apply).

    Only constructed explicitly — nothing in the offline pipeline or test
    suite reaches the network by default."""

    def __init__(
        self,
        max_redirects: int = 5,
        extract_all_scripts: bool = False,
        timeout: float = 30.0,
        request_profile: str | list[str] | None = None,
    ):
        self.max_redirects = max_redirects
        self.extract_all_scripts = extract_all_scripts
        self.timeout = timeout
        self.request_profile = request_profile

    def _accept_header(self) -> str:
        if self.request_profile:
            profiles = (
                self.request_profile
                if isinstance(self.request_profile, list)
                else [self.request_profile]
            )
            return (
                f'application/ld+json;profile="{" ".join(profiles)}", application/json'
            )
        return "application/ld+json, application/json"

    def _get(self, url: str) -> SimResponse:
        import urllib.error
        import urllib.request
        from urllib.parse import urlsplit

        # scheme allowlist at EVERY fetch (redirect targets included):
        # urllib's default opener carries a FileHandler, so a hostile
        # 'Location: file:///etc/passwd' would otherwise read local files
        scheme = urlsplit(url).scheme.lower()
        if scheme not in ("http", "https"):
            raise JsonLdError(
                "loading document failed", f"unsupported URL scheme {scheme!r} at {url}"
            )

        class _NoRedirect(urllib.request.HTTPRedirectHandler):
            def redirect_request(self, req, fp, code, msg, headers, newurl):
                return None  # surface 3xx to the dispatch loop

        opener = urllib.request.build_opener(_NoRedirect)
        req = urllib.request.Request(
            url.split("#", 1)[0], headers={"Accept": self._accept_header()}
        )
        try:
            resp = opener.open(req, timeout=self.timeout)
        except urllib.error.HTTPError as e:
            if e.code in (301, 302, 303, 307, 308):
                loc = e.headers.get("Location")
                if not loc:
                    raise JsonLdError(
                        "loading document failed", f"redirect without Location at {url}"
                    )
                return SimResponse(status=e.code, location=loc)
            raise JsonLdError("loading document failed", f"HTTP {e.code} at {url}")
        except (urllib.error.URLError, OSError, TimeoutError) as e:
            raise JsonLdError("loading document failed", f"HTTP request failed: {e}")
        with resp:
            headers = resp.headers
            charset = headers.get_content_charset() or "utf-8"
            body = resp.read().decode(charset, errors="replace")
            return SimResponse(
                status=resp.status,
                content_type=headers.get("Content-Type", "application/octet-stream"),
                body=body,
                link_headers=headers.get_all("Link") or [],
            )
