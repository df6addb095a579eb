"""W3C JSON-LD 1.1 test-suite harness (manifest-driven, offline).

Mirrors the reference's runner (test/support/test_suite.ex:80-166): manifests
are read from the vendored read-only suite at
``/root/reference/test/data/json-ld-api-tests``; remote URLs under the suite
base are served by a FileLoader. JSON-LD-1.0-only cases are skipped, as the
reference skips them (test_suite.ex:159-166); ``produceGeneralizedRdf`` cases
are skipped (reference to_rdf_test.exs:60-65).
"""

from __future__ import annotations

import json
import os

from jsonld_ex_ray.core.loader import CachingLoader, FileLoader
from jsonld_ex_ray.core.options import JsonLdOptions

SUITE_DIR = "/root/reference/test/data/json-ld-api-tests"
SUITE_BASE = "https://w3c.github.io/json-ld-api/tests/"


def suite_available() -> bool:
    return os.path.isdir(SUITE_DIR)


def load_manifest(name: str) -> list[dict]:
    with open(os.path.join(SUITE_DIR, f"{name}-manifest.jsonld")) as f:
        return json.load(f)["sequence"]


def make_loader() -> CachingLoader:
    return CachingLoader(FileLoader(SUITE_BASE, SUITE_DIR))


_EXT_CONTENT_TYPES = {
    "jsonld": "application/ld+json",
    "json": "application/json",
    "html": "text/html",
}


def make_remote_doc_loader(case: dict):
    """Build a SimulatedHTTPLoader from a remote-doc case's declarative
    HTTP options (contentType / httpStatus / redirectTo / httpLink),
    serving every other suite file from disk by extension."""
    from jsonld_ex_ray.core.errors import JsonLdError
    from jsonld_ex_ray.core.remote import SimResponse, SimulatedHTTPLoader

    opt = case.get("option", {})
    input_url = SUITE_BASE + case["input"]
    ext = case["input"].rsplit(".", 1)[-1]
    links = opt.get("httpLink", [])
    if isinstance(links, str):
        links = [links]
    responses = {}
    if opt.get("redirectTo"):
        responses[input_url] = SimResponse(
            status=opt.get("httpStatus", 301),
            location=SUITE_BASE + opt["redirectTo"],
        )
    else:
        path = os.path.join(SUITE_DIR, case["input"])
        body = open(path).read() if os.path.isfile(path) else None
        if body is None:
            # missing file → the loader's 404 path (#t0008)
            responses[input_url] = None
        else:
            responses[input_url] = SimResponse(
                content_type=opt.get("contentType", _EXT_CONTENT_TYPES.get(ext, "text/plain")),
                body=body,
                link_headers=links,
            )

    class Loader(SimulatedHTTPLoader):
        def _get(self, url):
            base = url.split("#", 1)[0]
            if base in self.responses:
                resp = self.responses[base]
                if resp is None:
                    raise JsonLdError("loading document failed", f"404: {url}")
                return resp
            if base.startswith(SUITE_BASE):
                rel = base[len(SUITE_BASE):]
                p = os.path.join(SUITE_DIR, rel)
                if os.path.isfile(p):
                    e = rel.rsplit(".", 1)[-1]
                    return SimResponse(
                        content_type=_EXT_CONTENT_TYPES.get(e, "text/plain"),
                        body=open(p).read(),
                    )
            raise JsonLdError("loading document failed", f"404: {url}")

    return Loader(responses)


def case_options(case: dict, loader) -> JsonLdOptions:
    opt = case.get("option", {})
    kwargs = {
        "document_loader": loader,
        "base": opt.get("base", SUITE_BASE + case["input"]),
        "processing_mode": opt.get("processingMode", "json-ld-1.1"),
        "rdf_direction": opt.get("rdfDirection"),
        "use_native_types": opt.get("useNativeTypes", False),
        "use_rdf_type": opt.get("useRdfType", False),
        "produce_generalized_rdf": opt.get("produceGeneralizedRdf", False),
        "compact_arrays": opt.get("compactArrays", True),
        "compact_to_relative": opt.get("compactToRelative", True),
    }
    if "expandContext" in opt:
        with open(os.path.join(SUITE_DIR, opt["expandContext"])) as f:
            kwargs["expand_context"] = json.load(f)
    return JsonLdOptions(**kwargs)


def should_skip(case: dict) -> str | None:
    opt = case.get("option", {})
    if opt.get("specVersion") == "json-ld-1.0":
        return "JSON-LD 1.0 test"
    if opt.get("produceGeneralizedRdf"):
        return "generalized RDF unsupported (as reference)"
    if case["@id"] == "#t0114" and "jld:CompactTest" in case["@type"]:
        # reference skips it too: "Is this test actually correct? No
        # implementation runs this test." (compact_test.exs:19)
        return "skipped by reference (disputed test)"
    return None


def json_equal_unordered(a, b, in_list: bool = False) -> bool:
    """Deep JSON equality, treating arrays as multisets EXCEPT the value of
    ``@list`` (semantically ordered). Avoids the reference's ordering skips
    (expand_test.exs:22-51) while staying a sound comparison."""
    if isinstance(a, dict) and isinstance(b, dict):
        if set(a) != set(b):
            return False
        return all(json_equal_unordered(a[k], b[k], k == "@list") for k in a)
    if isinstance(a, list) and isinstance(b, list):
        if len(a) != len(b):
            return False
        if in_list:
            return all(json_equal_unordered(x, y) for x, y in zip(a, b))
        remaining = list(b)
        for x in a:
            for i, y in enumerate(remaining):
                if json_equal_unordered(x, y):
                    del remaining[i]
                    break
            else:
                return False
        return True
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    return a == b
