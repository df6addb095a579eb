"""JSON-LD 1.1 Framing tests (spec examples + option matrix).

The W3C framing suite is not vendored (the reference implements no
framing, reference README.md:29-32), so these tests encode the spec's own
worked examples: the library/book/chapter frame, @explicit, @default /
@omitDefault, @embed variants, @requireAll, match-none @type, value
patterns, list framing and @reverse framing."""

from jsonld_ex_ray.core import JsonLdOptions, frame

LIBRARY = {
    "@context": {
        "@vocab": "http://example.org/",
        "contains": {"@type": "@id"},
    },
    "@graph": [
        {
            "@id": "http://example.org/library",
            "@type": "Library",
            "location": "Athens",
            "contains": "http://example.org/library/the-republic",
        },
        {
            "@id": "http://example.org/library/the-republic",
            "@type": "Book",
            "creator": "Plato",
            "title": "The Republic",
            "contains": "http://example.org/library/the-republic#introduction",
        },
        {
            "@id": "http://example.org/library/the-republic#introduction",
            "@type": "Chapter",
            "description": "An introductory chapter on The Republic.",
            "title": "The Introduction",
        },
    ],
}

LIBRARY_FRAME = {
    "@context": {"@vocab": "http://example.org/"},
    "@type": "Library",
    "contains": {
        "@type": "Book",
        "contains": {"@type": "Chapter"},
    },
}


def test_library_frame_embeds_hierarchy():
    out = frame(LIBRARY, LIBRARY_FRAME)
    assert out["@type"] == "Library"
    assert out["location"] == "Athens"
    book = out["contains"]
    assert book["@type"] == "Book"
    assert book["title"] == "The Republic"
    chapter = book["contains"]
    assert chapter["@type"] == "Chapter"
    assert chapter["title"] == "The Introduction"


def test_wildcard_frame_matches_all_top_level():
    out = frame(LIBRARY, {"@context": {"@vocab": "http://example.org/"}})
    # wildcard: every node matches; embedded ones fold into their parents
    assert "@graph" not in out or len(out["@graph"]) >= 1


def test_explicit_drops_unframed_properties():
    f = dict(LIBRARY_FRAME)
    f = {
        "@context": {"@vocab": "http://example.org/"},
        "@type": "Library",
        "@explicit": True,
        "contains": {},
    }
    out = frame(LIBRARY, f)
    assert "location" not in out
    assert "contains" in out


def test_default_value_and_omit_default():
    f = {
        "@context": {"@vocab": "http://example.org/"},
        "@type": "Chapter",
        "description": {},
        "pages": {"@default": 100},
    }
    out = frame(LIBRARY, f)
    assert out["pages"] == 100
    # absent property with no @default → null placeholder
    f2 = {
        "@context": {"@vocab": "http://example.org/"},
        "@type": "Chapter",
        "pages": {},
    }
    out2 = frame(LIBRARY, f2)
    assert out2["pages"] is None
    out3 = frame(LIBRARY, f2, JsonLdOptions(omit_default=True))
    assert "pages" not in out3


def test_embed_never_gives_node_refs():
    out = frame(LIBRARY, LIBRARY_FRAME, JsonLdOptions(embed="@never"))
    assert out["contains"] == {"@id": "http://example.org/library/the-republic"}


def test_embed_once_deduplicates():
    # d is referenced from two branches of one result tree: the first
    # traversal embeds it, the second gets a bare node reference
    doc = {
        "@context": {"@vocab": "http://ex/", "knows": {"@type": "@id"}},
        "@graph": [
            {"@id": "http://ex/a", "@type": "Root", "knows": ["http://ex/b", "http://ex/c"]},
            {"@id": "http://ex/b", "knows": "http://ex/d"},
            {"@id": "http://ex/c", "knows": "http://ex/d"},
            {"@id": "http://ex/d", "name": "dee"},
        ],
    }
    out = frame(doc, {"@context": {"@vocab": "http://ex/"}, "@type": "Root"})
    b, c = sorted(
        (v for v in out["knows"]), key=lambda n: n["@id"]
    )
    d_under_b = b["knows"]
    d_under_c = c["knows"]
    embedded = [d for d in (d_under_b, d_under_c) if isinstance(d, dict) and "name" in d]
    refs = [d for d in (d_under_b, d_under_c) if isinstance(d, dict) and set(d) == {"@id"}]
    assert len(embedded) == 1 and len(refs) == 1
    # @always embeds everywhere
    out2 = frame(
        doc,
        {"@context": {"@vocab": "http://ex/"}, "@type": "Root"},
        JsonLdOptions(embed="@always"),
    )
    for v in out2["knows"]:
        assert v["knows"]["name"] == "dee"


def test_require_all():
    f_any = {
        "@context": {"@vocab": "http://example.org/"},
        "creator": {},
        "location": {},
    }
    out = frame(LIBRARY, f_any)
    ids = _graph_ids(out)
    assert "http://example.org/library" in ids  # has location
    f_all = dict(f_any)
    f_all["@requireAll"] = True
    out2 = frame(LIBRARY, f_all)
    assert _graph_ids(out2) == set()  # nobody has both


def _graph_ids(out):
    nodes = out.get("@graph", [out] if "@id" in out else [])
    if isinstance(nodes, dict):
        nodes = [nodes]
    return {n.get("@id") for n in nodes if isinstance(n, dict) and "@id" in n}


def test_match_none_type():
    doc = {
        "@context": {"@vocab": "http://ex/"},
        "@graph": [
            {"@id": "http://ex/t", "@type": "T", "name": "typed"},
            {"@id": "http://ex/u", "name": "untyped"},
        ],
    }
    out = frame(doc, {"@context": {"@vocab": "http://ex/"}, "@type": []})
    assert _graph_ids(out) == {"http://ex/u"}
    out2 = frame(doc, {"@context": {"@vocab": "http://ex/"}, "@type": {}})
    assert _graph_ids(out2) == {"http://ex/t"}


def test_id_match():
    out = frame(
        LIBRARY,
        {
            "@context": {"@vocab": "http://example.org/"},
            "@id": "http://example.org/library/the-republic",
        },
    )
    assert out["@id"] == "http://example.org/library/the-republic"
    assert out["title"] == "The Republic"


def test_value_pattern_language_match():
    doc = {
        "@context": {"@vocab": "http://ex/"},
        "@id": "http://ex/n",
        "label": [
            {"@value": "hello", "@language": "en"},
            {"@value": "hallo", "@language": "de"},
        ],
    }
    f = {
        "@context": {"@vocab": "http://ex/"},
        "label": {"@value": {}, "@language": "en"},
    }
    out = frame(doc, f)
    assert out["label"] == {"@value": "hello", "@language": "en"}


def test_list_framing():
    doc = {
        "@context": {"@vocab": "http://ex/", "items": {"@container": "@list", "@type": "@id"}},
        "@id": "http://ex/root",
        "@type": "Root",
        "items": ["http://ex/i1", "http://ex/i2"],
    }
    doc2 = {
        "@context": doc["@context"],
        "@graph": [
            doc,
            {"@id": "http://ex/i1", "@type": "Item", "name": "one"},
            {"@id": "http://ex/i2", "@type": "Item", "name": "two"},
        ],
    }
    f = {
        "@context": doc["@context"],
        "@type": "Root",
        "items": {"@list": [{"@type": "Item"}]},
    }
    out = frame(doc2, f)
    items = out["items"]
    assert [i["name"] for i in items] == ["one", "two"]


def test_reverse_framing():
    doc = {
        "@context": {"@vocab": "http://ex/", "partOf": {"@type": "@id"}},
        "@graph": [
            {"@id": "http://ex/chapter1", "@type": "Chapter", "partOf": "http://ex/book"},
            {"@id": "http://ex/book", "@type": "Book", "title": "B"},
        ],
    }
    f = {
        "@context": {"@vocab": "http://ex/"},
        "@type": "Book",
        "@reverse": {"partOf": {}},
    }
    out = frame(doc, f)
    rev = out["@reverse"]["partOf"]
    rev = rev if isinstance(rev, list) else [rev]
    assert rev[0]["@id"] == "http://ex/chapter1"


def test_omit_graph_false_wraps():
    out = frame(LIBRARY, LIBRARY_FRAME, JsonLdOptions(omit_graph=False))
    assert "@graph" in out
    body = out["@graph"]
    assert isinstance(body, list) and body[0]["@type"] == "Library"


def test_blank_node_pruning():
    doc = {
        "@context": {"@vocab": "http://ex/"},
        "@type": "T",
        "child": {"name": "anon"},
    }
    out = frame(doc, {"@context": {"@vocab": "http://ex/"}, "@type": "T"})
    child = out["child"]
    assert child.get("name") == "anon"
    assert "@id" not in child  # single-use bnode id pruned


def test_frame_doc_omit_graph_flag():
    out = frame(LIBRARY, {**LIBRARY_FRAME, "@omitGraph": False})
    assert "@graph" in out
    out2 = frame(LIBRARY, {**LIBRARY_FRAME, "@omitGraph": True})
    assert out2["@type"] == "Library"


def test_included_framing():
    """@included in the frame attaches independently-matched nodes
    alongside each result (json-ld11-framing @included handling)."""
    f = {
        "@context": {"@vocab": "http://example.org/"},
        "@type": "Library",
        "@included": [{"@type": "Chapter"}],
    }
    out = frame(LIBRARY, f)
    assert out["@type"] == "Library"
    inc = out["@included"]
    inc = inc if isinstance(inc, list) else [inc]
    chapters = [n for n in inc if n.get("@type") == "Chapter"]
    assert chapters and chapters[0]["title"] == "The Introduction"
