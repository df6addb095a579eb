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


def test_id_match_none_empty_array():
    """json-ld11-framing §2.2: an empty @id array is match-NONE — every
    flattened node carries an @id, so nothing may match."""
    out = frame(
        LIBRARY,
        {"@context": {"@vocab": "http://example.org/"}, "@id": []},
    )
    graph = out.get("@graph", [])
    assert graph == [] or graph == [{}] or not any(
        isinstance(n, dict) and n.get("@id") for n in (graph if isinstance(graph, list) else [graph])
    )


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


# --------------------------------------------------------------------------
# Additional ported spec examples (json-ld11-framing §2.x/§3.x worked
# examples, round-3 coverage expansion — the official frame suite is not
# vendored in the reference checkout)
# --------------------------------------------------------------------------


def test_embed_always_duplicates_shared_node():
    """@embed: @always re-embeds a node at every reference (spec §2.1.1
    example set): two parents both embed the shared child in full."""
    doc = {
        "@context": {"@vocab": "http://example.org/", "child": {"@type": "@id"}},
        "@graph": [
            {"@id": "http://example.org/p1", "@type": "Parent", "child": "http://example.org/c"},
            {"@id": "http://example.org/p2", "@type": "Parent", "child": "http://example.org/c"},
            {"@id": "http://example.org/c", "@type": "Child", "name": "shared"},
        ],
    }
    f = {
        "@context": {"@vocab": "http://example.org/"},
        "@type": "Parent",
        "@embed": "@always",
    }
    out = frame(doc, f)
    parents = out["@graph"]
    assert len(parents) == 2
    for p in parents:
        assert p["child"]["name"] == "shared"  # embedded everywhere


def test_embed_once_resets_per_top_level_node():
    """@embed: @once dedups WITHIN one result tree (see
    test_embed_once_deduplicates) but the unique-embeds map resets per
    top-level matched node (the 1.1 ``embedded``-flag revision), so two
    independent top-level parents each embed the shared child — output
    must not depend on arbitrary top-level ordering."""
    doc = {
        "@context": {"@vocab": "http://example.org/", "child": {"@type": "@id"}},
        "@graph": [
            {"@id": "http://example.org/p1", "@type": "Parent", "child": "http://example.org/c"},
            {"@id": "http://example.org/p2", "@type": "Parent", "child": "http://example.org/c"},
            {"@id": "http://example.org/c", "@type": "Child", "name": "shared"},
        ],
    }
    f = {"@context": {"@vocab": "http://example.org/"}, "@type": "Parent"}
    out = frame(doc, f)
    parents = out["@graph"]
    assert all(p["child"].get("name") == "shared" for p in parents)


def test_duck_typing_property_presence():
    """Frames match on property presence without @type (spec 'duck
    typing' example): {"location": {}} selects only nodes carrying a
    location."""
    f = {"@context": {"@vocab": "http://example.org/"}, "location": {}}
    out = frame(LIBRARY, f)
    assert out["@id"] == "http://example.org/library"
    assert out["location"] == "Athens"


def test_multiple_id_match_array():
    """An @id array matches any listed id (spec §2.2 multiple-id
    example)."""
    f = {
        "@context": {"@vocab": "http://example.org/"},
        "@id": [
            "http://example.org/library/the-republic",
            "http://example.org/library/the-republic#introduction",
        ],
    }
    out = frame(LIBRARY, f)
    nodes = out["@graph"]
    assert {n["@id"] for n in nodes} == {
        "http://example.org/library/the-republic",
        "http://example.org/library/the-republic#introduction",
    }


def test_requireall_false_matches_any_property():
    """@requireAll: false (default): a node matches when ANY frame
    property matches."""
    f = {
        "@context": {"@vocab": "http://example.org/"},
        "location": {},
        "creator": {},
    }
    out = frame(LIBRARY, f)
    ids = {n["@id"] for n in out["@graph"]}
    assert "http://example.org/library" in ids  # has location
    assert "http://example.org/library/the-republic" in ids  # has creator


def test_requireall_true_needs_every_property():
    f = {
        "@context": {"@vocab": "http://example.org/"},
        "@requireAll": True,
        "creator": {},
        "title": {},
    }
    out = frame(LIBRARY, f)
    got = out.get("@graph", out)
    nodes = got if isinstance(got, list) else [got]
    nodes = [n for n in nodes if n.get("@id")]
    assert {n["@id"] for n in nodes} == {"http://example.org/library/the-republic"}


def test_list_framing_preserves_list():
    """Framing a document whose property is an @list keeps the list
    container and frames its members (spec list-framing example)."""
    doc = {
        "@context": {"@vocab": "http://example.org/"},
        "@id": "http://example.org/list-holder",
        "@type": "Holder",
        "items": {"@list": [{"@value": "a"}, {"@value": "b"}]},
    }
    f = {"@context": {"@vocab": "http://example.org/"}, "@type": "Holder"}
    out = frame(doc, f)
    items = out["items"]
    lst = items["@list"] if isinstance(items, dict) else items
    assert lst == ["a", "b"]


def test_value_pattern_wildcard_value():
    """{"@value": {}} matches any literal of the property."""
    doc = {
        "@context": {"@vocab": "http://example.org/"},
        "@graph": [
            {"@id": "http://example.org/n1", "label": {"@value": "hi", "@language": "en"}},
            {"@id": "http://example.org/n2", "other": "x"},
        ],
    }
    f = {
        "@context": {"@vocab": "http://example.org/"},
        "label": {"@value": {}},
    }
    out = frame(doc, f)
    got = out.get("@graph", out)
    nodes = got if isinstance(got, list) else [got]
    assert {n["@id"] for n in nodes if n.get("@id")} == {"http://example.org/n1"}


def test_default_fills_missing_property():
    """@default supplies a value for nodes lacking the property (spec
    §2.4 example)."""
    f = {
        "@context": {"@vocab": "http://example.org/"},
        "@type": "Book",
        "edition": {"@default": "first"},
    }
    out = frame(LIBRARY, f)
    assert out["edition"] == "first"


def test_reverse_framing_spec_example():
    """@reverse in the frame attaches reverse-referencing nodes."""
    f = {
        "@context": {"@vocab": "http://example.org/", "contains": {"@type": "@id"}},
        "@id": "http://example.org/library/the-republic",
        "@reverse": {"contains": {}},
    }
    out = frame(LIBRARY, f)
    rev = out["@reverse"]["contains"]
    rev_nodes = rev if isinstance(rev, list) else [rev]
    assert any(n.get("@id") == "http://example.org/library" for n in rev_nodes)


def test_named_graph_framing():
    """A frame with @graph recurses into named graphs (spec §2.5)."""
    doc = {
        "@context": {"@vocab": "http://example.org/"},
        "@graph": [
            {
                "@id": "http://example.org/g1",
                "@graph": [
                    {"@id": "http://example.org/inner", "@type": "Thing", "name": "inside"}
                ],
            }
        ],
    }
    f = {
        "@context": {"@vocab": "http://example.org/"},
        "@type": "Thing",
    }
    out = frame(doc, f)
    found = []

    def walk(x):
        if isinstance(x, dict):
            if x.get("name") == "inside":
                found.append(x)
            for v in x.values():
                walk(v)
        elif isinstance(x, list):
            for v in x:
                walk(v)

    walk(out)
    assert found


def test_type_match_with_array_of_types():
    """A node with several types matches a frame naming any of them."""
    doc = {
        "@context": {"@vocab": "http://example.org/"},
        "@id": "http://example.org/multi",
        "@type": ["A", "B"],
        "name": "both",
    }
    f = {"@context": {"@vocab": "http://example.org/"}, "@type": "B"}
    out = frame(doc, f)
    assert out["name"] == "both"


def test_explicit_keeps_id_and_type():
    """@explicit: true drops unframed properties but never @id/@type."""
    f = {
        "@context": {"@vocab": "http://example.org/"},
        "@explicit": True,
        "@type": "Book",
        "title": {},
    }
    out = frame(LIBRARY, f)
    assert out["title"] == "The Republic"
    assert out["@id"] == "http://example.org/library/the-republic"
    assert "creator" not in out


def test_omit_default_suppresses_property():
    f = {
        "@context": {"@vocab": "http://example.org/"},
        "@type": "Book",
        "edition": {"@default": "first", "@omitDefault": True},
    }
    out = frame(LIBRARY, f)
    assert "edition" not in out


def test_empty_frame_matches_everything():
    out = frame(LIBRARY, {"@context": {"@vocab": "http://example.org/"}})
    got = out.get("@graph", out)
    nodes = got if isinstance(got, list) else [got]
    # all three top-level-reachable nodes survive (possibly embedded)
    text = str(out)
    for t in ("The Republic", "The Introduction", "Athens"):
        assert t in text


# Third batch of ported spec-derived cases: option-level flags, type
# defaults, @null defaults, value patterns on @value, list framing with
# literal members, requireAll + @id combinations (json-ld11-framing
# §2.1/§2.3/§3.2 worked examples).


def test_option_level_embed_never():
    """@embed given as an API option (not inline) applies to every level."""
    out = frame(
        LIBRARY,
        {"@context": {"@vocab": "http://example.org/"}, "@type": "Library"},
        JsonLdOptions(embed="@never"),
    )
    assert out["contains"] == {"@id": "http://example.org/library/the-republic"}


def test_option_level_explicit_true():
    out = frame(
        LIBRARY,
        {
            "@context": {"@vocab": "http://example.org/"},
            "@type": "Library",
            "location": {},
        },
        JsonLdOptions(explicit=True),
    )
    assert out["location"] == "Athens"
    assert "contains" not in out  # explicit drops unframed properties


def test_type_default_fills_output_type():
    """A frame @type carrying {"@default": ...} matches any node and
    stamps the default type on nodes that have none."""
    doc = {
        "@context": {"@vocab": "http://example.org/"},
        "@id": "http://example.org/u1",
        "name": "untyped node",
    }
    out = frame(
        doc,
        {
            "@context": {"@vocab": "http://example.org/"},
            "@type": {"@default": "Thing"},
            "name": {},
        },
        JsonLdOptions(),
    )
    assert out["@type"] == "Thing"
    assert out["name"] == "untyped node"


def test_null_default_round_trips_as_null():
    out = frame(
        LIBRARY,
        {
            "@context": {"@vocab": "http://example.org/"},
            "@type": "Chapter",
            "publisher": {"@default": "@null"},
        },
        JsonLdOptions(),
    )
    assert out["publisher"] is None


def test_value_pattern_exact_value_match():
    """A frame value pattern with a concrete @value keeps only matching
    literals."""
    doc = {
        "@context": {"@vocab": "http://example.org/"},
        "@id": "http://example.org/m",
        "tag": ["red", "green", "blue"],
    }
    out = frame(
        doc,
        {
            "@context": {"@vocab": "http://example.org/"},
            "tag": {"@value": "green"},
        },
        JsonLdOptions(),
    )
    assert out["tag"] == "green"


def test_value_pattern_wildcard_language():
    """@language: [] (match none) keeps only UNTAGGED literals."""
    doc = {
        "@context": {"@vocab": "http://example.org/"},
        "@id": "http://example.org/m",
        "label": [
            {"@value": "chat", "@language": "fr"},
            {"@value": "plain"},
        ],
    }
    out = frame(
        doc,
        {
            "@context": {"@vocab": "http://example.org/"},
            "label": {"@value": {}, "@language": []},
        },
        JsonLdOptions(),
    )
    assert out["label"] == "plain"


def test_list_framing_literal_members_preserved():
    doc = {
        "@context": {
            "@vocab": "http://example.org/",
            "scores": {"@container": "@list"},
        },
        "@id": "http://example.org/s",
        "scores": [1, 2, 3],
    }
    out = frame(
        doc,
        {"@context": doc["@context"], "scores": {}},
        JsonLdOptions(),
    )
    assert out["scores"] == [1, 2, 3]


def test_requireall_id_and_property():
    """@requireAll spanning @id and a property: the node must satisfy
    both to match."""
    docs = {
        "@context": {"@vocab": "http://example.org/"},
        "@graph": [
            {"@id": "http://example.org/a", "status": "active"},
            {"@id": "http://example.org/b", "status": "active"},
        ],
    }
    out = frame(
        docs,
        {
            "@context": {"@vocab": "http://example.org/"},
            "@requireAll": True,
            "@id": "http://example.org/a",
            "status": {},
        },
        JsonLdOptions(),
    )
    assert out["@id"] == "http://example.org/a"
    assert "@graph" not in out


def test_frame_on_expanded_input_document():
    """Framing accepts already-expanded input (no @context on the doc)."""
    expanded = [
        {
            "@id": "http://example.org/library",
            "@type": ["http://example.org/Library"],
            "http://example.org/location": [{"@value": "Athens"}],
        }
    ]
    out = frame(
        expanded,
        {"@context": {"@vocab": "http://example.org/"}, "@type": "Library"},
        JsonLdOptions(),
    )
    assert out["location"] == "Athens"


def test_wildcard_property_value_object_any():
    """A {} property frame matches value objects of any shape."""
    doc = {
        "@context": {"@vocab": "http://example.org/"},
        "@id": "http://example.org/n",
        "when": {"@value": "2024-01-01", "@type": "http://www.w3.org/2001/XMLSchema#date"},
    }
    out = frame(
        doc,
        {"@context": {"@vocab": "http://example.org/"}, "when": {}},
        JsonLdOptions(),
    )
    assert out["when"] == {
        "@value": "2024-01-01",
        "@type": "http://www.w3.org/2001/XMLSchema#date",
    }


def test_embed_never_applies_inside_lists():
    """Regression (hypothesis-found): the implicit frame for @list items
    must inherit @embed/@explicit from the parent like the non-list
    implicit subframe does — @embed:@never previously leaked full node
    objects into framed lists."""
    from jsonld_ex_ray.core import frame

    ctx = {"@vocab": "http://ex.org/", "lst": {"@container": "@list"}}
    doc = {
        "@context": ctx,
        "@id": "http://ex.org/root",
        "lst": [{"@id": "http://ex.org/a", "name": "A"}],
    }
    out = frame(doc, {"@context": ctx, "@embed": "@never"})
    nodes = out["@graph"]
    root = next(n for n in nodes if n.get("@id") == "http://ex.org/root")
    # the list item is a bare reference; its content survives top-level
    assert root["lst"] == [{"@id": "http://ex.org/a"}]
    assert any(n.get("name") == "A" for n in nodes)


def test_array_wrapped_id_wildcard_does_not_crash():
    """{"@id": [{}]} — the array-wrapped wildcard must behave like {} and
    never reach expand_iri with an unhashable value."""
    from jsonld_ex_ray.core import frame

    doc = {"@context": {"@vocab": "http://ex/"}, "@id": "http://ex/a", "p": "v"}
    out = frame(doc, {"@context": doc["@context"], "@id": [{}]})
    nodes = out.get("@graph", [out])
    assert any(n.get("@id") == "http://ex/a" for n in nodes)


def test_value_pattern_array_matches_any():
    """spec: an ARRAY of value patterns matches when ANY pattern matches,
    not only the first element."""
    from jsonld_ex_ray.core import frame

    ctx = {"@vocab": "http://ex/"}
    doc = {
        "@context": ctx,
        "@graph": [
            {"@id": "http://ex/x", "p": "b"},
            {"@id": "http://ex/y", "p": "z"},
        ],
    }
    out = frame(doc, {"@context": ctx, "p": [{"@value": "a"}, {"@value": "b"}]})
    ids = {n.get("@id") for n in out.get("@graph", [out])}
    assert "http://ex/x" in ids and "http://ex/y" not in ids


def test_node_pattern_empty_id_array_matches_none():
    """A property subframe {"@id": []} is match-none for node values."""
    from jsonld_ex_ray.core import frame

    ctx = {"@vocab": "http://ex/"}
    doc = {
        "@context": ctx,
        "@graph": [
            {"@id": "http://ex/x", "p": {"@id": "http://ex/t"}},
            {"@id": "http://ex/y", "q": "s"},
        ],
    }
    out = frame(
        doc, {"@context": ctx, "@requireAll": True, "p": {"@id": []}}
    )
    ids = {n.get("@id") for n in out.get("@graph", [out])}
    assert "http://ex/x" not in ids


def test_embed_link_raises_not_implemented():
    import pytest

    from jsonld_ex_ray.core import JsonLdError, frame

    doc = {"@context": {"@vocab": "http://ex/"}, "p": "v"}
    with pytest.raises(JsonLdError):
        frame(doc, {"@context": doc["@context"], "@embed": "@link"})


def test_processing_mode_10_keeps_blank_node_ids():
    from jsonld_ex_ray.core import JsonLdOptions, frame

    ctx = {"@vocab": "http://ex/"}
    # anonymous inner node, embedded exactly once under a NAMED root (a
    # wildcard frame would re-emit the bnode top-level, making it
    # doubly-referenced and legitimately unpruned)
    doc = {"@context": ctx, "@id": "http://ex/a", "p": {"q": "v"}}
    out11 = frame(doc, {"@context": ctx, "@id": "http://ex/a"})
    out10 = frame(
        doc,
        {"@context": ctx, "@id": "http://ex/a"},
        JsonLdOptions(processing_mode="json-ld-1.0"),
    )

    def has_bnode_id(e):
        if isinstance(e, list):
            return any(has_bnode_id(x) for x in e)
        if isinstance(e, dict):
            v = e.get("@id")
            return (isinstance(v, str) and v.startswith("_:")) or any(
                has_bnode_id(x) for k, x in e.items() if k != "@id"
            )
        return False

    assert not has_bnode_id(out11)  # 1.1 prunes singly-used bnode ids
    assert has_bnode_id(out10)  # 1.0 retains them


def test_included_recursion_restores_outer_embed_tracking():
    """@included frames get fresh embed space, but the OUTER tree's
    embed-once bookkeeping must survive: q must emit a reference for the
    node already embedded under p, even after @included ran between
    them."""
    from jsonld_ex_ray.core import frame

    ctx = {"@vocab": "http://ex/"}
    doc = {
        "@context": ctx,
        "@id": "http://ex/a",
        "p": {"@id": "http://ex/x", "name": "X"},
        "q": {"@id": "http://ex/x"},
    }
    out = frame(
        doc,
        {"@context": ctx, "@id": "http://ex/a",
         "p": {"@included": [{"@id": "http://ex/x"}]}, "q": {}},
    )
    node = out if "@graph" not in out else next(
        n for n in out["@graph"] if n.get("@id") == "http://ex/a"
    )
    p_val, q_val = node["p"], node["q"]
    embedded = [v for v in (p_val, q_val) if isinstance(v, dict) and "name" in v]
    refs = [v for v in (p_val, q_val) if isinstance(v, dict) and list(v) == ["@id"]]
    assert len(embedded) == 1 and len(refs) == 1  # @once: one embed + one ref


# ---------------------------------------------------------------------------
# round-4 corner matrix: @embed modes × named graphs × lists
# (the official w3c/json-ld-framing manifest is not vendored and the
# sandbox has no network — these encode the spec rules for the corners
# beyond the worked examples: embed flags interacting with @graph
# partitions, list nodes and reverse properties)
# ---------------------------------------------------------------------------

NAMED_GRAPH_DOC = {
    "@context": {"@vocab": "http://example.org/", "knows": {"@type": "@id"}},
    "@graph": [
        {
            "@id": "http://example.org/alice",
            "@type": "Person",
            "name": "Alice",
            "knows": "http://example.org/bob",
        },
        {
            "@id": "http://example.org/g1",
            "@graph": [
                {
                    "@id": "http://example.org/bob",
                    "@type": "Person",
                    "name": "Bob",
                    "knows": "http://example.org/alice",
                }
            ],
        },
    ],
}


def test_embed_never_across_named_graph_boundary():
    """@embed:@never leaves a node REF even when the referenced node's
    properties live in a named graph (framing the @merged node map)."""
    out = frame(
        NAMED_GRAPH_DOC,
        {
            "@context": {"@vocab": "http://example.org/"},
            "@id": "http://example.org/alice",
            "@embed": "@never",
        },
    )
    assert out["name"] == "Alice"
    assert out["knows"] == {"@id": "http://example.org/bob"}


def test_merged_graph_embeds_named_graph_node():
    """Default framing merges named graphs: Bob's properties (defined
    only inside g1) embed under Alice."""
    out = frame(
        NAMED_GRAPH_DOC,
        {
            "@context": {"@vocab": "http://example.org/"},
            "@id": "http://example.org/alice",
        },
    )
    bob = out["knows"]
    assert bob["name"] == "Bob"
    # @once (default): the back-reference to the already-embedded alice
    # stays a ref, no infinite recursion
    assert bob["knows"] == {"@id": "http://example.org/alice"}


def test_list_members_from_named_graph_embed_once():
    """@list of node refs whose definitions live in a named graph:
    default @once embeds each member's properties inside the list."""
    doc = {
        "@context": {"@vocab": "http://example.org/"},
        "@graph": [
            {
                "@id": "http://example.org/seq",
                "items": {
                    "@list": [
                        {"@id": "http://example.org/a"},
                        {"@id": "http://example.org/b"},
                    ]
                },
            },
            {
                "@id": "http://example.org/g2",
                "@graph": [
                    {"@id": "http://example.org/a", "name": "first"},
                    {"@id": "http://example.org/b", "name": "second"},
                ],
            },
        ],
    }
    out = frame(
        doc,
        {"@context": {"@vocab": "http://example.org/"}, "@id": "http://example.org/seq"},
    )
    items = out["items"]["@list"]
    assert [m["name"] for m in items] == ["first", "second"]

    never = frame(
        doc,
        {
            "@context": {"@vocab": "http://example.org/"},
            "@id": "http://example.org/seq",
            "@embed": "@never",
        },
    )
    assert never["items"]["@list"] == [
        {"@id": "http://example.org/a"},
        {"@id": "http://example.org/b"},
    ]


def test_nested_list_of_lists_survives_framing():
    doc = {
        "@context": {"@vocab": "http://example.org/"},
        "@id": "http://example.org/m",
        "matrix": {"@list": [{"@list": [1, 2]}, {"@list": [3]}]},
    }
    out = frame(doc, {"@context": {"@vocab": "http://example.org/"}})
    assert out["matrix"]["@list"] == [{"@list": [1, 2]}, {"@list": [3]}]


def test_embed_always_duplicates_inside_list():
    """@embed:@always re-embeds a node at EVERY reference, including
    list positions that repeat the same node."""
    doc = {
        "@context": {"@vocab": "http://example.org/"},
        "@graph": [
            {
                "@id": "http://example.org/seq",
                "items": {
                    "@list": [
                        {"@id": "http://example.org/a"},
                        {"@id": "http://example.org/a"},
                    ]
                },
            },
            {"@id": "http://example.org/a", "name": "dup"},
        ],
    }
    out = frame(
        doc,
        {
            "@context": {"@vocab": "http://example.org/"},
            "@id": "http://example.org/seq",
            "@embed": "@always",
        },
    )
    items = out["items"]["@list"]
    assert len(items) == 2
    assert all(m.get("name") == "dup" for m in items)


def test_reverse_framing_with_embed_never():
    """@reverse in the frame pulls referencing nodes in; @embed:@never
    inside the reverse frame keeps them as refs."""
    doc = {
        "@context": {"@vocab": "http://example.org/", "parent": {"@type": "@id"}},
        "@graph": [
            {"@id": "http://example.org/child1", "parent": "http://example.org/p", "name": "c1"},
            {"@id": "http://example.org/child2", "parent": "http://example.org/p", "name": "c2"},
            {"@id": "http://example.org/p", "name": "the parent"},
        ],
    }
    out = frame(
        doc,
        {
            "@context": {"@vocab": "http://example.org/"},
            "@id": "http://example.org/p",
            "@reverse": {"parent": {}},
        },
    )
    assert out["name"] == "the parent"
    rev = out["@reverse"]["parent"]
    kids = rev if isinstance(rev, list) else [rev]
    assert sorted(k["name"] for k in kids) == ["c1", "c2"]

    never = frame(
        doc,
        {
            "@context": {"@vocab": "http://example.org/"},
            "@id": "http://example.org/p",
            "@reverse": {"parent": {"@embed": "@never"}},
        },
    )
    rev = never["@reverse"]["parent"]
    kids = rev if isinstance(rev, list) else [rev]
    assert sorted(kids, key=str) == [
        {"@id": "http://example.org/child1"},
        {"@id": "http://example.org/child2"},
    ]


def test_default_inside_list_frame_not_applied_to_members():
    """@default belongs to node framing — list members that exist keep
    their values; a missing property on an embedded list member gets the
    nested frame's @default."""
    doc = {
        "@context": {"@vocab": "http://example.org/"},
        "@graph": [
            {
                "@id": "http://example.org/seq",
                "items": {"@list": [{"@id": "http://example.org/a"}]},
            },
            {"@id": "http://example.org/a", "name": "has-name"},
        ],
    }
    out = frame(
        doc,
        {
            "@context": {"@vocab": "http://example.org/"},
            "@id": "http://example.org/seq",
            "items": {"@list": [{"status": {"@default": "unknown"}}]},
        },
    )
    member = out["items"]["@list"][0]
    assert member["name"] == "has-name"
    assert member["status"] == "unknown"


def test_graph_property_content_preserved():
    """A node carrying its own named graph (@graph inside the node
    object) keeps that partition through framing when the frame asks
    for it."""
    doc = {
        "@context": {"@vocab": "http://example.org/"},
        "@id": "http://example.org/collection",
        "name": "top",
        "@graph": [
            {"@id": "http://example.org/inner", "name": "inner node"}
        ],
    }
    out = frame(
        doc,
        {
            "@context": {"@vocab": "http://example.org/"},
            "@id": "http://example.org/collection",
            "@graph": {},
        },
    )
    assert out.get("name") == "top"
