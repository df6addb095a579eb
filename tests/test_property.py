"""Property-based round-trips (hypothesis): randomly generated JSON-LD
documents through the full kernel chain. The reference has no property
tests (SURVEY.md §5) — these guard invariants the W3C suite samples only
pointwise."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from jsonld_ex_ray.core import JsonLdOptions, compact, expand, from_rdf, to_rdf
from jsonld_ex_ray.core.isomorphism import isomorphic
from jsonld_ex_ray.core.nquads import parse_nquads, serialize_nquads

_VOCAB = "https://p.example/"

_scalar = st.one_of(
    st.text(max_size=12),
    st.integers(min_value=-(10**9), max_value=10**9),
    st.booleans(),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
)

_iri = st.sampled_from(
    [f"https://e.example/{i}" for i in range(4)] + [f"_:b{i}" for i in range(3)]
)

_prop = st.sampled_from(["p1", "p2", "p3", "name"])


@st.composite
def node_objects(draw, depth=2):
    node = {}
    if draw(st.booleans()):
        node["@id"] = draw(_iri)
    if draw(st.booleans()):
        node["@type"] = draw(st.sampled_from(["T1", "T2"]))
    for prop in draw(st.lists(_prop, max_size=3, unique=True)):
        if depth > 0 and draw(st.booleans()):
            node[prop] = draw(node_objects(depth=depth - 1))
        else:
            node[prop] = draw(st.one_of(_scalar, st.lists(_scalar, max_size=3)))
    return node


def docs():
    return node_objects().map(
        lambda n: {"@context": {"@vocab": _VOCAB, "p2": {"@container": "@list"}}, **n}
    )


@settings(max_examples=60, deadline=None)
@given(docs())
def test_expand_idempotent(doc):
    e1 = expand(doc)
    e2 = expand(e1)
    assert e1 == e2


@settings(max_examples=60, deadline=None)
@given(docs())
def test_compact_expand_roundtrip(doc):
    """expand(compact(expand(d))) == expand(d) under the same context."""
    ctx = {"@context": doc["@context"]}
    e1 = expand(doc)
    c = compact(e1, ctx)
    e2 = expand(c)
    assert e1 == e2


@settings(max_examples=60, deadline=None)
@given(docs())
def test_tordf_fromrdf_tordf_fixpoint(doc):
    """to_rdf(from_rdf(to_rdf(d))) isomorphic to to_rdf(d)."""
    q1 = to_rdf(doc, JsonLdOptions())
    back = from_rdf(q1, JsonLdOptions(ordered=True))
    q2 = to_rdf(back, JsonLdOptions())
    assert isomorphic(q1, q2)


@settings(max_examples=60, deadline=None)
@given(docs())
def test_nquads_roundtrip(doc):
    q1 = to_rdf(doc, JsonLdOptions())
    text = serialize_nquads(q1)
    q2 = parse_nquads(text)
    assert sorted(map(repr, set(q1))) == sorted(map(repr, set(q2)))


@settings(max_examples=40, deadline=None)
@given(docs())
def test_expansion_json_serializable(doc):
    json.dumps(expand(doc))


@settings(max_examples=400, deadline=None)
@given(
    st.floats(
        allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
    ),
    st.integers(min_value=0, max_value=8),
)
def test_round_half_away_matches_duckdb_property(value, nd):
    import duckdb
    import numpy as np

    from jsonld_ex_ray.ops.agg import round_half_away

    con = duckdb.connect()
    want = con.execute(f"SELECT round(?::DOUBLE, {nd})", [value]).fetchone()[0]
    got = float(round_half_away(np.array([value]), nd)[0])
    assert got == want, (value, nd, got, want)


@settings(max_examples=40, deadline=None)
@given(docs())
def test_frame_wildcard_never_crashes_and_serializes(doc):
    """Wildcard framing legitimately re-emits embedded nodes as top-level
    trees (each tree re-embeds its children), so triple-set equality is
    NOT an invariant; what must hold: no crash, JSON output, and every
    named (non-blank) node id survives into the framed output."""
    from jsonld_ex_ray.core import JsonLdError, frame

    try:
        out = frame(doc, {"@context": doc["@context"]})
    except JsonLdError as e:
        # legitimate spec error: merging re-used @ids can give a node two
        # @list values, which cannot compact under a @list container
        assert e.code == "compaction to list of lists"
        return
    json.dumps(out)

    def ids_of(element, acc):
        if isinstance(element, list):
            for e in element:
                ids_of(e, acc)
        elif isinstance(element, dict):
            v = element.get("@id")
            if isinstance(v, str) and not v.startswith("_:"):
                acc.add(v)
            for k, val in element.items():
                if k != "@id":
                    ids_of(val, acc)
        return acc

    want = ids_of(expand(doc), set())
    got = ids_of(out, set())
    assert want <= got


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),          # key
            st.integers(min_value=0, max_value=40),     # coarse ts → many ties
        ),
        min_size=1,
        max_size=60,
    ),
    range_us=st.integers(min_value=0, max_value=15),
)
@settings(max_examples=120, deadline=None)
def test_range_frame_bounds_match_bruteforce(rows, range_us):
    """The two-searchsorted RANGE-frame kernel equals the O(n²) frame
    definition (same key, ts ∈ [ts_i − range, ts_i], ties included) on
    adversarially tie-heavy inputs — including the per-segment fallback
    path, which must agree with the fast path."""
    import numpy as np

    from jsonld_ex_ray.ops.window import _range_frame_bounds

    order = sorted(range(len(rows)), key=lambda i: rows[i])
    keys = np.array([rows[i][0] for i in order], dtype=object)
    usv = np.array([rows[i][1] for i in order], dtype=np.int64)
    left, right = _range_frame_bounds(keys, usv, range_us)
    fb_left, fb_right = _range_frame_bounds(keys, usv, range_us, _force_fallback=True)
    assert (left == fb_left).all() and (right == fb_right).all()
    for i in range(len(rows)):
        mask = (keys == keys[i]) & (usv >= usv[i] - range_us) & (usv <= usv[i])
        idxs = np.flatnonzero(mask)
        assert left[i] == idxs[0]
        assert right[i] == idxs[-1]


@given(doc=docs())
@settings(max_examples=60, deadline=None)
def test_frame_embed_never_emits_only_references(doc):
    """With ``@embed: @never`` every node VALUE inside a framed property
    must be a bare reference (an ``{@id}``-only object or scalar), never
    an embedded node object carrying its own properties — json-ld11-
    framing §3 (@embed flag) as an invariant over random documents."""
    from jsonld_ex_ray.core import JsonLdError, frame

    try:
        out = frame(doc, {"@context": doc["@context"], "@embed": "@never"})
    except JsonLdError as e:
        assert e.code == "compaction to list of lists"
        return

    def check_values(element, depth):
        if isinstance(element, list):
            for e in element:
                check_values(e, depth)
        elif isinstance(element, dict):
            node_keys = [
                k for k in element if k not in ("@id", "@context", "@graph", "@list")
            ]
            if depth > 0 and "@value" not in element:
                # a nested node object must be a pure reference
                assert node_keys == [], f"embedded node at depth {depth}: {element}"
            for k, v in element.items():
                if k == "@context":
                    continue
                check_values(v, depth + (0 if k in ("@graph", "@list") else 1))

    top = out.get("@graph", out)
    for node in top if isinstance(top, list) else [top]:
        for k, v in node.items():
            if k in ("@id", "@context"):
                continue
            check_values(v, 1)


@given(doc=docs())
@settings(max_examples=60, deadline=None)
def test_frame_explicit_prunes_unframed_properties(doc):
    """With OPTION-level ``explicit=True`` and a frame naming only
    ``p1``, no other data property may appear anywhere in the output —
    including inside embedded nodes and framed lists. (Option-level, not
    frame-level: per spec an explicit ``{}`` subframe's flags fall back
    to the API options, so a frame-level @explicit legitimately stops at
    explicitly-framed children.)"""
    from jsonld_ex_ray.core import JsonLdError, JsonLdOptions, frame

    try:
        out = frame(
            doc,
            {"@context": doc["@context"], "p1": [{}]},
            JsonLdOptions(explicit=True),
        )
    except JsonLdError as e:
        assert e.code == "compaction to list of lists"
        return

    banned = {"p2", "p3", "name"}

    def walk(element):
        if isinstance(element, list):
            for e in element:
                walk(e)
        elif isinstance(element, dict):
            for k, v in element.items():
                if k == "@context":
                    continue
                assert k not in banned, f"unframed property {k!r} survived @explicit"
                walk(v)

    walk(out.get("@graph", out))


@settings(max_examples=40, deadline=None)
@given(
    n_keys=st.integers(min_value=1, max_value=5000),
    fp_target=st.sampled_from([0.01, 0.03, 0.1]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bloom_filter_bounds(n_keys, fp_target, seed):
    """Property: (a) ZERO false negatives for any key set; (b) observed
    false-positive rate on disjoint probes stays within ~3× the sizing
    target (the classic bound is loose for tiny filters, so the margin
    absorbs small-n variance); (c) sizing formula yields sane k."""
    import numpy as np
    import pyarrow as pa

    from jsonld_ex_ray.ops.bloom import BloomFilter

    rng = np.random.default_rng(seed)
    keys = rng.choice(np.arange(0, 10_000_000, dtype=np.int64), size=n_keys, replace=False)
    bf = BloomFilter.sized(n_keys, fp_target)
    assert 1 <= bf.k <= 16
    bf.add(pa.array(keys))
    assert bf.contains(pa.array(keys)).all()  # no false negatives, ever

    probes = np.setdiff1d(
        rng.choice(np.arange(10_000_000, 20_000_000, dtype=np.int64), size=4000, replace=False),
        keys,
    )
    fp = bf.contains(pa.array(probes)).mean()
    assert fp <= max(3 * fp_target, 0.02), (n_keys, fp_target, fp)


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_bloom_position_and_bitmap_encodings_agree(seed):
    """Property: build_bloom's two wire encodings (set-bit positions for
    sparse blocks, bitmap for dense) reconstruct the exact same filter a
    single-process add would produce."""
    import numpy as np
    import pyarrow as pa

    from jsonld_ex_ray.ops.bloom import BloomFilter

    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 2**62, size=rng.integers(1, 2000), dtype=np.int64)
    bf = BloomFilter.sized(len(keys), 0.01)
    bf.add(pa.array(keys))

    # simulate the fold: positions encoding over two half-blocks
    half = len(keys) // 2
    rebuilt = BloomFilter(bf.n_bits, bf.k)
    for part in (keys[:half], keys[half:]):
        if len(part) == 0:
            continue
        local = BloomFilter(bf.n_bits, bf.k)
        pos = np.unique(local._positions(pa.array(part)).ravel())
        np.bitwise_or.at(
            rebuilt.bits, pos >> np.uint64(6), np.uint64(1) << (pos & np.uint64(63))
        )
    assert np.array_equal(rebuilt.bits, bf.bits)
