"""File source + N-Quads sink round-trip."""

import glob
import json
import os

from jsonld_ex_ray.core.isomorphism import isomorphic
from jsonld_ex_ray.core.nquads import parse_nquads
from jsonld_ex_ray.pipeline import triples_only
from jsonld_ex_ray.sources import read_jsonld_files, write_nquads


def test_file_source_and_nquads_roundtrip(ray_session, tmp_path):
    d = tmp_path / "files"
    d.mkdir()
    (d / "a.jsonld").write_text(
        json.dumps(
            {
                "@context": {"@vocab": "https://x/", "knows": {"@type": "@id"}},
                "@id": "https://x/1",
                "name": "A",
                "knows": "https://x/2",
                "nested": {"label": "anon"},
            }
        )
    )
    (d / "b.html").write_text(
        '<html><script type="application/ld+json">'
        '{"@context":{"@vocab":"https://y/"},"@id":"https://y/3","label":"B"}'
        "</script></html>"
    )
    (d / "c.txt").write_text("no jsonld here at all")

    ds = triples_only(read_jsonld_files(str(d), batch_size=64))
    df = ds.to_pandas()
    assert len(df) == 5
    assert set(df.path.apply(os.path.basename)) == {"a.jsonld", "b.html"}

    out = str(tmp_path / "nq")
    write_nquads(ds, out)
    text = "".join(open(f).read() for f in glob.glob(f"{out}/*"))
    quads = parse_nquads(text)
    assert len(quads) == 5
    # round-trip: written N-Quads isomorphic to the dataset's triples
    want = []
    for r in df.itertuples():
        def term(v, kind=None, dt=None, lang=None):
            if kind == "literal":
                from jsonld_ex_ray.core.rdf_generation import RDF_LANGSTRING, XSD_STRING

                return ("lit", v, dt or XSD_STRING, lang)
            if v.startswith("_:"):
                return ("bnode", v[2:])
            return ("iri", v)

        want.append(
            (
                term(r.subj),
                term(r.pred),
                term(r.obj, r.obj_kind, r.obj_datatype, r.obj_lang),
                None,
            )
        )
    assert isomorphic(quads, want)
