"""Extraction-layer tests (FIXTURES.md archetypes A8-A10)."""

import json

from jsonld_ex_ray.extract import extract_payloads


def test_whole_file_jsonld():
    doc = {"@context": {"@vocab": "http://x/"}, "@id": "http://x/1", "name": "a"}
    payloads, errors = extract_payloads(json.dumps(doc), "jsonld", "a.jsonld")
    assert len(payloads) == 1 and not errors
    assert json.loads(payloads[0]) == doc


def test_plain_json_is_noise():
    payloads, errors = extract_payloads('{"name": "nothing here"}', "json", "a.json")
    assert payloads == [] and errors == []


def test_invalid_json_is_error_not_crash():
    payloads, errors = extract_payloads("{oops", "json", "a.json")
    assert payloads == [] and len(errors) == 1


def test_html_script_blocks():
    doc1 = {"@context": {"@vocab": "http://x/"}, "@type": "Product"}
    doc2 = {"@id": "http://x/2", "@type": "http://x/T"}
    html = (
        "<html><head>"
        f'<script type="application/ld+json">{json.dumps(doc1)}</script>'
        "<script>var x = 1;</script>"
        f'<SCRIPT TYPE="application/ld+json">{json.dumps(doc2)}</SCRIPT>'
        "</head><body></body></html>"
    )
    payloads, errors = extract_payloads(html, "html", "p.html")
    assert [json.loads(p) for p in payloads] == [doc1, doc2]
    assert not errors


def test_html_bad_script_block_is_error_row():
    html = '<script type="application/ld+json">{broken</script>'
    payloads, errors = extract_payloads(html, "html", "p.html")
    assert payloads == [] and len(errors) == 1


def test_markdown_fence():
    doc = {"@context": "https://ctx.example/product", "@id": "http://x/3"}
    md = f"# T\n\n```json\n{json.dumps(doc, indent=1)}\n```\n\n```python\nx=1\n```\n"
    payloads, errors = extract_payloads(md, "markdown", "r.md")
    assert [json.loads(p) for p in payloads] == [doc]


def test_embedded_object_in_source():
    doc = {"@context": {"@vocab": "http://x/"}, "@id": "http://x/4", "v": 1}
    py = f"import json\nSCHEMA = json.loads('''{json.dumps(doc, indent=2)}''')\n"
    payloads, errors = extract_payloads(py, "python", "s.py")
    assert [json.loads(p) for p in payloads] == [doc]


def test_embedded_picks_outermost():
    inner = {"@context": {"@vocab": "http://x/"}, "nested": {"@context": {}, "a": 1}}
    text = f"const s = {json.dumps(inner)};"
    payloads, _ = extract_payloads(text, "javascript", "s.js")
    assert len(payloads) == 1
    assert json.loads(payloads[0]) == inner


def test_custom_detector_registry():
    from jsonld_ex_ray import extract as ex

    def notebook_detector(content, lang, ext):
        if ext != "ipynb":
            return None
        doc = {"@context": {"@vocab": "http://nb/"}, "@id": "http://nb/1"}
        return [json.dumps(doc)], []

    ex.register_detector("notebook", notebook_detector, prepend=True)
    try:
        payloads, errors = extract_payloads("{}", "json", "analysis.ipynb")
        assert len(payloads) == 1 and "nb/1" in payloads[0]
        # other kinds untouched
        p2, _ = extract_payloads('{"name":"noise"}', "json", "a.json")
        assert p2 == []
    finally:
        ex.DETECTORS.pop(0)


def test_oversized_content_is_skipped_with_error():
    from jsonld_ex_ray import extract as ex

    big = "x" * (ex.MAX_CONTENT_BYTES + 1)
    payloads, errors = extract_payloads(big, "text", "big.txt")
    assert payloads == [] and len(errors) == 1


def test_detector_registry_snapshot_reaches_kernel():
    """make_extract_batch snapshots the DRIVER registry into the task
    closure — a module-global registry alone never reaches Ray worker
    processes (review-found silent no-op)."""
    import pyarrow as pa

    from jsonld_ex_ray.extract import DETECTORS, register_detector
    from jsonld_ex_ray.stages.extract import make_extract_batch

    def notebook_detector(content, lang, ext):
        if ext == "ipynb":
            return (['{"@id":"http://ex/nb","@context":{}}'], [])
        return None

    register_detector("notebook", notebook_detector)
    try:
        kernel = make_extract_batch()  # snapshot taken HERE (driver)
    finally:
        DETECTORS.clear()  # simulate a fresh worker process registry

    batch = pa.table(
        {
            "repo": ["r"], "path": ["nb.ipynb"], "commit": ["c"],
            "lang": ["json"], "content": ["{}"],
        }
    )
    out = kernel(batch)
    assert out.num_rows == 1
    assert out.column("payload")[0].as_py() == '{"@id":"http://ex/nb","@context":{}}'


def test_null_content_and_null_path_become_error_rows():
    import pyarrow as pa

    from jsonld_ex_ray.stages.extract import make_extract_batch

    batch = pa.table(
        {
            "repo": ["r", "r"], "path": ["a.jsonld", None], "commit": ["c", "c"],
            "lang": ["jsonld", None], "content": [None, '{"@context":{},"@id":"x"}'],
        }
    )
    out = make_extract_batch()(batch).to_pandas()
    err = out[out.error_code.notna()]
    assert len(err) == 1 and "missing content" in err.error_message.iloc[0]
    assert err.doc_id.iloc[0].endswith("#!0")  # indexed error lineage
    ok = out[out.error_code.isna()]
    assert len(ok) == 1  # null path doesn't kill the row
