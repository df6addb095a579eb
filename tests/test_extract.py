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
