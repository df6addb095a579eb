"""End-to-end full KG run: all outputs, canonical labels, no duplicates."""

import json
import os

import pyarrow.dataset as pads

from jsonld_ex_ray.gen import write_corpus
from jsonld_ex_ray.pipelines import full_kg_run


def test_full_kg_run(ray_session, tmp_path):
    corpus = str(tmp_path / "repos.parquet")
    write_corpus(corpus, 150, seed=77)
    out = str(tmp_path / "kg")
    metrics = full_kg_run(
        out_dir=out,
        source=corpus,
        linker_dict={"https://kg.example/hot/1": "https://kg.example/canonical/h1"},
        mention_names={f"Widget {i}": f"https://kb/w{i}" for i in range(10000)},
        concurrency=1,
    )
    assert metrics["n_triples"] > 0
    assert set(os.listdir(out)) >= {"raw", "triples", "adjacency", "mentions", "metrics.json"}
    assert json.load(open(os.path.join(out, "metrics.json"))) == metrics

    triples = pads.dataset(os.path.join(out, "triples")).to_table().to_pandas()
    # canonical URDNA labels, doc-namespaced
    bnodes = [s for s in triples.subj if s.startswith("_:")]
    assert bnodes and all("-c14n" in b for b in bnodes)
    # exact dedup held
    key_cols = ["graph", "subj", "pred", "obj", "obj_datatype", "obj_lang"]
    assert not triples[key_cols].fillna("").duplicated().any()
    # linker rewrote the hot subject
    assert "subj_canon" in triples.columns
    adjacency = pads.dataset(os.path.join(out, "adjacency")).to_table().to_pandas()
    assert adjacency.subj.is_unique and adjacency.degree.sum() == len(triples)


def test_full_kg_run_resume_skips_and_never_double_counts(ray_session, tmp_path):
    """Rerun semantics: completed stages (sibling _SUCCESS markers) are
    skipped; a torn stage (marker missing) is cleared and rewritten —
    UUID-named parquet from a dead attempt can't double-count rows."""
    corpus = str(tmp_path / "repos.parquet")
    write_corpus(corpus, 80, seed=13)
    out = str(tmp_path / "kg")
    m1 = full_kg_run(out_dir=out, source=corpus, concurrency=1)
    n1 = m1["n_triples"]
    assert m1["raw_skipped"] is False

    # clean rerun: every stage skipped, counts identical
    m2 = full_kg_run(out_dir=out, source=corpus, concurrency=1)
    assert m2["raw_skipped"] is True
    assert m2["n_triples"] == n1

    # simulate a torn triples stage: marker gone, stale files present
    os.remove(os.path.join(out, "triples._SUCCESS"))
    m3 = full_kg_run(out_dir=out, source=corpus, concurrency=1)
    assert m3["n_triples"] == n1  # stale shard cleared, not double-counted

    triples = pads.dataset(os.path.join(out, "triples")).to_table().to_pandas()
    key_cols = ["graph", "subj", "pred", "obj", "obj_datatype", "obj_lang"]
    assert not triples[key_cols].fillna("").duplicated().any()
