"""Extraction stage: source-repo rows → JSON-LD payload rows.

Vectorized ``map_batches`` kernel over zero-copy Arrow batches. One input
row (a file) yields 0..n payload rows plus 0..n error rows; lineage columns
(``doc_id``, ``content_sha256``) are minted here and carried verbatim to the
triple table (BASELINE.json per-row invariant).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..extract import extract_payloads

PAYLOAD_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("content_sha256", pa.string()),
        ("payload", pa.string()),  # compact JSON; null on error rows
        ("error_code", pa.string()),
        ("error_message", pa.string()),
    ]
)


def make_extract_batch(detectors: list | None = None):
    """Build the extraction kernel with the detector registry SNAPSHOT
    taken on the driver (a module-global registry mutated by
    register_detector never reaches Ray worker processes on its own —
    the snapshot rides the task closure instead)."""
    from ..extract import DETECTORS

    snapshot = list(DETECTORS) if detectors is None else list(detectors)

    def extract_batch(batch: pa.Table) -> pa.Table:
        repos = batch.column("repo").to_pylist()
        paths = batch.column("path").to_pylist()
        commits = batch.column("commit").to_pylist()
        langs = batch.column("lang").to_pylist()
        contents = batch.column("content").to_pylist()

        out: dict[str, list] = {name: [] for name in PAYLOAD_SCHEMA.names}
        for repo, path, commit, lang, content in zip(repos, paths, commits, langs, contents):
            sha = hashlib.sha256((content or "").encode("utf-8")).hexdigest()
            payloads, errors = extract_payloads(content, lang, path, detectors=snapshot)
            base = f"{repo}@{commit}:{path}"
            for i, payload in enumerate(payloads):
                out["doc_id"].append(f"{base}#{i}")
                out["repo"].append(repo)
                out["path"].append(path)
                out["commit"].append(commit)
                out["content_sha256"].append(sha)
                out["payload"].append(payload)
                out["error_code"].append(None)
                out["error_message"].append(None)
            for i, msg in enumerate(errors):
                # '#!{i}' keeps error lineage unique per file (a shared
                # '#!' id conflated multiple errors from one file)
                out["doc_id"].append(f"{base}#!{i}")
                out["repo"].append(repo)
                out["path"].append(path)
                out["commit"].append(commit)
                out["content_sha256"].append(sha)
                out["payload"].append(None)
                out["error_code"].append("extraction failed")
                out["error_message"].append(msg[:500])
        return pa.Table.from_pydict(out, schema=PAYLOAD_SCHEMA)

    return extract_batch


# worker-local default (uses whatever registry the importing process has):
# pipelines prefer make_extract_batch(), which snapshots the DRIVER registry
extract_batch = make_extract_batch()
