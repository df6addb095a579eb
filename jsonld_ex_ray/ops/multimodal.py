"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The image/audio decode libraries are not in this container, so the decode
kernels are STUBS (deterministic fakes clearly marked), but the Ray-side
plumbing is real and tested: schema, actor-pool stage shape, batch sizing
for large binary payloads, output layout.

    media(media_id:int64, kind:string, payload:binary, meta:string[json])
      → map_batches(MediaDecoder, concurrency=N, batch_size=SMALL)
      → features table

Batch size MUST stay small for binary columns: batch_bytes ≈ batch_size ×
payload_size × concurrency must fit the worker heap (SURVEY.md "memory-
aware" note).
"""

from __future__ import annotations

import hashlib
import json

import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("meta", pa.string()),  # JSON: {width,height,...} claimed by source
    ]
)

FEATURE_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("n_bytes", pa.int64()),
        ("sha256", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
        ("feature", pa.list_(pa.float32())),  # embedding-like vector
    ]
)

FEATURE_DIM = 16


def _fake_decode(kind: str, payload: bytes, meta: dict) -> dict:
    """STUB: deterministic fake decode. A real deployment replaces this with
    PIL/libav decode; everything around it (schema, actor shape, batching)
    stays identical. Raises NotImplementedError for unknown kinds, surfaced
    as error features."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for kind={kind!r}")
    digest = hashlib.sha256(payload).digest()
    feature = [b / 255.0 for b in digest[:FEATURE_DIM]]
    return {
        "width": int(meta.get("width", len(payload) % 1920)) if kind != "audio" else 0,
        "height": int(meta.get("height", len(payload) % 1080)) if kind != "audio" else 0,
        "duration_ms": int(meta.get("duration_ms", 0)) if kind != "image" else 0,
        "feature": feature,
    }


class MediaDecoder:
    """Actor-pool decode stage: ``map_batches(MediaDecoder,
    concurrency=(2, N), batch_size=16, num_cpus=1)``.

    Real decoders load codecs/models in ``__init__`` (once per actor);
    the stub only records that the hook ran."""

    def __init__(self, target_size: tuple[int, int] = (224, 224)):
        self.target_size = target_size  # a real impl would init codecs here
        self.initialized = True

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {name: [] for name in FEATURE_SCHEMA.names}
        ids = batch.column("media_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        metas = batch.column("meta").to_pylist()
        for mid, kind, payload, meta in zip(ids, kinds, payloads, metas):
            payload = payload or b""
            try:
                meta_d = json.loads(meta) if meta else {}
            except ValueError:
                meta_d = {}
            try:
                dec = _fake_decode(kind, payload, meta_d)
            except NotImplementedError:
                dec = {"width": -1, "height": -1, "duration_ms": -1, "feature": [0.0] * FEATURE_DIM}
            out["media_id"].append(mid)
            out["kind"].append(kind)
            out["n_bytes"].append(len(payload))
            out["sha256"].append(hashlib.sha256(payload).hexdigest())
            out["width"].append(dec["width"])
            out["height"].append(dec["height"])
            out["duration_ms"].append(dec["duration_ms"])
            out["feature"].append(dec["feature"])
        return pa.Table.from_pydict(out, schema=FEATURE_SCHEMA)


def decode_media(ds, concurrency=(2, 4), batch_size: int = 16):
    """Wire the decode actor pool with binary-safe batch sizing."""
    return ds.map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synth_media_table(n: int, seed: int = 5) -> pa.Table:
    """Deterministic fake media rows for tests (payload = seeded bytes)."""
    import random

    rng = random.Random(seed)
    kinds, payloads, metas, ids = [], [], [], []
    for i in range(n):
        kind = rng.choice(["image", "audio", "video", "unknown"])
        size = rng.randrange(64, 4096)
        payload = bytes(rng.randrange(256) for _ in range(min(size, 256))) * (size // 256 + 1)
        ids.append(i)
        kinds.append(kind)
        payloads.append(payload[:size])
        metas.append(json.dumps({"width": rng.randrange(16, 1920), "height": rng.randrange(16, 1080), "duration_ms": rng.randrange(1000)}))
    return pa.Table.from_pydict(
        {"media_id": ids, "kind": kinds, "payload": payloads, "meta": metas},
        schema=MEDIA_SCHEMA,
    )
