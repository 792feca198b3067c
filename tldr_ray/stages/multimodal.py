"""Multimodal column plumbing (images / audio / video as opaque binary).

The decode libraries (PIL, ffmpeg, torchaudio, ...) are NOT in this
container, so the decode kernels are STUBS behind ``decoder=`` hooks:
``decoder=None`` raises NotImplementedError at the decode call site
(clearly marked), ``decoder="fake"`` derives deterministic pseudo
features from the payload bytes so the Ray-side plumbing — schema,
actor-pool signature, small-batch sizing, output layout — is real and
tested end-to-end.

Design points that survive to production unchanged:
- payloads stay ``binary`` columns in ``batch_format="pyarrow"`` end to
  end (nested/binary columns do not round-trip pandas safely);
- decode stages are ACTOR POOLS (model/codec loaded once per actor in
  ``__init__``) with SMALL ``batch_size`` — a batch times concurrency of
  decoded frames must fit the worker heap;
- outputs are fixed-width feature columns + typed metadata, never
  re-encoded blobs, so downstream stages shuffle numbers, not media.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),          # -1 when unknown
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synth_media_table(n: int, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media rows for plumbing tests/benches."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        kind = kinds[i % 3]
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(rng.integers(0, 256, payload_bytes,
                                            dtype=np.uint8).tobytes())
        rows["mime"].append({"image": "image/png", "audio": "audio/wav",
                             "video": "video/mp4"}[kind])
        rows["width"].append(int(rng.integers(64, 1920)) if kind != "audio" else -1)
        rows["height"].append(int(rng.integers(64, 1080)) if kind != "audio" else -1)
        rows["duration_ms"].append(int(rng.integers(500, 60000))
                                   if kind != "image" else -1)
    return pa.table(rows, schema=MEDIA_SCHEMA)


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-embedding from payload bytes (stub decode)."""
    h = hashlib.blake2b(payload, digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(h, "little"))
    return rng.standard_normal(dim).astype(np.float32)


class MediaFeatureExtractor:
    """Actor-pool decode + feature-extract stage.

    STUB: a real deployment passes ``decoder=callable(payload, mime) ->
    np.ndarray``; the default raises NotImplementedError (decode libs
    absent in this environment), ``"fake"`` produces deterministic
    features so the pipeline shape is testable.
    """

    def __init__(self, dim: int = 64, decoder="fake"):
        self.dim = dim
        if decoder == "fake":
            self.decode = lambda payload, mime: _fake_features(payload, dim)
        elif callable(decoder):
            self.decode = decoder
        else:
            def _missing(payload, mime):
                raise NotImplementedError(
                    "media decode requires an image/audio library not "
                    "present in this container; pass decoder=callable "
                    "or decoder='fake'")
            self.decode = _missing

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self.decode(p, m) for p, m in
                 zip(batch["payload"].to_pylist(), batch["mime"].to_pylist())]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "feature": pa.array([f.tolist() for f in feats],
                                    pa.list_(pa.float32())),
            }
        )


def extract_media_features(ds, dim: int = 64, decoder="fake",
                           concurrency: int = 2, batch_size: int = 32):
    """Binary payloads -> fixed-width feature vectors (actor pool, small
    batches: payload_bytes x batch_size x concurrency bounds heap)."""
    class _Stage(MediaFeatureExtractor):
        def __init__(self):
            super().__init__(dim=dim, decoder=decoder)

    return ds.map_batches(_Stage, batch_format="pyarrow",
                          concurrency=concurrency, batch_size=batch_size)


class FrameSampler:
    """Video frame-sampling plumbing: emits (media_id, frame_idx, ts_ms)
    rows for every sampled frame; the pixel decode itself is the same
    stub hook as above."""

    def __init__(self, every_ms: int = 1000):
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, ts = [], [], []
        for mid, kind, dur in zip(batch["media_id"].to_pylist(),
                                  batch["kind"].to_pylist(),
                                  batch["duration_ms"].to_pylist()):
            if kind != "video" or dur <= 0:
                continue
            times = list(range(0, dur, self.every_ms))
            ids.extend([mid] * len(times))
            fidx.extend(range(len(times)))
            ts.extend(times)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "ts_ms": pa.array(ts, pa.int32()),
            }
        )


def sample_frames(ds, every_ms: int = 1000, batch_size: int = 64):
    # stateless -> plain function (cheap elastic tasks, no actor pool)
    sampler = FrameSampler(every_ms=every_ms)
    return ds.map_batches(lambda b: sampler(b), batch_format="pyarrow",
                          batch_size=batch_size)
