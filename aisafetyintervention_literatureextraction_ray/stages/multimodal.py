"""Multimodal (image/audio/video) column stages.

Media are opaque ``binary`` payloads addressed by the ``media_ref``
column of the interleaved-doc spans (BASELINE.json input_hint; the
reference's PDF bytes are the same pattern — opaque pass-through,
``extract.py:33-34``).  Decode / feature-extraction / resize /
frame-sampling run as actor-pool ``map_batches`` stages with SMALL batch
sizes (large binary rows: batch x concurrency must fit worker heap).

The actual codecs (PIL / torchaudio / ffmpeg) are NOT in this
container.  Decode is therefore STUBBED: if a real library import
succeeds it is used; otherwise a clearly-marked deterministic fake
derives pseudo metadata/features from the payload bytes, so the Ray
plumbing — schema, actor signature, batch sizing, output layout — is
real and tested end-to-end.  Swapping in a real decoder changes only
``_decode_real``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    pa.field("media_ref", pa.string()),
    pa.field("kind", pa.string()),          # image | audio | video
    pa.field("payload", pa.large_binary()),
])

FEATURE_DIM = 64

MEDIA_FEATURES_SCHEMA = pa.schema([
    pa.field("media_ref", pa.string()),
    pa.field("kind", pa.string()),
    pa.field("width", pa.int32()),           # image/video; -1 otherwise
    pa.field("height", pa.int32()),
    pa.field("duration_ms", pa.int32()),     # audio/video; -1 otherwise
    pa.field("n_frames_sampled", pa.int32()),
    pa.field("features", pa.list_(pa.float32(), FEATURE_DIM)),
])


def synth_media_table(doc_spans: pa.Table, seed: int = 42) -> pa.Table:
    """Deterministic payloads for every media span in a docs table —
    the fixture side of the media pipeline (payload bytes derived from
    media_ref, so any worker can regenerate them)."""
    spans = doc_spans.column("spans").combine_chunks()
    flat = spans.flatten()
    kinds = flat.field("kind").to_pylist()
    refs = flat.field("media_ref").to_pylist()
    rows = []
    for kind, ref in zip(kinds, refs):
        if kind == "text" or not ref:
            continue
        rng = np.random.default_rng(
            int.from_bytes(hashlib.blake2b(ref.encode(), digest_size=4).digest(),
                           "little") ^ seed)
        payload = rng.integers(0, 256, size=int(rng.integers(64, 2048)),
                               dtype=np.uint8).tobytes()
        rows.append({"media_ref": ref, "kind": kind, "payload": payload})
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


class MediaFeatureExtractor:
    """Actor-pool decode + feature-extraction stage.

    ``__init__`` loads the codec once per actor (or falls back to the
    deterministic stub); ``__call__`` processes one small batch.  Use
    ``map_batches(MediaFeatureExtractor, batch_size=32, concurrency=N)``
    — batches stay small because payloads are large binary.
    """

    def __init__(self, target_size: tuple[int, int] = (224, 224),
                 frame_stride: int = 10) -> None:
        self.target_size = target_size
        self.frame_stride = frame_stride
        try:  # real decoder path (not available in this container)
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            self._pil = None

    # -- real decode path (unreachable here; kept for the swap-in) ------
    def _decode_real(self, payload: bytes):  # pragma: no cover
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg, not present in this "
            "container; the deterministic stub below is used instead")

    # -- deterministic stub ---------------------------------------------
    def _decode_stub(self, kind: str, payload: bytes):
        digest = hashlib.blake2b(payload, digest_size=16).digest()
        rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
        width = height = duration = -1
        n_frames = 0
        if kind in ("image", "video"):
            width, height = self.target_size  # "resized" output dims
        if kind in ("audio", "video"):
            duration = int(rng.integers(500, 60_000))
        if kind == "video":
            n_frames = max(1, duration // (self.frame_stride * 100))
        feats = rng.standard_normal(FEATURE_DIM).astype(np.float32)
        feats /= max(float(np.linalg.norm(feats)), 1e-9)
        return width, height, duration, n_frames, feats

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        w, h, dur, nf, feats = [], [], [], [], []
        for kind, payload in zip(kinds, payloads):
            if self._pil is not None and kind == "image":
                decoded = self._decode_real(payload)  # pragma: no cover
            else:
                decoded = self._decode_stub(kind, payload or b"")
            w.append(decoded[0]); h.append(decoded[1]); dur.append(decoded[2])
            nf.append(decoded[3]); feats.append(decoded[4])
        flat = (np.stack(feats).reshape(-1) if feats
                else np.empty(0, dtype=np.float32))
        return pa.table({
            "media_ref": batch.column("media_ref"),
            "kind": batch.column("kind"),
            "width": pa.array(w, type=pa.int32()),
            "height": pa.array(h, type=pa.int32()),
            "duration_ms": pa.array(dur, type=pa.int32()),
            "n_frames_sampled": pa.array(nf, type=pa.int32()),
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(flat, type=pa.float32()), FEATURE_DIM),
        })


def media_features(media_ds, *, concurrency: int | tuple[int, int] = (1, 4),
                   batch_size: int = 32):
    """media table -> MEDIA_FEATURES_SCHEMA dataset (streaming)."""
    return media_ds.map_batches(
        MediaFeatureExtractor, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency)
