"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque Arrow ``binary`` cells with typed metadata —
same pattern as the PDF cells: the blob is the intra-row unit of work,
decode/feature stages are actor pools over small pyarrow batches.

The image/audio codec libraries are not available in this container,
so the *decode* step is STUBBED: ``deterministic=True`` (default)
produces a deterministic fake decode (header sniff + content hash +
fake dimensions) so the Ray-side plumbing — schema, batch sizing,
actor signature, output layout — is real and tested;
``deterministic=False`` raises ``NotImplementedError`` marking where a
real codec (Pillow / ffmpeg) plugs in.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import stable_hash64

_MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"GIF8": "gif",
    b"RIFF": "riff-wav",
    b"ID3": "mp3",
    b"\x00\x00\x00 ftyp": "mp4",
}


def sniff_media_format(payload: bytes) -> str:
    for magic, name in _MAGIC.items():
        if payload.startswith(magic):
            return name
    return "unknown"


def synth_media_table(num_rows: int = 64) -> pa.Table:
    """Deterministic fake media table for plumbing tests: binary
    payloads with recognizable magics + metadata columns."""
    kinds = ["image", "audio", "video"]
    magics = [b"\xff\xd8\xff", b"RIFF", b"\x00\x00\x00 ftyp"]
    rows = {"media_id": [], "kind": [], "payload": [], "meta": []}
    for i in range(num_rows):
        k = i % 3
        body = magics[k] + bytes((i * 31 + j) % 256 for j in range(256 + i % 128))
        rows["media_id"].append(i)
        rows["kind"].append(kinds[k])
        rows["payload"].append(body)
        rows["meta"].append('{"source": "synthetic"}')
    return pa.table(
        {
            "media_id": pa.array(rows["media_id"], type=pa.int64()),
            "kind": pa.array(rows["kind"], type=pa.string()),
            "payload": pa.array(rows["payload"], type=pa.binary()),
            "meta": pa.array(rows["meta"], type=pa.string()),
        }
    )


class DecodeMedia:
    """Actor stage: binary payload → decoded metadata (+ features).

    Two modes, selected once per actor in ``__init__``:

    - ``deterministic=True`` (default): a deterministic fake decode
      (header sniff + content hash + hash-derived dimensions) so the
      Ray-side plumbing — schema, batch sizing, actor signature,
      output layout — is real and testable in containers without
      codec libraries, and so the driver's value gate is stable
      whether or not Pillow happens to be installed.
    - ``deterministic=False``: REAL image decode through Pillow,
      imported once at actor construction (the actor-pool pattern:
      codec setup per actor, never per batch). Width/height/format
      come from the decoded image and the feature vector is its
      grayscale histogram folded to ``feature_dim`` bins. Without
      Pillow in the environment this mode raises
      ``NotImplementedError`` at decode time — the honest marker for
      the missing codec, never a silent fallback.
    """

    def __init__(self, deterministic: bool = True, feature_dim: int = 8) -> None:
        self.deterministic = deterministic
        self.feature_dim = feature_dim
        self._pil = None
        if not deterministic:
            try:  # optional dependency: resolved once per actor
                from PIL import Image

                self._pil = Image
            except ImportError:
                self._pil = None

    def _decode_real(self, payload: bytes):
        """Pillow decode: real dimensions/format + a grayscale-histogram
        feature vector (sum-normalized, ``feature_dim`` bins)."""
        import io

        img = self._pil.open(io.BytesIO(payload))
        width, height = img.size
        fmt = (img.format or "unknown").lower()
        hist = np.asarray(img.convert("L").histogram(), dtype=np.float64)
        folded = hist.reshape(self.feature_dim, -1).sum(axis=1)
        total = folded.sum()
        features = (folded / total if total else folded).astype(np.float32)
        h = stable_hash64(payload)
        return fmt, len(payload), int(h >> 1), int(width), int(height), features

    def decode_one(self, payload: bytes):
        if not self.deterministic:
            if self._pil is None:
                raise NotImplementedError(
                    "Real media decode requires Pillow — not in this container."
                )
            return self._decode_real(payload)
        fmt = sniff_media_format(payload)
        h = stable_hash64(payload)
        rng = np.random.RandomState(h % (2**31))
        features = rng.standard_normal(self.feature_dim).astype(np.float32)
        width = 16 + h % 1024
        height = 16 + (h >> 10) % 1024
        return fmt, len(payload), int(h >> 1), int(width), int(height), features

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts, sizes, hashes, ws, hs, feats = [], [], [], [], [], []
        for payload in batch["payload"].to_pylist():
            fmt, size, h, w, ht, f = self.decode_one(payload or b"")
            fmts.append(fmt)
            sizes.append(size)
            hashes.append(h)
            ws.append(w)
            hs.append(ht)
            feats.append(f.tolist())
        out = batch.drop_columns(["payload"])  # blobs do not flow past decode
        out = out.append_column("format", pa.array(fmts, type=pa.string()))
        out = out.append_column("n_bytes", pa.array(sizes, type=pa.int64()))
        out = out.append_column("content_hash", pa.array(hashes, type=pa.int64()))
        out = out.append_column("width", pa.array(ws, type=pa.int32()))
        out = out.append_column("height", pa.array(hs, type=pa.int32()))
        out = out.append_column("features", pa.array(feats, type=pa.list_(pa.float32())))
        return out


class FrameSample:
    """Actor stage for 'video' payloads: deterministic frame sampling —
    splits the blob into ``num_frames`` chunks and emits one row per
    sampled frame (the flat_map-shaped stage of a real video pipeline)."""

    def __init__(self, num_frames: int = 4) -> None:
        self.num_frames = num_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"media_id": [], "frame_idx": [], "frame_hash": []}
        for mid, payload in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            payload = payload or b""
            step = max(1, len(payload) // self.num_frames)
            for fi in range(self.num_frames):
                chunk = payload[fi * step : (fi + 1) * step]
                rows["media_id"].append(mid)
                rows["frame_idx"].append(fi)
                rows["frame_hash"].append(stable_hash64(chunk) >> 1)
        return pa.table(
            {
                "media_id": pa.array(rows["media_id"], type=pa.int64()),
                "frame_idx": pa.array(rows["frame_idx"], type=pa.int32()),
                "frame_hash": pa.array(rows["frame_hash"], type=pa.int64()),
            }
        )


def decode_media(ds, concurrency=(1, 4), batch_size: int = 16,
                 deterministic: bool = True):
    """Media decode pipeline stage (small batches: blobs are wide rows).
    ``deterministic=False`` switches the actors to real Pillow decode
    (see :class:`DecodeMedia`)."""
    return ds.map_batches(
        DecodeMedia,
        fn_constructor_kwargs={"deterministic": deterministic},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )


def sample_frames(ds, num_frames: int = 4, concurrency=(1, 4), batch_size: int = 16):
    return ds.map_batches(
        FrameSample,
        fn_constructor_kwargs={"num_frames": num_frames},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
