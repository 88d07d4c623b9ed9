"""Multimodal (image / audio / video) pipeline stages — plumbing-real,
decode-stubbed.

Per the build brief: media payloads are opaque ``binary`` columns with
typed metadata; decode / resize / feature-extract / frame-sample run as
actor-pool ``map_batches`` stages (model/codec loaded once per actor in
``__init__``). The image/audio codec libraries are NOT in this
container, so the decode kernels are deterministic fakes behind an
import-try (``pillow`` / ``soundfile`` would slot into ``__init__``);
everything Ray-side — schema, batch sizing, actor signature, output
layout — is real and tested.

Memory note (SURVEY.md §7.3 "very wide records"): media rows are large,
so these stages use SMALL batch sizes (default 64) and Arrow binary
buffers end-to-end; never convert payload columns to pandas objects.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("meta_width", pa.int32()),
        ("meta_height", pa.int32()),
        ("meta_sample_rate", pa.int32()),
        ("meta_n_frames", pa.int32()),
    ]
)

DEFAULT_MEDIA_BATCH_SIZE = 64  # large binary rows -> small batches


# input synthesis lives with the other synthetic-input generators;
# re-exported here because the media stages and their tests are the
# natural import site
from embulk_input_marketo_ray.synth import synth_media_table  # noqa: F401


def _codec_available(name: str) -> bool:
    try:
        __import__(name)
        return True
    except ImportError:
        return False


class ImageDecoder:
    """Actor-pool stage: binary payload -> decoded pixel tensor column.

    ``__init__`` would load the codec (PIL) once per actor; this
    container has none, so decode is a deterministic fake: pixels are
    derived from the payload hash at the metadata's (h, w). Output is
    a fixed-shape uint8 tensor column (Arrow FixedSizeList), plus a
    ``decode_ok`` flag — the layout a real decoder would produce.
    """

    THUMB = 16  # decode-to-thumbnail target, keeps tensors bounded

    def __init__(self, strict: bool = False) -> None:
        self.has_codec = _codec_available("PIL")
        self.strict = strict
        if self.strict and not self.has_codec:
            raise NotImplementedError(
                "real image decode requires pillow, which is not installed; "
                "run with strict=False for the deterministic stub"
            )

    def _decode_stub(self, payload: bytes) -> np.ndarray:
        h = hashlib.blake2b(payload, digest_size=8).digest()
        rng = np.random.default_rng(int.from_bytes(h, "big"))
        return rng.integers(0, 256, size=(self.THUMB, self.THUMB, 3), dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("payload")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        pixels = np.stack(
            [
                self._decode_stub(v.as_py() if v.is_valid else b"")
                for v in col
            ]
        )
        flat = pa.FixedSizeListArray.from_arrays(
            pa.array(pixels.reshape(-1), type=pa.uint8()), self.THUMB * self.THUMB * 3
        )
        ok = pa.array([v.is_valid for v in col], type=pa.bool_())
        return batch.append_column("pixels", flat).append_column("decode_ok", ok)


class ImageResizer:
    """Actor-pool stage: pixel tensor -> mean-pooled (factor x factor)."""

    def __init__(self, factor: int = 2, src_side: int = ImageDecoder.THUMB) -> None:
        self.factor = factor
        self.src = src_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        s, f = self.src, self.factor
        px = (
            np.asarray(batch.column("pixels").combine_chunks().flatten())
            .reshape(n, s, s, 3)
            .astype(np.float32)
        )
        out = px.reshape(n, s // f, f, s // f, f, 3).mean(axis=(2, 4)).astype(np.uint8)
        side = s // f
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(out.reshape(-1), type=pa.uint8()), side * side * 3
        )
        return batch.append_column("pixels_small", col)


class FrameSampler:
    """Actor-pool stage: video payload -> k evenly-spaced 'frames'
    (byte slices standing in for decoded frames), exploded one row per
    frame — the flat_map-shaped output a real frame sampler has."""

    def __init__(self, k: int = 4) -> None:
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, frames = [], [], []
        payloads = batch.column("payload")
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        for mid, nf, v in zip(
            batch.column("media_id").to_pylist(),
            batch.column("meta_n_frames").to_pylist(),
            payloads,
        ):
            raw = v.as_py() if v.is_valid else b""
            n_frames = max(int(nf or 1), 1)
            step = max(n_frames // self.k, 1)
            chunk = max(len(raw) // n_frames, 1)
            for j in list(range(0, n_frames, step))[: self.k]:
                ids.append(mid)
                frame_idx.append(j)
                frames.append(raw[j * chunk : (j + 1) * chunk])
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_index": pa.array(frame_idx, type=pa.int32()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )


class AudioFeaturizer:
    """Actor-pool stage: audio payload -> fixed-size feature vector
    (stub MFCC: hash-seeded floats; a real extractor would load its
    model in __init__ and batch its inference)."""

    N_FEATURES = 13

    def __init__(self) -> None:
        self.has_codec = _codec_available("soundfile")

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("payload")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        feats = np.stack(
            [
                np.frombuffer(
                    hashlib.blake2b(
                        v.as_py() if v.is_valid else b"", digest_size=self.N_FEATURES * 4
                    ).digest(),
                    dtype=np.float32,
                )
                for v in col
            ]
        )
        fcol = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), type=pa.float32()), self.N_FEATURES
        )
        return batch.append_column("audio_features", fcol)
