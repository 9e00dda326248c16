"""Multimodal columns: opaque ``binary`` payloads with typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns plus a
``media_type`` string and metadata columns; decode / feature-extract /
resize / frame-sample are actor-pool ``map_batches`` stages. The decode
libraries (PIL / ffmpeg / torchaudio) are NOT in this container, so the
codec layer is pluggable: :class:`FakeCodec` is a deterministic stand-in
(dimensions and features derived from the payload bytes via md5) that keeps
the Ray-side plumbing — schema, batch sizing, actor signature, output
layout — real and tested; :class:`PilCodec` raises
``NotImplementedError`` unless PIL is importable.

Batch-size guidance: payloads are MBs-wide; callers should pass a small
``batch_size`` (e.g. 16-64) so batch x concurrency fits the worker heap,
and keep these stages in ``batch_format="pyarrow"`` (binary columns do not
round-trip pandas cleanly).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from kg_gen_ray.stages.common import drop_null_rows, elastic_concurrency

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),      # "image/png", "audio/wav", ...
    ("content", pa.binary()),
])


class FakeCodec:
    """Deterministic stand-in decoder: md5(payload) -> (width, height),
    16-dim feature vector, and resize/frame-sample outputs."""

    def probe(self, payload: bytes) -> tuple[int, int]:
        h = hashlib.md5(payload).digest()
        return 16 + h[0] % 240, 16 + h[1] % 240

    def features(self, payload: bytes, dim: int = 16) -> np.ndarray:
        seed = int(hashlib.md5(payload).hexdigest()[:8], 16)
        v = np.random.RandomState(seed).randn(dim)
        return (v / np.linalg.norm(v)).astype(np.float32)

    def resize(self, payload: bytes, w: int, h: int) -> bytes:
        # deterministic "resized" payload: tagged digest (a real codec
        # returns re-encoded bytes)
        return hashlib.md5(b"%dx%d:" % (w, h) + payload).digest()

    def sample_frames(self, payload: bytes, n: int) -> list:
        return [hashlib.md5(b"frame%d:" % i + payload).digest()
                for i in range(n)]


class PilCodec:
    """Real image codec over PIL (pillow), import-gated: constructing it
    without pillow installed raises ``NotImplementedError`` at actor init
    (the honest availability gate — never an AttributeError deep inside a
    Ray task at first batch). With pillow present, every method is a real
    implementation over the decoded image:

    * ``probe`` -> actual (width, height),
    * ``features`` -> an L2-normalized 4x4 grayscale thumbnail (dim=16) —
      a deterministic perceptual fingerprint usable for embedding near-dup,
    * ``resize`` -> re-encoded PNG bytes at the target size,
    * ``sample_frames`` -> ``n`` evenly-spaced frames for multi-frame
      formats (GIF/TIFF), PNG-encoded; a single-frame image yields its
      one frame repeated.
    """

    def __init__(self):
        try:
            import PIL.Image
        except ImportError as e:
            raise NotImplementedError(
                "PIL is not installed in this environment; use FakeCodec "
                "for plumbing tests or install pillow") from e
        self._Image = PIL.Image

    def _open(self, payload: bytes):
        import io
        return self._Image.open(io.BytesIO(payload))

    def probe(self, payload: bytes) -> tuple[int, int]:
        with self._open(payload) as im:
            return im.width, im.height

    def features(self, payload: bytes, dim: int = 16) -> np.ndarray:
        side = max(1, int(np.sqrt(dim)))
        with self._open(payload) as im:
            thumb = im.convert("L").resize((side, side))
            v = np.asarray(thumb, dtype=np.float32).ravel()
        if len(v) < dim:
            v = np.pad(v, (0, dim - len(v)))
        v = v[:dim]
        norm = np.linalg.norm(v)
        return (v / norm if norm else v).astype(np.float32)

    def resize(self, payload: bytes, w: int, h: int) -> bytes:
        import io
        with self._open(payload) as im:
            out = io.BytesIO()
            im.resize((w, h)).save(out, format="PNG")
            return out.getvalue()

    def sample_frames(self, payload: bytes, n: int) -> list:
        import io
        frames = []
        with self._open(payload) as im:
            total = getattr(im, "n_frames", 1)
            picks = [min(total - 1, int(i * total / n)) for i in range(n)]
            for f in picks:
                if total > 1:
                    im.seek(f)
                out = io.BytesIO()
                im.convert("RGB").save(out, format="PNG")
                frames.append(out.getvalue())
        return frames


class MediaProbe:
    """Actor: decode headers -> (media_id, media_type, width, height).
    Codec construction happens once per actor."""

    def __init__(self, codec_cls=FakeCodec):
        self.codec = codec_cls()

    def __call__(self, batch: pa.Table) -> pa.Table:
        dims = [self.codec.probe(p) for p in batch["content"].to_pylist()]
        return pa.table({
            "media_id": batch["media_id"],
            "media_type": batch["media_type"],
            "width": pa.array([w for w, _ in dims], pa.int32()),
            "height": pa.array([h for _, h in dims], pa.int32()),
        })


class MediaFeatures:
    """Actor: payload -> feature vector (list<float32>)."""

    def __init__(self, codec_cls=FakeCodec, dim: int = 16):
        self.codec = codec_cls()
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self.codec.features(p, self.dim).tolist()
                 for p in batch["content"].to_pylist()]
        return pa.table({
            "media_id": batch["media_id"],
            "features": pa.array(feats, pa.list_(pa.float32())),
        })


class MediaResize:
    """Actor: payload -> resized payload (binary out, same id)."""

    def __init__(self, width: int, height: int, codec_cls=FakeCodec):
        self.codec = codec_cls()
        self.width = width
        self.height = height

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [self.codec.resize(p, self.width, self.height)
               for p in batch["content"].to_pylist()]
        return pa.table({
            "media_id": batch["media_id"],
            "media_type": batch["media_type"],
            "content": pa.array(out, pa.binary()),
        })


class FrameSample:
    """Actor: video payload -> one row per sampled frame (row-expanding)."""

    def __init__(self, n_frames: int, codec_cls=FakeCodec):
        self.codec = codec_cls()
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fids, frames = [], [], []
        for mid, p in zip(batch["media_id"].to_pylist(),
                          batch["content"].to_pylist()):
            for i, fr in enumerate(self.codec.sample_frames(p, self.n_frames)):
                ids.append(mid)
                fids.append(i)
                frames.append(fr)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_id": pa.array(fids, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })


def probe_stage(media: "ray.data.Dataset", concurrency=None,
                batch_size: int = 32,
                codec_cls=FakeCodec) -> "ray.data.Dataset":
    media = drop_null_rows(media, "content")   # null payload: undecodable
    return media.map_batches(MediaProbe, batch_format="pyarrow",
                             fn_constructor_kwargs={"codec_cls": codec_cls},
                             batch_size=batch_size,
                             concurrency=elastic_concurrency(concurrency),
                             zero_copy_batch=True)


def features_stage(media: "ray.data.Dataset", dim: int = 16,
                   concurrency=None, batch_size: int = 32,
                   codec_cls=FakeCodec) -> "ray.data.Dataset":
    media = drop_null_rows(media, "content")   # null payload: undecodable
    return media.map_batches(MediaFeatures, batch_format="pyarrow",
                             fn_constructor_kwargs={"dim": dim,
                                                    "codec_cls": codec_cls},
                             batch_size=batch_size,
                             concurrency=elastic_concurrency(concurrency),
                             zero_copy_batch=True)


def resize_stage(media: "ray.data.Dataset", width: int, height: int,
                 concurrency=None, batch_size: int = 16,
                 codec_cls=FakeCodec) -> "ray.data.Dataset":
    media = drop_null_rows(media, "content")   # null payload: undecodable
    return media.map_batches(MediaResize, batch_format="pyarrow",
                             fn_constructor_args=(width, height),
                             fn_constructor_kwargs={"codec_cls": codec_cls},
                             batch_size=batch_size,
                             concurrency=elastic_concurrency(concurrency),
                             zero_copy_batch=True)


def frame_sample_stage(media: "ray.data.Dataset", n_frames: int,
                       concurrency=None, batch_size: int = 8,
                       codec_cls=FakeCodec) -> "ray.data.Dataset":
    media = drop_null_rows(media, "content")   # null payload: undecodable
    return media.map_batches(FrameSample, batch_format="pyarrow",
                             fn_constructor_args=(n_frames,),
                             fn_constructor_kwargs={"codec_cls": codec_cls},
                             batch_size=batch_size,
                             concurrency=elastic_concurrency(concurrency),
                             zero_copy_batch=True)
