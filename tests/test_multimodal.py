"""Multimodal plumbing: schema, actor stages, row expansion, gated codec."""

import hashlib

import pyarrow as pa
import pytest
import ray.data as rd

from kg_gen_ray.stages.multimodal import (
    FakeCodec, PilCodec, FrameSample, features_stage, frame_sample_stage,
    probe_stage, resize_stage)


def media_ds(n=6):
    payloads = [hashlib.md5(f"media{i}".encode()).digest() * (i + 1)
                for i in range(n)]
    return rd.from_arrow(pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "media_type": pa.array(["image/png"] * n, pa.string()),
        "content": pa.array(payloads, pa.binary()),
    }))


def test_probe_stage(ray_session):
    out = probe_stage(media_ds()).take_all()
    assert len(out) == 6
    for r in out:
        assert 16 <= r["width"] < 256 and 16 <= r["height"] < 256
    # deterministic
    again = probe_stage(media_ds()).take_all()
    assert sorted((r["media_id"], r["width"]) for r in out) == \
        sorted((r["media_id"], r["width"]) for r in again)


def test_features_stage(ray_session):
    out = features_stage(media_ds(), dim=8).take_all()
    assert len(out) == 6
    for r in out:
        assert len(r["features"]) == 8


def test_resize_stage(ray_session):
    out = resize_stage(media_ds(), 32, 32).take_all()
    assert len(out) == 6
    for r in out:
        assert isinstance(r["content"], bytes) and len(r["content"]) == 16
    assert {r["media_type"] for r in out} == {"image/png"}


def test_frame_sample_row_expansion(ray_session):
    out = frame_sample_stage(media_ds(3), n_frames=4).take_all()
    assert len(out) == 12
    by_media = {}
    for r in out:
        by_media.setdefault(r["media_id"], []).append(r["frame_id"])
    assert all(sorted(v) == [0, 1, 2, 3] for v in by_media.values())


def _pil_available():
    try:
        import PIL.Image  # noqa: F401
        return True
    except ImportError:
        return False


def test_pil_codec_gated_without_pillow():
    if _pil_available():
        pytest.skip("pillow installed; gate not exercised")
    with pytest.raises(NotImplementedError):
        PilCodec()


@pytest.mark.skipif(not _pil_available(), reason="pillow not installed")
def test_pil_codec_real_roundtrip():
    """With pillow present the codec is REAL: probe reads true dimensions,
    resize re-encodes at the target size, features are deterministic and
    L2-normalized, frame sampling returns n decodable frames."""
    import io

    import numpy as np
    import PIL.Image

    im = PIL.Image.new("RGB", (20, 10), (200, 30, 30))
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    payload = buf.getvalue()

    codec = PilCodec()
    assert codec.probe(payload) == (20, 10)
    resized = codec.resize(payload, 8, 4)
    assert PIL.Image.open(io.BytesIO(resized)).size == (8, 4)
    f1, f2 = codec.features(payload), codec.features(payload)
    assert np.allclose(f1, f2) and abs(np.linalg.norm(f1) - 1) < 1e-5
    frames = codec.sample_frames(payload, 3)
    assert len(frames) == 3
    assert all(PIL.Image.open(io.BytesIO(fr)).size == (20, 10)
               for fr in frames)


# ---------------------------------------------------------------------------
# recorded-fake PIL: exercises PilCodec's real code paths beyond the gate
# (pillow-present tests above skip in this container; the shim does not)
# ---------------------------------------------------------------------------

def test_pil_codec_round_trip_recorded_fake(monkeypatch):
    import io
    import sys
    import types

    import numpy as np

    class _FakeImage:
        """Minimal PIL.Image.Image surface PilCodec touches."""

        def __init__(self, w, h, n_frames=1):
            self.width, self.height = w, h
            self.n_frames = n_frames
            self.seeks, self.saves = [], []

        # context manager + transforms return self (recorded)
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def convert(self, mode):
            self.converted = mode
            return self

        def resize(self, wh):
            self.resized = wh
            return _FakeImage(*wh)

        def seek(self, f):
            self.seeks.append(f)

        def save(self, out, format=None):
            self.saves.append(format)
            out.write(b"PNGBYTES:%dx%d" % (self.width, self.height))

        def __array__(self, dtype=None):
            a = np.full((self.height, self.width), 3.0)
            return a.astype(dtype) if dtype else a

    current = {"img": None}

    def _open(buf):
        assert isinstance(buf, io.BytesIO)
        current["opened"] = buf.getvalue()
        return current["img"]

    pil = types.ModuleType("PIL")
    pil_image = types.ModuleType("PIL.Image")
    pil_image.open = _open
    pil.Image = pil_image
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", pil_image)

    from kg_gen_ray.stages.multimodal import PilCodec
    codec = PilCodec()

    current["img"] = _FakeImage(640, 480)
    assert codec.probe(b"payload-1") == (640, 480)
    assert current["opened"] == b"payload-1"

    # features: 4x4 grayscale thumbnail, L2-normalized, dim=16
    current["img"] = _FakeImage(640, 480)
    v = codec.features(b"payload-2", dim=16)
    assert v.shape == (16,) and v.dtype == np.float32
    assert np.allclose(np.linalg.norm(v), 1.0, atol=1e-5)
    assert current["img"].converted == "L"
    assert current["img"].resized == (4, 4)

    # resize re-encodes at the target size
    current["img"] = _FakeImage(100, 50)
    out = codec.resize(b"payload-3", 32, 16)
    assert out == b"PNGBYTES:32x16"

    # frame sampling: evenly spaced seeks over a 10-frame animation
    current["img"] = _FakeImage(8, 8, n_frames=10)
    frames = codec.sample_frames(b"payload-4", 3)
    assert len(frames) == 3
    assert current["img"].seeks == [0, 3, 6]
    assert all(f == b"PNGBYTES:8x8" for f in frames)
