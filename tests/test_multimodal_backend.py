"""Contract test for the REAL decode branch of DecodeMedia.

The container ships no imaging libraries, so a minimal fake ``PIL``
module is injected to prove the real branch (``backend == "pil"``)
executes end-to-end: library load in ``__init__`` (once per actor),
per-row decode, dimension capture, thumbnail feature extraction, and
the error-degrade path.  When a real PIL lands in the environment the
stage picks it up with zero code changes — this test pins the contract
it must satisfy.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

from go_boilerpipe_ray.functions.multimodal import DecodeMedia, synth_media_table


class _FakeImg:
    """Just enough of PIL.Image.Image for DecodeMedia._decode_pil."""

    def __init__(self, arr: np.ndarray, w: int, h: int):
        self._arr = arr
        self.width = w
        self.height = h

    def convert(self, mode: str) -> "_FakeImg":
        assert mode == "L"
        return self

    def resize(self, size: tuple[int, int]) -> "_FakeImg":
        side_w, side_h = size
        return _FakeImg(
            np.full((side_h, side_w), 128, dtype=np.uint8), side_w, side_h
        )

    def __array__(self, dtype=None, copy=None):
        a = self._arr
        return a.astype(dtype) if dtype is not None else a


@pytest.fixture
def fake_pil(monkeypatch):
    fake_image_mod = types.ModuleType("PIL.Image")

    def _open(buf):
        data = buf.read()
        if len(data) < 8:  # "corrupt" marker for the degrade-path test
            raise ValueError("cannot identify image file")
        return _FakeImg(np.zeros((2, 2), dtype=np.uint8), 640, 480)

    fake_image_mod.open = _open
    fake_pil_mod = types.ModuleType("PIL")
    fake_pil_mod.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil_mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)
    return fake_pil_mod


def test_pil_branch_decodes_images(fake_pil):
    stage = DecodeMedia()
    assert stage.backend == "pil"

    batch = synth_media_table(6, payload_bytes=64)
    out = stage(batch)
    assert out.column_names == [
        "media_ref", "kind", "width", "height", "feature", "decoded",
    ]
    kinds = out.column("kind").to_pylist()
    decoded = out.column("decoded").to_pylist()
    widths = out.column("width").to_pylist()
    heights = out.column("height").to_pylist()
    feats = out.column("feature").to_pylist()
    for k, d, w, h, f in zip(kinds, decoded, widths, heights, feats):
        if k == "image":
            # Real branch: dimensions come from the decoded image, the
            # feature is the 4x4 grayscale thumbnail scaled to [0, 1].
            assert d is True and (w, h) == (640, 480)
            assert len(f) == 16
            assert all(abs(x - 128.0 / 255.0) < 1e-6 for x in f)
        else:
            # Audio has no real backend here: deterministic stub,
            # flagged decoded=False under a real-image backend.
            assert d is False and len(f) == 16


def test_pil_branch_degrades_on_corrupt_payload(fake_pil):
    import pyarrow as pa

    stage = DecodeMedia()
    batch = pa.table(
        {
            "media_ref": pa.array(["media://syn/bad"], pa.string()),
            "kind": pa.array(["image"], pa.string()),
            "payload": pa.array([b"xx"], pa.binary()),  # < 8 bytes: raises
            "meta_width": pa.array([64], pa.int32()),
            "meta_height": pa.array([64], pa.int32()),
        }
    )
    out = stage(batch)
    assert out.column("decoded").to_pylist() == [False]
    assert len(out.column("feature")[0].as_py()) == 16  # stub feature


def test_stub_branch_without_pil():
    # In this container PIL truly is absent: the constructor must fall
    # back to the stub and mark rows decoded=True (stub IS the backend).
    if any(m in sys.modules for m in ("PIL", "PIL.Image")):
        pytest.skip("real or fake PIL present")
    stage = DecodeMedia()
    assert stage.backend == "stub"
    out = stage(synth_media_table(3, payload_bytes=32))
    assert out.column("decoded").to_pylist() == [True, True, True]
