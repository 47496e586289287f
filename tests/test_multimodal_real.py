"""Real-codec decode test (VERDICT r5 item 5): runs wherever Pillow is
installed, pytest-skips in this sandbox (no Pillow, installs prohibited —
constraint recorded in SURVEY §7 "Hard parts" item 0).

The payload is a hand-crafted minimal 1x1 red PNG (public byte layout:
signature + IHDR + IDAT + IEND), so generating the fixture needs no codec
library either.
"""

from __future__ import annotations

import base64

import pytest

# 1x1 red pixel, RGB, no interlace — standard minimal PNG
_PNG_1X1_RED = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR4nGP8"
    "z8DwHwAFBQIAX8jx0gAAAABJRU5ErkJggg=="
)


def test_decode_image_real_on_minimal_png():
    pytest.importorskip("PIL")
    from emr_flink_example_spark.operators.multimodal import decode_image_real

    meta = decode_image_real(_PNG_1X1_RED)
    assert meta["width"] == 1
    assert meta["height"] == 1
    assert meta["format"] == "png"
    assert meta["byte_len"] == len(_PNG_1X1_RED)


def test_decode_image_real_raises_cleanly_without_pillow():
    """In codec-free environments the seam must fail loudly and typed —
    NotImplementedError, not a deep ImportError from inside a UDF batch."""
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow present: the NotImplementedError branch is dead here")
    except ImportError:
        pass
    from emr_flink_example_spark.operators.multimodal import decode_image_real

    with pytest.raises(NotImplementedError):
        decode_image_real(_PNG_1X1_RED)
