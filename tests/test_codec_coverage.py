"""Real-codec branch coverage (round-3 advice item 7).

`multimodal.real_decode` / `imagededup.pixels_from_payload` dispatch to
PIL when importable and to the stdlib header parser (PNG/BMP/PPM)
otherwise.  This container has no PIL, so the JPEG branch can only be
asserted on a cluster that has it — these tests make that explicit:

* with PIL: the in-repo 1×1 baseline JPEG decodes via the PIL branch
  (dimensions + grid extraction + aHash of a flat image == 0);
* without PIL: the SAME payload must fail CLEANLY through the typed
  `unsupported media format` error, never a silent wrong answer;
* either way, `CODEC_COVERAGE.json` records which branch ran so the
  dispatch state is an artifact, not a silently-skipped test.
"""

import base64
import json
import os

import pytest

from llm_scraper_spark.operators.multimodal import HAVE_PIL, HAVE_WHISPER

#: canonical minimal baseline JPEG: 1×1 white pixel (magic FFD8FF).
_JPEG_1x1 = base64.b64decode(
    "/9j/4AAQSkZJRgABAQEAYABgAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8U"
    "HRofHh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/wAALCAABAAEBAREA"
    "/8QAFAABAAAAAAAAAAAAAAAAAAAACf/EABQQAQAAAAAAAAAAAAAAAAAAAAD/2gAIAQEA"
    "AD8AVN//2Q=="
)

_SKIP_NO_PIL = "PIL absent in this container — JPEG branch runs only on clusters that ship it"

_SKIP_NO_WHISPER = (
    "whisper/ffmpeg absent in this container — the real transcription "
    "branch runs only on clusters that ship them"
)


@pytest.fixture(scope="module", autouse=True)
def record_codec_coverage():
    """Write the dispatch-state artifact no matter which branch runs."""
    yield
    art = {
        "have_pil": HAVE_PIL,
        "jpeg_pil_branch": "run" if HAVE_PIL else f"skipped ({_SKIP_NO_PIL})",
        "jpeg_clean_error_branch": (
            "run" if not HAVE_PIL else "skipped (PIL present decodes it)"
        ),
        "stdlib_png_bmp_ppm_branch": "run (tests/test_streaming_multimodal.py)",
        "have_whisper": HAVE_WHISPER,
        "whisper_transcribe_branch": (
            "run" if HAVE_WHISPER else f"skipped ({_SKIP_NO_WHISPER})"
        ),
        "transcribe_stub_and_loud_failure_branch": (
            "run" if not HAVE_WHISPER
            else "skipped (whisper present transcribes for real)"
        ),
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "CODEC_COVERAGE.json"), "w") as f:
        json.dump(art, f, indent=2)
        f.write("\n")


def _payload_df(spark):
    return spark.createDataFrame(
        [(1, bytearray(_JPEG_1x1))], "doc_id long, payload binary"
    )


@pytest.mark.skipif(not HAVE_PIL, reason=_SKIP_NO_PIL)
def test_jpeg_decodes_via_pil_branch(spark):
    from llm_scraper_spark.operators.multimodal import decode_media

    (row,) = decode_media(_payload_df(spark)).collect()
    assert (row.width, row.height) == (1, 1)
    assert row.n_bytes == len(_JPEG_1x1)


@pytest.mark.skipif(not HAVE_PIL, reason=_SKIP_NO_PIL)
def test_jpeg_grid_and_ahash_via_pil_branch(spark):
    from llm_scraper_spark.operators.imagededup import (
        N_PIXELS,
        ahash_from_pixels,
        pixels_from_payload,
    )

    px = pixels_from_payload(_payload_df(spark))
    (row,) = px.collect()
    assert len(row.pixels) == N_PIXELS
    # a flat image has no pixel strictly above the mean: aHash == 0
    (sig,) = ahash_from_pixels(px).collect()
    assert sig.simhash == 0


@pytest.mark.skipif(HAVE_PIL, reason="PIL present decodes JPEG fine")
def test_jpeg_without_pil_fails_with_typed_error(spark):
    """The stdlib fallback must reject JPEG loudly (typed error), not
    misparse it — the dispatch contract a PIL-less executor relies on."""
    from pyspark.errors.exceptions.captured import PythonException

    from llm_scraper_spark.operators.multimodal import decode_media

    with pytest.raises(PythonException, match="unsupported media format"):
        decode_media(_payload_df(spark)).collect()


@pytest.mark.skipif(not HAVE_WHISPER, reason=_SKIP_NO_WHISPER)
def test_video_transcribes_via_whisper_branch(spark):
    """With whisper+ffmpeg present, real=None dispatches to the real
    transcriber; a real (tiny) media payload must produce a transcript
    row with the contract schema."""
    from llm_scraper_spark.operators.multimodal import transcribe_media

    (row,) = transcribe_media(_payload_df(spark)).collect()
    assert isinstance(row.transcript, str)
    assert row.n_chars == len(row.transcript)


def test_transcribe_dispatch_without_whisper(spark):
    """Without whisper: real=True must fail LOUDLY (never a silent
    stand-in posing as a real transcript); real=None falls back to the
    deterministic stub, which is a pure function of the payload."""
    from llm_scraper_spark.operators.multimodal import transcribe_media

    if HAVE_WHISPER:
        pytest.skip("whisper present: covered by the real-branch test")
    with pytest.raises(RuntimeError, match="whisper/ffmpeg"):
        transcribe_media(_payload_df(spark), real=True)
    rows = transcribe_media(_payload_df(spark)).collect()
    rows2 = transcribe_media(_payload_df(spark)).collect()
    assert rows == rows2
    assert rows[0].transcript and rows[0].n_chars == len(rows[0].transcript)


def test_pixels_from_payload_raises_cleanly_without_pil(spark):
    from llm_scraper_spark.operators import imagededup

    if imagededup.HAVE_PIL:
        pytest.skip("PIL present: covered by the decode tests above")
    with pytest.raises(RuntimeError, match="requires PIL"):
        imagededup.pixels_from_payload(_payload_df(spark))
