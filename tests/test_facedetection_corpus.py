"""Face-detection pipeline over the reference's REAL photo corpus
(``warc-openimaj/src/test/resources/facedetection/``), decoded by our own
JPEG codec — the end-to-end path ``FaceDetectionAnalyser.java:112-160``
runs (decode → detect → face fragments).

Parity caveat, stated honestly: the reference's golden
(``FaceDetectionParserTest.java:70-100``) asserts exact per-image counts
from OpenIMAJ's *trained* Haar cascades (1 cat face per cat photo; 1/1/8
human faces; 0 in the none photo).  Our detector is the documented
stand-in (skin-blob candidates + a small Haar verifier trained on
synthetic crops — ``functions/facemodel.py``); it does not reproduce
OpenIMAJ's counts on real photos and this test does not pretend it does.
What it pins is everything around the model slot: real-JPEG decode of
every corpus file, batch plumbing, fragment well-formedness, and
determinism — so a production cascade dropped into the ``detector`` slot
inherits a verified pipeline."""

import glob
import os

import pytest

from webarchive_discovery_spark.functions.colours import detect_faces
from webarchive_discovery_spark.functions.jpeg import decode_jpeg

_FACES = "/root/reference/warc-openimaj/src/test/resources/facedetection"


@pytest.mark.skipif(not os.path.isdir(_FACES), reason="reference not mounted")
def test_corpus_decodes_and_detector_runs_deterministically():
    paths = sorted(glob.glob(f"{_FACES}/*/*.jpg"))
    assert len(paths) == 9  # 5 cat + 3 human + 1 none
    for p in paths:
        img = decode_jpeg(open(p, "rb").read())
        assert img.ndim == 3 and img.shape[2] == 3 and img.size > 0
        first = detect_faces(img)
        again = detect_faces(img)
        assert first == again  # deterministic, no RNG in the path
        for kind, x, y, w, h in first:
            assert kind in ("human", "cat")
            assert 0 <= x and 0 < w and x + w <= img.shape[1]
            assert 0 <= y and 0 < h and y + h <= img.shape[0]
