"""Real JPEG codec (functions/jpeg.py): roundtrip invariants, and
ground-truth cross-checks against ``javax.imageio`` — the same JVM codec
the reference's OpenIMAJ face-detection stack decodes with
(``FaceDetectionAnalyser.java:112-160``) — on the reference's own
facedetection corpus (baseline, progressive, grayscale, 4:2:0)."""

import glob
import os
import shutil
import subprocess

import numpy as np
import pytest

from webarchive_discovery_spark.functions.imaging import psnr
from webarchive_discovery_spark.functions.jpeg import (
    _ZZ,
    decode_jpeg,
    encode_jpeg,
    jpeg_dims,
)

_FACES = "/root/reference/warc-openimaj/src/test/resources/facedetection"
_16PX = "/root/reference/warc-indexer/src/test/resources/16px-photo.jpg"

_DUMP_JAVA = """
import javax.imageio.ImageIO;
import java.awt.image.BufferedImage;
import java.awt.image.Raster;
import java.io.*;
public class Dump {
    public static void main(String[] a) throws Exception {
        BufferedImage img = ImageIO.read(new File(a[0]));
        int w = img.getWidth(), h = img.getHeight();
        Raster r = img.getRaster();
        // 1-band: dump raw Y (ImageIO's getRGB would gamma-convert linear
        // gray -> sRGB, which is not the JFIF convention)
        boolean gray = r.getNumBands() == 1;
        DataOutputStream out = new DataOutputStream(
            new BufferedOutputStream(new FileOutputStream(a[1])));
        out.writeBytes("P6\\n" + w + " " + h + "\\n255\\n");
        for (int y = 0; y < h; y++) for (int x = 0; x < w; x++) {
            if (gray) {
                int v = r.getSample(x, y, 0);
                out.writeByte(v); out.writeByte(v); out.writeByte(v);
            } else {
                int p = img.getRGB(x, y);
                out.writeByte((p >> 16) & 255);
                out.writeByte((p >> 8) & 255);
                out.writeByte(p & 255);
            }
        }
        out.close();
    }
}
"""


@pytest.fixture(scope="module")
def java_decode(tmp_path_factory):
    if shutil.which("javac") is None or shutil.which("java") is None:
        pytest.skip("no JDK on this host")
    d = tmp_path_factory.mktemp("jdump")
    (d / "Dump.java").write_text(_DUMP_JAVA)
    subprocess.run(["javac", "Dump.java"], cwd=d, check=True)

    def run(path_or_bytes):
        if isinstance(path_or_bytes, bytes):
            src = d / "in.jpg"
            src.write_bytes(path_or_bytes)
            path = str(src)
        else:
            path = path_or_bytes
        out = d / "out.ppm"
        subprocess.run(["java", "-cp", str(d), "Dump", path, str(out)],
                       check=True)
        raw = out.read_bytes()
        parts = raw.split(b"\n", 3)
        w, h = map(int, parts[1].split())
        return np.frombuffer(parts[3], np.uint8).reshape(h, w, 3)

    return run


def _photo(h, w, seed=11):
    # smooth gradients + sigma-2 sensor noise: additive noise above ~sigma 2
    # is itself the PSNR ceiling (20*log10(255/sigma) ~ 38.6 dB at sigma 3),
    # so heavier noise tests the noise, not the codec
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([
        128 + 80 * np.sin(xx / 19) + 30 * np.cos(yy / 13),
        100 + 60 * np.cos(xx / 23 + yy / 17),
        140 + 50 * np.sin((xx + yy) / 29),
    ], axis=-1)
    return np.clip(base + rng.normal(0, 2, base.shape), 0, 255).astype(np.uint8)


def test_zigzag_matches_spec():
    assert list(_ZZ[:16]) == [0, 1, 8, 16, 9, 2, 3, 10,
                              17, 24, 32, 25, 18, 11, 4, 5]
    assert sorted(_ZZ.tolist()) == list(range(64))


def test_roundtrip_psnr_and_dims():
    img = _photo(96, 120)
    for q, floor in ((75, 38.0), (90, 40.0), (95, 41.0)):
        enc = encode_jpeg(img, q)
        assert jpeg_dims(enc) == (120, 96)
        assert psnr(img, decode_jpeg(enc)) >= floor


def test_roundtrip_odd_dimensions():
    img = _photo(93, 115, seed=3)
    dec = decode_jpeg(encode_jpeg(img, 95))
    assert dec.shape == (93, 115, 3)
    assert psnr(img, dec) >= 40.0


def test_flat_image_lossless():
    flat = np.full((24, 40, 3), 200, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, 90)), flat)


def test_corrupt_stream_raises():
    from webarchive_discovery_spark.functions.jpeg import JpegError

    import struct

    with pytest.raises(JpegError):
        decode_jpeg(b"\x00\x01\x02")  # no SOI
    lossless_sof = (b"\xFF\xD8\xFF\xC3" + struct.pack(">H", 11)
                    + b"\x08\x00\x10\x00\x10\x01\x01\x11\x00")
    with pytest.raises(JpegError):
        decode_jpeg(lossless_sof)  # SOF3 (lossless) unsupported


def test_encoder_output_decodes_in_imageio(java_decode):
    """North-rule invariant against an INDEPENDENT codec: bytes we encode,
    decoded by the JVM's ImageIO, match the source pixels at PSNR ≥ 40 dB
    (lossy format, BASELINE.json input_hint)."""
    img = _photo(64, 80, seed=21)
    truth = java_decode(encode_jpeg(img, 95))
    assert truth.shape == img.shape
    assert psnr(img, truth) >= 40.0


@pytest.mark.skipif(not os.path.isfile(_16PX), reason="reference not mounted")
def test_reference_baseline_fixture(java_decode):
    data = open(_16PX, "rb").read()
    mine = decode_jpeg(data)
    assert jpeg_dims(data) == (16, 16) and mine.shape == (16, 16, 3)
    assert psnr(java_decode(_16PX), mine) >= 40.0


@pytest.mark.skipif(not os.path.isdir(_FACES), reason="reference not mounted")
def test_reference_facedetection_corpus(java_decode):
    """One fixture per flavor (keeps runtime bounded): baseline 4:2:0
    color, progressive, and baseline grayscale — each must agree with
    ImageIO at ≥ 35 dB (decoders legitimately differ in IDCT rounding and
    chroma upsampling interpolation; 35 dB is far past any structural
    bug, cf. the 11-19 dB reads a transposed zigzag produces)."""
    picks = [
        f"{_FACES}/none/43300752325_aeaf023916_z.jpg",    # baseline color
        f"{_FACES}/cat/ChristmasSocks.jpg",               # progressive
        f"{_FACES}/human/31090844735_a35bbb7035_z.jpg",   # grayscale
    ]
    for p in picks:
        data = open(p, "rb").read()
        mine = decode_jpeg(data)
        dims = jpeg_dims(data)
        assert dims == (mine.shape[1], mine.shape[0])
        assert psnr(java_decode(p), mine) >= 35.0, p
