"""Full-spec PNG and GIF decoders (functions/png.py, functions/gif.py):
handcrafted streams exercising every PNG filter type and the GIF LZW /
transparency / disposal paths, plus bit-exact ground-truth checks against
``javax.imageio`` on the reference repository's image assets."""

import glob
import os
import shutil
import struct
import subprocess
import zlib

import numpy as np
import pytest

from webarchive_discovery_spark.functions.gif import (
    GifError,
    decode_gif,
    gif_dims,
    gif_frames,
)
from webarchive_discovery_spark.functions.imaging import (
    decode_image,
    image_dims,
    sample_video_frames,
)
from webarchive_discovery_spark.functions.png import (
    PngError,
    decode_png,
    png_dims,
)

_CC_PNG = "/root/reference/warc-indexer/src/test/resources/cc.png"
_DOC_GIFS = "/root/reference/documentation"


# ---------------------------------------------------------------------------
# handcrafted PNG streams (encode with explicit filter types)
# ---------------------------------------------------------------------------

def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_scanlines(img: np.ndarray, filters: list[int]) -> bytes:
    """Apply the PNG filter of choice per row (the encoder side of what
    decode_png undoes)."""
    h, w, nch = img.shape
    bpp = nch
    out = bytearray()
    prev = np.zeros(w * nch, np.int32)
    for y in range(h):
        row = img[y].reshape(-1).astype(np.int32)
        ft = filters[y % len(filters)]
        out.append(ft)
        f = np.empty_like(row)
        for x in range(len(row)):
            a = row[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1, 4: _paeth(a, b, c)}[ft]
            f[x] = (row[x] - pred) & 0xFF
        out += bytes(f.astype(np.uint8))
        prev = row
    return bytes(out)


def _make_png(img: np.ndarray, filters: list[int]) -> bytes:
    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = _filter_scanlines(img, filters)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_all_filter_types(filters):
    rng = np.random.default_rng(sum(filters) + 5)
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(_make_png(img, filters)), img)


def test_png_palette_and_transparency():
    # 4x2, 2-bit palette image, index 3 transparent (composites to white)
    pal = b"\xff\x00\x00" + b"\x00\xff\x00" + b"\x00\x00\xff" + b"\x10\x10\x10"
    # rows of indices: [0,1,2,3] / [3,2,1,0] at depth 2 -> bytes 0b00011011 etc
    raw = bytes([0, 0b00011011, 0, 0b11100100])
    ihdr = struct.pack(">IIBBBBB", 4, 2, 2, 3, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
           + _chunk(b"PLTE", pal) + _chunk(b"tRNS", b"\xff\xff\xff\x00")
           + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    out = decode_png(png)
    assert out.shape == (2, 4, 3)
    assert out[0, 0].tolist() == [255, 0, 0]
    assert out[0, 3].tolist() == [255, 255, 255]  # transparent -> white
    assert out[1, 0].tolist() == [255, 255, 255]  # row 2 = [3,2,1,0]
    assert out[1, 1].tolist() == [0, 0, 255]


def test_png_grayscale_depths():
    # depth-1 gray: 8x1 alternating bits -> black/white
    ihdr = struct.pack(">IIBBBBB", 8, 1, 1, 0, 0, 0, 0)
    raw = bytes([0, 0b10101010])
    png = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    out = decode_png(png)
    assert out[0, 0].tolist() == [255, 255, 255]
    assert out[0, 1].tolist() == [0, 0, 0]


def test_png_rejects_garbage():
    with pytest.raises(PngError):
        decode_png(b"not a png")
    with pytest.raises(PngError):
        decode_png(b"\x89PNG\r\n\x1a\n" + _chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# handcrafted GIF streams (clear-code-per-symbol LZW keeps the encoder tiny)
# ---------------------------------------------------------------------------

def _lzw_literals(indices: list[int], min_code: int) -> bytes:
    """Valid LZW stream emitting CLEAR before every literal — the table
    never grows, so codes stay at min_code+1 bits."""
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    bits = []
    def emit(code):
        for i in range(width):
            bits.append((code >> i) & 1)
    for ix in indices:
        emit(clear)
        emit(ix)
    emit(eoi)
    by = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j, bit in enumerate(bits[i:i + 8]):
            b |= bit << j
        by.append(b)
    return bytes(by)


def _subblocked(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        part = data[i:i + 255]
        out.append(len(part))
        out += part
    out.append(0)
    return bytes(out)


def _make_gif(frames: list[tuple[list[int], int]], w: int, h: int,
              palette: list[tuple[int, int, int]],
              transparent: int = -1) -> bytes:
    """frames: [(indices row-major, delay_cs)]."""
    n = max(2, 1 << (len(palette) - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (n.bit_length() - 2), 0, 0)
    for i in range(n):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        out += bytes([r, g, b])
    min_code = max(2, n.bit_length() - 1)
    for indices, delay in frames:
        out += b"\x21\xf9\x04" + bytes([
            0x01 if transparent >= 0 else 0]) + struct.pack("<H", delay) + bytes(
            [transparent if transparent >= 0 else 0, 0])
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([min_code]) + _subblocked(_lzw_literals(indices, min_code))
    out += b"\x3b"
    return bytes(out)


def test_gif_single_frame():
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    idx = [0, 1, 2, 3, 3, 2, 1, 0]
    gif = _make_gif([(idx, 0)], 4, 2, pal)
    assert gif_dims(gif) == (4, 2)
    out = decode_gif(gif)
    assert out[0, 0].tolist() == [255, 0, 0]
    assert out[1, 3].tolist() == [255, 0, 0]
    assert out[0, 3].tolist() == [9, 9, 9]


def test_gif_transparency_composites_white():
    pal = [(10, 20, 30), (200, 100, 50)]
    gif = _make_gif([([1, 0, 0, 1], 0)], 2, 2, pal, transparent=0)
    out = decode_gif(gif)
    assert out[0, 0].tolist() == [200, 100, 50]
    assert out[0, 1].tolist() == [255, 255, 255]  # transparent -> white


def test_gif_animation_frames_and_sampling():
    pal = [(0, 0, 0), (255, 255, 255), (128, 0, 0), (0, 0, 128)]
    f0 = [0] * 4
    f1 = [1] * 4
    f2 = [2] * 4
    gif = _make_gif([(f0, 10), (f1, 20), (f2, 30)], 2, 2, pal)
    frames = list(gif_frames(gif))
    assert [i for i, _, _ in frames] == [0, 1, 2]
    assert [d for _, d, _ in frames] == [10, 20, 30]
    assert frames[1][2][0, 0].tolist() == [255, 255, 255]
    # the imaging facade samples GIF as a real video container
    sampled = sample_video_frames(gif, every_n=2)
    assert [i for i, _ in sampled] == [0, 2]
    assert image_dims(gif) == (2, 2)


def test_gif_rejects_garbage():
    with pytest.raises(GifError):
        decode_gif(b"JIF89a")


# ---------------------------------------------------------------------------
# ground truth vs javax.imageio on the reference's real assets
# ---------------------------------------------------------------------------

_DUMP_JAVA = """
import javax.imageio.ImageIO;
import java.awt.image.BufferedImage;
import java.awt.image.Raster;
import java.awt.image.IndexColorModel;
import java.io.*;
public class Dump {
    public static void main(String[] a) throws Exception {
        BufferedImage img = ImageIO.read(new File(a[0]));
        int w = img.getWidth(), h = img.getHeight();
        Raster r = img.getRaster();
        boolean gray = r.getNumBands() == 1
            && !(img.getColorModel() instanceof IndexColorModel);
        DataOutputStream out = new DataOutputStream(
            new BufferedOutputStream(new FileOutputStream(a[1])));
        out.writeBytes("P6\\n" + w + " " + h + "\\n255\\n");
        for (int y = 0; y < h; y++) for (int x = 0; x < w; x++) {
            if (gray) {
                int v = r.getSample(x, y, 0);
                out.writeByte(v); out.writeByte(v); out.writeByte(v);
            } else {
                int p = img.getRGB(x, y);
                int al = (p >>> 24) & 255;
                int rr = (p >> 16) & 255, gg = (p >> 8) & 255, bb = p & 255;
                rr = (rr * al + 255 * (255 - al) + 127) / 255;
                gg = (gg * al + 255 * (255 - al) + 127) / 255;
                bb = (bb * al + 255 * (255 - al) + 127) / 255;
                out.writeByte(rr); out.writeByte(gg); out.writeByte(bb);
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

    def run(path):
        out = d / "out.ppm"
        subprocess.run(["java", "-cp", str(d), "Dump", path, str(out)],
                       check=True)
        raw = out.read_bytes()
        parts = raw.split(b"\n", 3)
        w, h = map(int, parts[1].split())
        return np.frombuffer(parts[3], np.uint8).reshape(h, w, 3)

    return run


@pytest.mark.skipif(not os.path.isfile(_CC_PNG), reason="reference not mounted")
def test_reference_png_bit_exact(java_decode):
    data = open(_CC_PNG, "rb").read()
    mine = decode_png(data)
    assert png_dims(data) == (217, 217)
    assert np.array_equal(mine, java_decode(_CC_PNG))
    # the imaging facade reaches the same decoder for foreign PNGs
    assert np.array_equal(decode_image(data, "png"), mine)


@pytest.mark.skipif(not os.path.isdir(_DOC_GIFS), reason="reference not mounted")
def test_reference_gifs_bit_exact(java_decode):
    paths = sorted(glob.glob(f"{_DOC_GIFS}/*.gif"))
    assert paths
    for p in paths:
        data = open(p, "rb").read()
        mine = decode_gif(data)
        assert gif_dims(data) == (mine.shape[1], mine.shape[0])
        assert np.array_equal(mine, java_decode(p)), p
