"""Dominant-colour extraction + named-colour matching + face-region detection.

Reference semantics:

- ``FaceDetectionParser.extractDominantColour``
  (``warc-openimaj/src/main/java/uk/bl/wa/tika/parser/imagefeatures/FaceDetectionParser.java:205-223``):
  build a 64-bins-per-channel RGB histogram over the image, take the fullest
  bin, and use that bin's average colour.
- ``ColourMatcher.getMatch``
  (``warc-indexer/src/main/java/uk/bl/wa/util/ColourMatcher.java:103-126``):
  nearest named colour by L1 (sum-of-absolute) RGB distance over the W3C
  SVG 1.1 colour-keyword table, first entry winning ties (strict ``<``);
  golden cases in ``ColourMatcherTest.java:63-69``.
- ``FaceDetectionParser.addFaceRectangle`` (:196-201): faces are reported as
  W3C media-fragment strings ``kind@xywh=x,y,w,h``; the analyser fans them
  into ``image_faces`` (multi-valued) and ``image_faces_count``
  (``FaceDetectionAnalyser.java:145-161``).

The reference detects faces with OpenCV/OpenIMAJ Haar cascades; those model
files don't ship here.  :func:`detect_faces` is the CANDIDATE stage — a
skin-tone mask (classic RGB rule) + exact two-pass connected-component
labelling reporting each component's bounding box.  The default pipeline in
``operators/multimodal.analyse_images`` verifies these candidates with the
committed trained Haar-feature model (:mod:`.facemodel`), completing the
cascade shape; any cascade/CNN detector still drops into the same
``detector`` callable slot.

Everything here is numpy-vectorized; the operators layer wraps it in
Arrow-batched ``mapInPandas`` kernels.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "SVG_COLOURS",
    "match_colour_name",
    "match_colour_names_batch",
    "dominant_colour",
    "dominant_colours_batch",
    "dominant_colour_name",
    "detect_faces",
    "skin_mask_batch",
    "faces_from_mask",
    "faces_from_masks_batch",
    "face_fragments",
]

# The W3C SVG 1.1 / CSS3 extended colour keywords (public spec,
# https://www.w3.org/TR/SVG11/types.html#ColorKeywords), alphabetical — the
# same table the reference loads from its svg-colours.tsv resource.
_SVG_DEF = """
aliceblue f0f8ff antiquewhite faebd7 aqua 00ffff aquamarine 7fffd4
azure f0ffff beige f5f5dc bisque ffe4c4 black 000000 blanchedalmond ffebcd
blue 0000ff blueviolet 8a2be2 brown a52a2a burlywood deb887
cadetblue 5f9ea0 chartreuse 7fff00 chocolate d2691e coral ff7f50
cornflowerblue 6495ed cornsilk fff8dc crimson dc143c cyan 00ffff
darkblue 00008b darkcyan 008b8b darkgoldenrod b8860b darkgray a9a9a9
darkgreen 006400 darkgrey a9a9a9 darkkhaki bdb76b darkmagenta 8b008b
darkolivegreen 556b2f darkorange ff8c00 darkorchid 9932cc darkred 8b0000
darksalmon e9967a darkseagreen 8fbc8f darkslateblue 483d8b
darkslategray 2f4f4f darkslategrey 2f4f4f darkturquoise 00ced1
darkviolet 9400d3 deeppink ff1493 deepskyblue 00bfff dimgray 696969
dimgrey 696969 dodgerblue 1e90ff firebrick b22222 floralwhite fffaf0
forestgreen 228b22 fuchsia ff00ff gainsboro dcdcdc ghostwhite f8f8ff
gold ffd700 goldenrod daa520 gray 808080 green 008000 greenyellow adff2f
grey 808080 honeydew f0fff0 hotpink ff69b4 indianred cd5c5c indigo 4b0082
ivory fffff0 khaki f0e68c lavender e6e6fa lavenderblush fff0f5
lawngreen 7cfc00 lemonchiffon fffacd lightblue add8e6 lightcoral f08080
lightcyan e0ffff lightgoldenrodyellow fafad2 lightgray d3d3d3
lightgreen 90ee90 lightgrey d3d3d3 lightpink ffb6c1 lightsalmon ffa07a
lightseagreen 20b2aa lightskyblue 87cefa lightslategray 778899
lightslategrey 778899 lightsteelblue b0c4de lightyellow ffffe0 lime 00ff00
limegreen 32cd32 linen faf0e6 magenta ff00ff maroon 800000
mediumaquamarine 66cdaa mediumblue 0000cd mediumorchid ba55d3
mediumpurple 9370db mediumseagreen 3cb371 mediumslateblue 7b68ee
mediumspringgreen 00fa9a mediumturquoise 48d1cc mediumvioletred c71585
midnightblue 191970 mintcream f5fffa mistyrose ffe4e1 moccasin ffe4b5
navajowhite ffdead navy 000080 oldlace fdf5e6 olive 808000
olivedrab 6b8e23 orange ffa500 orangered ff4500 orchid da70d6
palegoldenrod eee8aa palegreen 98fb98 paleturquoise afeeee
palevioletred db7093 papayawhip ffefd5 peachpuff ffdab9 peru cd853f
pink ffc0cb plum dda0dd powderblue b0e0e6 purple 800080 red ff0000
rosybrown bc8f8f royalblue 4169e1 saddlebrown 8b4513 salmon fa8072
sandybrown f4a460 seagreen 2e8b57 seashell fff5ee sienna a0522d
silver c0c0c0 skyblue 87ceeb slateblue 6a5acd slategray 708090
slategrey 708090 snow fffafa springgreen 00ff7f steelblue 4682b4
tan d2b48c teal 008080 thistle d8bfd8 tomato ff6347 turquoise 40e0d0
violet ee82ee wheat f5deb3 white ffffff whitesmoke f5f5f5 yellow ffff00
yellowgreen 9acd32
"""

_tokens = _SVG_DEF.split()
#: ordered (name, r, g, b) — order matters for tie-breaking (first wins)
SVG_COLOURS: list[tuple[str, int, int, int]] = [
    (
        _tokens[i],
        int(_tokens[i + 1][0:2], 16),
        int(_tokens[i + 1][2:4], 16),
        int(_tokens[i + 1][4:6], 16),
    )
    for i in range(0, len(_tokens), 2)
]

_NAMES = [c[0] for c in SVG_COLOURS]
_RGB = np.array([[c[1], c[2], c[3]] for c in SVG_COLOURS], dtype=np.int64)


def match_colour_name(r: int, g: int, b: int) -> str:
    """Nearest SVG colour keyword by L1 distance; ties keep the earliest
    table entry (strict ``<`` comparison, ``ColourMatcher.java:112-123``)."""
    d = np.abs(_RGB - np.array([r, g, b], dtype=np.int64)).sum(axis=1)
    return _NAMES[int(np.argmin(d))]  # argmin returns the first minimum


def dominant_colour(rgb: np.ndarray, res: int = 64) -> tuple[int, int, int]:
    """Fullest-histogram-bin average colour (``res`` bins per channel, the
    reference's ``HistogramModel(64,64,64)``).  Vectorized: one flat bincount
    over ``res³`` joint bins, then the mean of the pixels in the max bin."""
    px = rgb.reshape(-1, 3).astype(np.int64)
    q = px * res // 256  # per-channel bin index in [0, res)
    flat = (q[:, 0] * res + q[:, 1]) * res + q[:, 2]
    # unique over the pixels present (≤ n) instead of a res³-wide bincount —
    # ~30× less memory traffic for typical images, identical argmax (ties:
    # both argmax forms take the LOWEST bin index; np.unique is sorted)
    bins, counts = np.unique(flat, return_counts=True)
    top = bins[int(np.argmax(counts))]
    sel = px[flat == top]
    mean = sel.mean(axis=0)
    return int(mean[0]), int(mean[1]), int(mean[2])


def dominant_colour_name(rgb: np.ndarray, res: int = 64) -> str:
    return match_colour_name(*dominant_colour(rgb, res))


def match_colour_names_batch(rgbs: np.ndarray) -> list[str]:
    """Batched :func:`match_colour_name`: (B, 3) int array → B keyword names
    in one (B, table) distance matrix; identical tie-breaking (argmin takes
    the first minimum along the table axis)."""
    d = np.abs(_RGB[None, :, :] - rgbs[:, None, :].astype(np.int64)).sum(axis=2)
    idx = np.argmin(d, axis=1)
    return [_NAMES[int(i)] for i in idx]


def dominant_colours_batch(stack: np.ndarray, res: int = 64) -> np.ndarray:
    """Batched :func:`dominant_colour` over a (B, H, W, 3) uint8 stack of
    SAME-SHAPE images → (B, 3) int array of fullest-bin average colours.
    One global ``np.unique`` with per-image bin offsets replaces B separate
    calls; tie-breaking matches the scalar path exactly (highest count,
    lowest bin index), as does the float-mean-truncated int average.

    Temps are kept int32/uint8 and built in place: this sandbox's VM stalls
    pathologically on first-touch of fresh multi-MB allocations (measured:
    an 18 MB int64 astype took seconds on first call, milliseconds after),
    and at deploy smaller temps are simply less memory traffic — with
    B·cube < 2^31 enforced so int32 global bins are always valid."""
    B = stack.shape[0]
    cube = res ** 3
    if B * cube >= 2 ** 31:
        raise ValueError("chunk too large for int32 bin space; lower the batch size")
    px = stack.reshape(B, -1, 3)
    # per-channel quantization, combined in place (one int32 working array)
    flat = (px[..., 0].astype(np.int32) * res) >> 8  # == *res // 256
    flat *= res
    flat += (px[..., 1].astype(np.int32) * res) >> 8
    flat *= res
    flat += (px[..., 2].astype(np.int32) * res) >> 8  # (B, P) int32
    gflat = flat + (np.arange(B, dtype=np.int32)[:, None] * np.int32(cube))
    bins, counts = np.unique(gflat.ravel(), return_counts=True)
    owner = bins // cube
    # per-owner winner: sort (owner asc, count desc, bin asc), first per owner
    order = np.lexsort((bins, -counts, owner))
    owner_sorted = owner[order]
    first = np.unique(owner_sorted, return_index=True)[1]
    top_local = (bins[order][first]) % cube  # (B,) — every owner has >= 1 bin
    sel = flat == top_local[:, None]  # (B, P) bool
    n_sel = sel.sum(axis=1)
    # uint8 × bool stays uint8 elementwise; the accumulator is int64
    sums = np.stack(
        [(px[..., c] * sel).sum(axis=1, dtype=np.int64) for c in range(3)], axis=1
    )
    return (sums / n_sel[:, None]).astype(np.int64)


def _skin_mask(rgb: np.ndarray) -> np.ndarray:
    """Classic RGB skin-tone rule (public heuristic: R>95, G>40, B>20,
    R>G, R>B, max-min channel spread > 15).  Shape-agnostic: works on one
    (H, W, 3) image or a (B, H, W, 3) stack."""
    m = rgb.astype(np.int16)
    r, g, b = m[..., 0], m[..., 1], m[..., 2]
    # r>g & r>b makes r the max channel, so spread = r - min(g, b)
    spread = r - np.minimum(g, b)
    return (r > 95) & (g > 40) & (b > 20) & (r > g) & (r > b) & (spread > 15)


def skin_mask_batch(stack: np.ndarray) -> np.ndarray:
    """(B, H, W, 3) stack → (B, H, W) bool skin masks in one pass."""
    return _skin_mask(stack)


def _label_components(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """Exact two-pass 4-connectivity connected-component labelling with
    union-find (no scipy in this sandbox).  Row-vectorized run detection;
    the union-find touches only run boundaries, not pixels."""
    h, w = mask.shape
    # run-length decode ALL rows in one vectorized diff (no per-row Python
    # when the mask is empty or sparse — the common case for web images)
    padded = np.zeros((h, w + 2), np.int8)
    padded[:, 1:-1] = mask
    d = np.diff(padded, axis=1)
    sy, sx = np.nonzero(d == 1)
    _, ex = np.nonzero(d == -1)  # same (row, ordinal) order as the starts
    return _label_runs(h, w, sy, sx, ex)


def _label_runs(h: int, w: int, sy: np.ndarray, sx: np.ndarray,
                ex: np.ndarray) -> tuple[np.ndarray, int]:
    """Labelling core over precomputed horizontal runs (row, start, end) —
    split out so batched callers can extract runs for a whole image stack
    in one ``np.diff``/``np.nonzero`` and label only images that have any."""
    labels = np.zeros((h, w), dtype=np.int32)
    parent: list[int] = [0]  # parent[i] for union-find; 0 = background

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    if sy.size == 0:
        return labels, 0
    nxt = 1
    for y, s, e in zip(sy.tolist(), sx.tolist(), ex.tolist()):
        # runs are short; plain-Python set dedup beats np.unique's
        # per-call overhead by ~10x at this size
        seen = set(labels[y - 1, s:e].tolist()) if y > 0 else ()
        hits = sorted(v for v in seen if v)
        if not hits:
            parent.append(nxt)
            lab = nxt
            nxt += 1
        else:
            lab = hits[0]
            for other in hits[1:]:
                union(lab, other)
        labels[y, s:e] = lab
    # resolve + compact
    roots = np.array([find(i) for i in range(len(parent))], dtype=np.int32)
    remap = np.zeros(len(parent), dtype=np.int32)
    uniq = np.unique(roots[1:]) if len(parent) > 1 else np.empty(0, np.int32)
    for i, r in enumerate(uniq, start=1):
        remap[roots == r] = i
    remap[0] = 0
    return remap[labels], int(uniq.size)


def detect_faces(
    rgb: np.ndarray, kind: str = "human", min_side: int = 4, min_area: int = 20
) -> list[tuple[str, int, int, int, int]]:
    """Skin-tone blob detector: (kind, x, y, w, h) per connected skin region
    at least ``min_side`` wide/tall and ``min_area`` pixels — mirroring the
    reference cascade's min-size-20 gate (``FaceDetectionParser.java:113``).
    Regions are returned top-left first (row-major by bbox origin), so output
    order is deterministic."""
    return faces_from_mask(_skin_mask(rgb), kind, min_side, min_area)


def faces_from_mask(
    mask: np.ndarray, kind: str = "human", min_side: int = 4, min_area: int = 20
) -> list[tuple[str, int, int, int, int]]:
    """Blob bboxes from an already-computed (H, W) skin mask — the
    labelling half of :func:`detect_faces`, split out so batched callers
    can compute masks for a whole stack at once (``skin_mask_batch``) and
    skip labelling entirely for images with no skin pixels."""
    return _bboxes(*_label_components(mask), kind, min_side, min_area)


def faces_from_masks_batch(
    masks: np.ndarray, kind: str = "human", min_side: int = 4, min_area: int = 20
) -> list[list[tuple[str, int, int, int, int]]]:
    """Batched blob detection over a (B, H, W) bool mask stack: run
    extraction (the expensive per-image numpy-call overhead) happens ONCE
    for the whole stack via one padded diff + nonzero; only images that
    actually have runs pay the per-run union-find.  Output order per image
    is identical to :func:`faces_from_mask`."""
    B, h, w = masks.shape
    padded = np.zeros((B, h, w + 2), np.int8)
    padded[:, :, 1:-1] = masks
    d = np.diff(padded, axis=2)
    sb, sy, sx = np.nonzero(d == 1)
    _, _, ex = np.nonzero(d == -1)  # same (img, row, ordinal) order
    bounds = np.searchsorted(sb, np.arange(B + 1))
    out: list[list[tuple[str, int, int, int, int]]] = []
    for b in range(B):
        lo, hi = bounds[b], bounds[b + 1]
        if lo == hi:
            out.append([])
            continue
        labels, n = _label_runs(h, w, sy[lo:hi], sx[lo:hi], ex[lo:hi])
        out.append(_bboxes(labels, n, kind, min_side, min_area))
    return out


def _bboxes(
    labels: np.ndarray, n: int, kind: str, min_side: int, min_area: int
) -> list[tuple[str, int, int, int, int]]:
    if n == 0:
        return []
    # one pass over labelled pixels for every component's bbox + area
    # (ufunc.at scatter — no per-component rescan of the label image)
    ys, xs = np.nonzero(labels)
    labs = labels[ys, xs]
    area = np.bincount(labs, minlength=n + 1)
    x0 = np.full(n + 1, np.iinfo(np.int64).max)
    y0 = np.full(n + 1, np.iinfo(np.int64).max)
    x1 = np.full(n + 1, -1)
    y1 = np.full(n + 1, -1)
    np.minimum.at(x0, labs, xs)
    np.minimum.at(y0, labs, ys)
    np.maximum.at(x1, labs, xs)
    np.maximum.at(y1, labs, ys)
    out = []
    for lab in range(1, n + 1):
        if area[lab] < min_area:
            continue
        w, h = int(x1[lab] - x0[lab] + 1), int(y1[lab] - y0[lab] + 1)
        if w < min_side or h < min_side:
            continue
        out.append((kind, int(x0[lab]), int(y0[lab]), w, h))
    out.sort(key=lambda t: (t[2], t[1]))
    return out


def face_fragments(faces: list[tuple[str, int, int, int, int]]) -> list[str]:
    """W3C media-fragment strings ``kind@xywh=x,y,w,h``
    (``FaceDetectionParser.addFaceRectangle``)."""
    return [f"{k}@xywh={x},{y},{w},{h}" for k, x, y, w, h in faces]
