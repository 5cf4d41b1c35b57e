"""A real, trainable face VERIFIER for the pluggable face-detection slot —
the committed-model pattern of :mod:`nermodel` applied to the reference's
``FaceDetectionAnalyser`` (``warc-openimaj/src/main/java/uk/bl/wa/analyser/
payload/FaceDetectionAnalyser.java:112-160``, an OpenIMAJ Haar cascade).

Two-stage cascade, the classic Viola-Jones shape re-expressed with the
engine's existing vectorized machinery:

1. **Candidates**: the skin-blob stage (:mod:`colours` — batched mask +
   connected components) proposes regions; it is cheap and high-recall.
2. **Verification** (this module): each candidate crop is grayscaled,
   resized to 16×16, variance-normalized, reduced to Haar-like rectangle
   features on an integral image, and scored by a logistic model — plain
   skin-coloured regions WITHOUT eye/mouth structure are rejected.

Deterministic end to end: the training corpus is synthesized procedurally
from a fixed seed (faces = skin oval + darker eye pair + mouth bar with
geometric/photometric jitter; non-faces = featureless blobs, gradients,
noise, wrongly-structured blobs), features and epochs are fixed, training
is full-batch gradient descent — so the ``image_analysis`` gate's
arithmetic oracle stays valid and ``tests/test_multimodal.py`` can pin
held-out detection rates.  The slot contract is unchanged:
``detector(rgb) -> [(kind, x, y, w, h), ...]``.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "HaarFaceVerifier",
    "train_default_verifier",
    "default_verifier",
    "model_face_detector",
    "draw_face",
    "draw_nonface",
]

_WIN = 16  # verifier window (pixels, square)


# ---------------------------------------------------------------------------
# Haar-like rectangle features on a 16×16 window
# ---------------------------------------------------------------------------

def _feature_defs() -> list[tuple[str, int, int, int, int]]:
    """Fixed feature layout: (kind, y, x, h, w) over the 16×16 window.
    Two-rect edges (horizontal/vertical splits), three-rect bands, and
    center-surround — the Viola-Jones families — at a coarse grid."""
    defs: list[tuple[str, int, int, int, int]] = []
    for size in (4, 8):
        for y in range(0, _WIN - size + 1, 2):
            for x in range(0, _WIN - size + 1, 2):
                defs.append(("h2", y, x, size, size))   # top vs bottom
                defs.append(("v2", y, x, size, size))   # left vs right
    for size in (6, 9, 12):
        for y in range(0, _WIN - size + 1, 3):
            for x in range(0, _WIN - size + 1, 3):
                defs.append(("v3", y, x, size, size))   # L/C/R thirds
                defs.append(("h3", y, x, size, size))   # T/M/B thirds
    for size in (6, 8, 12):
        for y in range(0, _WIN - size + 1, 2):
            for x in range(0, _WIN - size + 1, 2):
                defs.append(("cs", y, x, size, size))   # center-surround
    return defs


def _rect_sums(ii: np.ndarray, y0, x0, y1, x1) -> np.ndarray:
    """Inclusive-exclusive rect sums from a zero-padded integral image
    (B, 17, 17): sum of rows y0..y1-1, cols x0..x1-1."""
    return ii[:, y1, x1] - ii[:, y0, x1] - ii[:, y1, x0] + ii[:, y0, x0]


class HaarFaceVerifier:
    """Logistic model over Haar features of variance-normalized crops."""

    def __init__(self, weights: np.ndarray, bias: float, threshold: float = 0.5):
        self.defs = _feature_defs()
        self.weights = np.asarray(weights, dtype=np.float64)
        self.bias = float(bias)
        self.threshold = float(threshold)
        if self.weights.shape != (len(self.defs),):
            raise ValueError("weight vector does not match the feature layout")

    # -- feature pipeline ---------------------------------------------------

    @staticmethod
    def _normalize(crops: np.ndarray) -> np.ndarray:
        c = crops.astype(np.float64)
        mu = c.mean(axis=(1, 2), keepdims=True)
        sd = c.std(axis=(1, 2), keepdims=True)
        return (c - mu) / np.maximum(sd, 1e-6)

    @classmethod
    def features(cls, crops: np.ndarray) -> np.ndarray:
        """(B, 16, 16) uint8/float grayscale → (B, F) feature matrix."""
        c = cls._normalize(crops)
        ii = np.zeros((c.shape[0], _WIN + 1, _WIN + 1), np.float64)
        ii[:, 1:, 1:] = c.cumsum(axis=1).cumsum(axis=2)
        cols = []
        for kind, y, x, h, w in _feature_defs():
            if kind == "h2":
                m = y + h // 2
                v = _rect_sums(ii, y, x, m, x + w) - _rect_sums(ii, m, x, y + h, x + w)
            elif kind == "v2":
                m = x + w // 2
                v = _rect_sums(ii, y, x, y + h, m) - _rect_sums(ii, y, m, y + h, x + w)
            elif kind == "v3":
                t = w // 3
                v = (
                    _rect_sums(ii, y, x, y + h, x + t)
                    - _rect_sums(ii, y, x + t, y + h, x + 2 * t)
                    + _rect_sums(ii, y, x + 2 * t, y + h, x + 3 * t)
                )
            elif kind == "h3":
                t = h // 3
                v = (
                    _rect_sums(ii, y, x, y + t, x + w)
                    - _rect_sums(ii, y + t, x, y + 2 * t, x + w)
                    + _rect_sums(ii, y + 2 * t, x, y + 3 * t, x + w)
                )
            else:  # cs: whole minus 2x the centered inner half
                qy, qx = h // 4, w // 4
                whole = _rect_sums(ii, y, x, y + h, x + w)
                inner = _rect_sums(ii, y + qy, x + qx, y + h - qy, x + w - qx)
                v = whole - 2.0 * inner
            cols.append(v / (h * w))  # scale-free: per-pixel contrast
        return np.stack(cols, axis=1)

    def scores(self, crops: np.ndarray) -> np.ndarray:
        z = self.features(crops) @ self.weights + self.bias
        return 1.0 / (1.0 + np.exp(-z))

    def is_face(self, crops: np.ndarray) -> np.ndarray:
        return self.scores(crops) >= self.threshold


# ---------------------------------------------------------------------------
# Synthetic training corpus (procedural, seeded — no external data)
# ---------------------------------------------------------------------------

def _gray_canvas(rng, size: int) -> np.ndarray:
    base = rng.integers(30, 226)
    img = np.full((size, size), base, np.float64)
    img += rng.normal(0, rng.uniform(1, 6), (size, size))
    return img


def draw_face(rng, size: int = _WIN) -> np.ndarray:
    """One procedural face crop: bright oval + darker eye pair + mouth bar,
    with geometry/illumination jitter.  Returns (size, size) uint8."""
    img = _gray_canvas(rng, size)
    s = size / 16.0
    face_lum = rng.integers(140, 226)
    cy, cx = size / 2 + rng.uniform(-1, 1) * s, size / 2 + rng.uniform(-1, 1) * s
    ry, rx = size * rng.uniform(0.38, 0.5), size * rng.uniform(0.34, 0.48)
    yy, xx = np.mgrid[0:size, 0:size]
    oval = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
    img[oval] = face_lum + rng.normal(0, 3, int(oval.sum()))
    dark = face_lum * rng.uniform(0.25, 0.55)
    ey = int(round(cy - ry * rng.uniform(0.35, 0.5)))
    ew = max(1, int(round(rng.uniform(1.5, 2.5) * s)))
    for ex_off in (-rng.uniform(0.38, 0.52), rng.uniform(0.38, 0.52)):
        ex = int(round(cx + ex_off * rx))
        img[max(0, ey):ey + ew, max(0, ex - ew // 2):ex - ew // 2 + ew] = dark
    my = int(round(cy + ry * rng.uniform(0.35, 0.55)))
    mw = max(2, int(round(rng.uniform(3.5, 6.0) * s)))
    mh = max(1, int(round(rng.uniform(0.8, 1.6) * s)))
    img[my:my + mh, int(round(cx - mw / 2)):int(round(cx + mw / 2))] = dark
    return np.clip(img, 0, 255).astype(np.uint8)


def draw_nonface(rng, size: int = _WIN) -> np.ndarray:
    """One procedural non-face crop: the confusable negatives the skin-blob
    stage actually proposes — featureless blobs, gradients, noise, blobs
    with structure in the WRONG configuration."""
    kind = rng.integers(0, 4)
    img = _gray_canvas(rng, size)
    if kind == 0:  # featureless bright blob (a plain skin region)
        yy, xx = np.mgrid[0:size, 0:size]
        cy, cx = size / 2 + rng.uniform(-2, 2), size / 2 + rng.uniform(-2, 2)
        r = size * rng.uniform(0.3, 0.5)
        blob = ((yy - cy) ** 2 + (xx - cx) ** 2) <= r * r
        img[blob] = rng.integers(140, 226)
    elif kind == 1:  # gradient
        g = np.linspace(0, rng.integers(60, 200), size)
        img = img * 0.2 + (g[None, :] if rng.integers(2) else g[:, None]) * 0.8
    elif kind == 2:  # noise
        img = rng.integers(0, 256, (size, size)).astype(np.float64)
    else:  # blob with one dark region in a non-face position
        yy, xx = np.mgrid[0:size, 0:size]
        blob = ((yy - size / 2) ** 2 + (xx - size / 2) ** 2) <= (size * 0.45) ** 2
        img[blob] = rng.integers(150, 220)
        y, x = rng.integers(0, size - 3, 2)
        img[y:y + 3, x:x + 3] = rng.integers(20, 80)
    return np.clip(img, 0, 255).astype(np.uint8)


def _quantize5(img: np.ndarray) -> np.ndarray:
    """The engine's fake-lossy 5-bit quantization (``imaging.encode_fake_
    lossy``) as a photometric augmentation, so verification survives it."""
    return (img & 0xF8) | (img >> 5)


def synth_corpus(n_per_class: int = 1500, seed: int = 20240101):
    """Deterministic labelled crop corpus, including 8×8-painted faces
    upsampled to the window (the gate corpus shape) and 5-bit-quantized
    variants of everything."""
    rng = np.random.default_rng(seed)
    crops, labels = [], []
    for i in range(n_per_class):
        face = draw_face(rng)
        if i % 3 == 0:  # low-res leg: paint at 8×8, upsample 2× nearest
            face = np.kron(draw_face(rng, 8), np.ones((2, 2), np.uint8))
        if i % 2 == 0:
            face = _quantize5(face)
        crops.append(face)
        labels.append(1)
        non = draw_nonface(rng)
        if i % 3 == 0:
            non = np.kron(draw_nonface(rng, 8), np.ones((2, 2), np.uint8))
        if i % 2 == 0:
            non = _quantize5(non)
        crops.append(non)
        labels.append(0)
    return np.stack(crops), np.array(labels, np.float64)


def train_default_verifier(
    n_per_class: int = 1500, seed: int = 20240101,
    epochs: int = 400, lr: float = 0.5, l2: float = 1e-4,
    threshold: float = 0.5,
) -> HaarFaceVerifier:
    """Full-batch logistic regression over the Haar features — fixed seed,
    fixed epochs, no stochasticity: retraining reproduces the same model."""
    crops, y = synth_corpus(n_per_class, seed)
    X = HaarFaceVerifier.features(crops)
    w = np.zeros(X.shape[1])
    b = 0.0
    n = len(y)
    for _ in range(epochs):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        g = p - y
        w -= lr * (X.T @ g / n + l2 * w)
        b -= lr * float(g.mean())
    return HaarFaceVerifier(w, b, threshold)


_DEFAULT: HaarFaceVerifier | None = None


def default_verifier() -> HaarFaceVerifier:
    """Memoized default model, loaded from the COMMITTED weight file
    (``facemodel_weights.json`` — 276 floats + bias, written by
    :func:`train_default_verifier`; a test pins committed == retrained).
    Loading instead of retraining keeps Spark Python workers from paying
    ~1.7 s of training each; falls back to training if the file is gone."""
    global _DEFAULT
    if _DEFAULT is None:
        import json
        import os

        path = os.path.join(os.path.dirname(__file__), "facemodel_weights.json")
        try:
            with open(path) as f:
                m = json.load(f)
            _DEFAULT = HaarFaceVerifier(
                np.asarray(m["weights"]), m["bias"], m["threshold"]
            )
        except (OSError, KeyError, ValueError):
            _DEFAULT = train_default_verifier()
    return _DEFAULT


# ---------------------------------------------------------------------------
# Detector-slot adapters
# ---------------------------------------------------------------------------

def _to_gray(rgb: np.ndarray) -> np.ndarray:
    return rgb.mean(axis=2) if rgb.ndim == 3 else rgb


def _resize_window(gray: np.ndarray) -> np.ndarray:
    """Nearest-neighbour resize to the 16×16 verifier window."""
    h, w = gray.shape
    yi = np.minimum((np.arange(_WIN) * h) // _WIN, h - 1)
    xi = np.minimum((np.arange(_WIN) * w) // _WIN, w - 1)
    return gray[yi][:, xi]


def crop_windows(rgb: np.ndarray,
                 boxes: list[tuple[str, int, int, int, int]]) -> np.ndarray:
    """(len(boxes), 16, 16) stack of grayscale, window-sized candidate
    crops."""
    gray = _to_gray(rgb)
    return np.stack(
        [_resize_window(gray[y:y + h, x:x + w]) for _, x, y, w, h in boxes]
    ) if boxes else np.empty((0, _WIN, _WIN))


def verify_candidates(
    rgb: np.ndarray,
    boxes: list[tuple[str, int, int, int, int]],
    verifier: HaarFaceVerifier | None = None,
) -> list[tuple[str, int, int, int, int]]:
    """Keep only candidate boxes the model scores as faces."""
    if not boxes:
        return boxes
    v = verifier or default_verifier()
    keep = v.is_face(crop_windows(rgb, boxes))
    return [bx for bx, k in zip(boxes, keep) if k]


def model_face_detector(rgb: np.ndarray) -> list[tuple[str, int, int, int, int]]:
    """Drop-in for the ``detector`` slot: skin-blob candidates → trained
    verification.  (``analyse_images``' default path runs the same cascade
    batched.)"""
    from .colours import detect_faces

    return verify_candidates(rgb, detect_faces(rgb))
