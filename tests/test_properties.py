"""Property-based tests (hypothesis) for the pure kernels — no SparkSession,
so these run fast and shrink failures to minimal cases.

Note: URL canonicalisation is deliberately NOT asserted idempotent — the
reference's staged canonicalizer (wayback AggressiveUrlCanonicalizer +
escape fixing) strips one trailing ``&``/``?`` per pass and unescapes
before lowercasing, so a second application can differ on adversarial
inputs.  The contract we hold is totality (never raises, never returns
non-strings) plus the 76-case golden corpus in test_normalisation.py.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from webarchive_discovery_spark.functions import colours
from webarchive_discovery_spark.functions import normalisation as N
from webarchive_discovery_spark.functions import surt as S


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=120))
def test_canonicalise_total_on_arbitrary_text(s):
    out = N.canonicalise_url(s)
    assert isinstance(out, str)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcxyz./:%20?&=#中é ", max_size=60))
def test_surt_key_total_and_parenthesised(s):
    url = "http://" + s
    key = S.surt_key(url)
    assert isinstance(key, str)


def _brute_components(mask):
    """Reference 4-connectivity labelling by BFS flood fill."""
    h, w = mask.shape
    seen = np.zeros_like(mask, dtype=bool)
    comps = []
    for y0 in range(h):
        for x0 in range(w):
            if not mask[y0, x0] or seen[y0, x0]:
                continue
            stack = [(y0, x0)]
            seen[y0, x0] = True
            cells = []
            while stack:
                y, x = stack.pop()
                cells.append((y, x))
                for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    ny, nx = y + dy, x + dx
                    if 0 <= ny < h and 0 <= nx < w and mask[ny, nx] and not seen[ny, nx]:
                        seen[ny, nx] = True
                        stack.append((ny, nx))
            comps.append(frozenset(cells))
    return set(comps)


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 2**144 - 1))
def test_connected_components_match_bfs(bits):
    mask = np.array(
        [[(bits >> (y * 12 + x)) & 1 for x in range(12)] for y in range(12)],
        dtype=bool,
    )
    labels, n = colours._label_components(mask)
    got = set()
    for lab in range(1, n + 1):
        ys, xs = np.nonzero(labels == lab)
        got.add(frozenset(zip(ys.tolist(), xs.tolist())))
    assert got == _brute_components(mask)
    assert bool(labels[mask].all()) and not labels[~mask].any()


def test_colour_matcher_exact_table_entries_first_wins():
    seen_rgb = {}
    for name, r, g, b in colours.SVG_COLOURS:
        expect = seen_rgb.setdefault((r, g, b), name)  # first entry wins ties
        assert colours.match_colour_name(r, g, b) == expect


@settings(max_examples=100, deadline=None)
@given(st.tuples(st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)))
def test_dominant_colour_of_solid_image_is_exact(rgb_t):
    img = np.empty((6, 6, 3), np.uint8)
    img[:, :] = rgb_t
    assert colours.dominant_colour(img) == rgb_t
