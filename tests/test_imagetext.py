"""Image-text pair construction (operators/imagetext.py): extraction edge
cases, join semantics incl. the left-join frontier-feedback shape, pair
gates, and the CLIP-score cut."""

import pytest
from pyspark.sql import functions as F

from webarchive_discovery_spark.operators import imagetext


@pytest.fixture(scope="module")
def spark():
    from webarchive_discovery_spark.session import get_spark

    return get_spark("test-imagetext")


def _one_page(spark, html, url="http://h.org/a/b.html"):
    df = spark.createDataFrame([(url, html)], "url string, payload string")
    return imagetext.extract_image_captions(df).collect()[0]


def test_extract_attrs_and_entities(spark):
    row = _one_page(
        spark,
        '<img height="40px" src="/i/x.jpg" alt=" Big&amp;small   cat " '
        'title="T" width="64">',
    )
    assert row.pairs_parse_error is None
    (c,) = row.candidates
    assert c.img_url == "http://h.org/i/x.jpg"
    assert c.alt_text == "Big&small cat"  # entity-decoded, ws-normalized
    assert c.title_text == "T"
    assert (c.attr_width, c.attr_height) == (64, 40)


def test_extract_edge_cases(spark):
    row = _one_page(
        spark,
        '<img src="rel.png">'          # relative, no alt/title
        '<img alt="no src here">'      # dropped: src-less
        '<img src="" alt="empty">'     # dropped: empty src
        '<img src="dup.png" alt="first"><img src="dup.png" alt="second">'
        '<script><img src="in-script.png"></script>'
        '<!-- <img src="in-comment.png"> -->'
        '<img src="auto.gif" width="auto">',
    )
    urls = [c.img_url for c in row.candidates]
    # occurrences preserved (each is a distinct pair), script/comment stripped
    assert urls == [
        "http://h.org/a/rel.png",
        "http://h.org/a/dup.png",
        "http://h.org/a/dup.png",
        "http://h.org/a/auto.gif",
    ]
    assert [c.alt_text for c in row.candidates] == [None, "first", "second", None]
    assert row.candidates[3].attr_width is None  # non-numeric width


def test_parse_error_recovery(spark):
    df = spark.createDataFrame(
        [("http://h.org/", "<" * 3_000_000), ("http://h.org/ok", '<img src="a.png">')],
        "url string, payload string",
    )
    rows = {r.url: r for r in imagetext.extract_image_captions(df).collect()}
    bad = rows["http://h.org/"]
    assert bad.candidates == [] and bad.pairs_parse_error  # guard fired, row kept
    assert len(rows["http://h.org/ok"].candidates) == 1


def test_join_and_left_frontier_feedback(spark):
    pages = spark.createDataFrame(
        [("http://p.org/x.html", '<img src="/a.png" alt="a cat"><img src="/b.png" alt="b dog">')],
        "url string, payload string",
    )
    imgs = spark.createDataFrame(
        [("http://p.org/a.png", 100, 50)],
        "url string, image_width long, image_height long",
    )
    inner = imagetext.build_image_text_pairs(pages, imgs).collect()
    assert [r.img_url for r in inner] == ["http://p.org/a.png"]
    left = imagetext.build_image_text_pairs(pages, imgs, how="left")
    missing = left.filter(F.col("image_width").isNull()).collect()
    # the un-crawled image URL surfaces for the next frontier epoch
    assert [r.img_url for r in missing] == ["http://p.org/b.png"]


def test_pair_gates(spark):
    rows = [
        # caption, title, w, h → expected keep
        ("a good caption", None, 100, 100, True),
        ("tiny", None, 100, 100, False),          # caption < 5 chars
        (None, "title caption", 100, 100, True),  # title fallback
        (None, None, 100, 100, False),            # no caption at all
        ("a good caption", None, 32, 100, False), # min dim
        ("a good caption", None, 400, 100, False),# aspect 4 > 3
    ]
    df = spark.createDataFrame(
        [(i, a, t, w, h, e) for i, (a, t, w, h, e) in enumerate(rows)],
        "i long, alt_text string, title_text string, image_width long, "
        "image_height long, expected boolean",
    )
    out = imagetext.filter_image_text_pairs(df).collect()
    for r in out:
        assert r.pair_keep == r.expected, (r.i, r)
    srcs = {r.i: r.caption_source for r in out}
    assert srcs[0] == "alt" and srcs[2] == "title" and srcs[3] is None


def test_clip_score_filter(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], [1.0, 0.0]), (2, [1.0, 0.0], [0.0, 1.0]),
         (3, [1.0, 1.0], [1.0, 0.0])],
        "i long, img_vec array<double>, txt_vec array<double>",
    )
    got = {r.i: (round(r.clip_score, 6), r.flag_clip_score)
           for r in imagetext.clip_score_filter(df, "img_vec", "txt_vec").collect()}
    assert got[1] == (1.0, True)
    assert got[2] == (0.0, False)
    assert got[3] == (round(2 ** -0.5, 6), True)


def test_multimodal_corpus_composition(spark):
    """Drop precedence, deterministic dedup exemplars, schema-stable
    no-embedding mode, and parallelism invariance of the composed
    pipeline."""
    from webarchive_discovery_spark.plans import multimodal_corpus

    pages = spark.createDataFrame(
        [
            # two pages referencing the same image (same phash) + one tiny
            ("http://a.org/1.html",
             '<img src="http://cdn.net/x.jpg" alt="a shared image">'),
            ("http://b.org/2.html",
             '<img src="http://cdn.net/x.jpg" alt="also shared image">'
             '<img src="http://cdn.net/tiny.jpg" alt="tiny but captioned">'),
        ],
        "url string, payload string",
    )
    imgs = spark.createDataFrame(
        [("http://cdn.net/x.jpg", 200, 100, 7),
         ("http://cdn.net/tiny.jpg", 10, 10, 8)],
        "url string, image_width long, image_height long, phash long",
    )
    out = multimodal_corpus.build_multimodal_corpus(pages, imgs).collect()
    by = {(r.page_url, r.img_url): r for r in out}
    # deterministic exemplar: a.org sorts before b.org
    assert by[("http://a.org/1.html", "http://cdn.net/x.jpg")].corpus_keep
    assert by[("http://b.org/2.html", "http://cdn.net/x.jpg")].drop_reason == "dup_image"
    # gate failure outranks dup attribution and frees no exemplar slot
    assert by[("http://b.org/2.html", "http://cdn.net/tiny.jpg")].drop_reason == "min_dim"
    # no-embedding mode still emits the clip columns (schema stability)
    assert all(r.clip_score is None and r.flag_clip_score is None for r in out)
    out2 = multimodal_corpus.build_multimodal_corpus(
        pages.repartition(5), imgs.repartition(3)).collect()
    assert {(r.page_url, r.img_url, r.drop_reason) for r in out2} == {
        (r.page_url, r.img_url, r.drop_reason) for r in out}


def test_aspect_buckets(spark):
    """Squares, wides, and talls land on the right ladder rungs; extreme
    ratios clamp to the ladder ends; assignment is shape-only (scale
    invariant)."""
    from webarchive_discovery_spark.operators.imagetext import (
        SDXL_ASPECT_BUCKETS, assign_aspect_buckets,
    )

    rows = [
        (0, 512, 512, (1024, 1024)),    # square, any scale
        (1, 1024, 1024, (1024, 1024)),
        (2, 1536, 640, (1536, 640)),    # exact ladder shape
        (3, 4000, 500, (1536, 640)),    # wider than ladder -> clamp to widest
        (4, 500, 4000, (640, 1536)),    # taller than ladder -> clamp
        (5, 1200, 800, (1216, 832)),    # 3:2-ish
    ]
    df = spark.createDataFrame(
        [(i, w, h) for i, w, h, _ in rows],
        "i long, image_width long, image_height long",
    )
    out = {r.i: (r.bucket_w, r.bucket_h)
           for r in assign_aspect_buckets(df).collect()}
    for i, _, _, want in rows:
        assert out[i] == want, (i, out[i], want)
    assert len(SDXL_ASPECT_BUCKETS) == 9
