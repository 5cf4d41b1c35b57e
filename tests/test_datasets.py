"""WARCDatasetGenerator job shape: per-capture dataset emission, frequency
counting, and the MultipleOutputs directory layout."""

import glob
import gzip

from pyspark.sql import functions as F

from webarchive_discovery_spark.plans import datasets as ds


def _caps(spark):
    rows = [
        # (host, url, wayback, served, faces, links_hosts)
        ("a.org", "http://a.org/1", 20240101000000, "text/html",
         ["human@xywh=5,5,8,8", "cat@xywh=1,1,4,4", "human@xywh=2,2,8,8"],
         ["b.org", "c.org"]),
        ("a.org", "http://a.org/2", 20240101000001, "text/html", None, None),
        ("b.org", "http://b.org/1", 20230601000000, None, [], ["a.org"]),
    ]
    df = spark.createDataFrame(
        rows,
        "host string, url string, wayback_date long, content_type_served string, "
        "image_faces array<string>, links_hosts array<string>",
    )
    return df.withColumn("content_type_tika", F.lit(None).cast("string")) \
             .withColumn("content_type_droid", F.lit(None).cast("string"))


def test_dataset_rows_semantics(spark):
    rows = ds.dataset_rows(_caps(spark)).collect()
    by_ds = {}
    for r in rows:
        by_ds.setdefault(r.dataset, []).append((r.year, r.value))

    assert sorted(by_ds["hosts"]) == [
        ("2023", "b.org"), ("2024", "a.org"), ("2024", "a.org")
    ]
    # tabs always present, absent analysers are empty strings (SolrRecord.java:369-390)
    assert ("2024", "text/html\t\t") in by_ds["formats"]
    assert ("2023", "\t\t") in by_ds["formats"]
    # one line per kind, cat gathered BEFORE human, matches sorted + space-joined
    assert by_ds["faces"] == [
        ("2024", "http://a.org/1\t20240101000000\tcat@xywh=1,1,4,4"),
        ("2024",
         "http://a.org/1\t20240101000000\thuman@xywh=2,2,8,8 human@xywh=5,5,8,8"),
    ]
    # one host->linked_host line per links_hosts value; null/empty lists drop out
    assert sorted(by_ds["hostLinks"]) == [
        ("2023", "b.org\ta.org"), ("2024", "a.org\tb.org"), ("2024", "a.org\tc.org")
    ]


def test_generate_counts_and_write_layout(spark, tmp_path):
    counted = ds.generate_datasets(_caps(spark))
    hosts_2024 = {
        r.value: r.cnt
        for r in counted.filter("dataset = 'hosts' AND year = '2024'").collect()
    }
    assert hosts_2024 == {"a.org": 2}

    out = str(tmp_path / "datasets")
    ds.write_datasets(counted, out)
    host_files = glob.glob(f"{out}/dataset=hosts/year=2024/*.txt.gz")
    assert host_files, "expected gzip text parts under dataset=hosts/year=2024"
    lines = []
    for f in host_files:
        with gzip.open(f, "rt") as fh:
            lines += [ln.rstrip("\n") for ln in fh if ln.strip()]
    assert lines == ["a.org\t2"]
