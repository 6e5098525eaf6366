"""WARC source (sources/warc.py): the Common Crawl interchange format.

Pins: (1) writer→parser roundtrip is byte-exact for plain and
member-per-record-gzip archives, (2) Content-Length framing is immune
to payloads containing record markers, (3) the Spark source yields the
documents shape with byte-identical html — so the tagging parity the
engine guarantees for --from-html extends to raw crawl archives, and
(4) jobs/kg_build.py --warc end-to-end equals the parquet-corpus run.
"""

import json
import os
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from onto_text_tag_spark.sources.warc import (  # noqa: E402
    parse_warc_file,
    read_warc,
    warc_documents,
    warc_record_bytes,
    write_warc,
)


def _mk_records(n, prefix="http://ex.org/p"):
    return [
        {
            "url": f"{prefix}{i}",
            "date": f"2026-02-01T00:00:{i % 60:02d}Z",
            "body": f"<html><body><p>doc {i} é</p></body></html>"
                    .encode("utf-8"),
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("suffix", ["warc", "warc.gz"])
def test_roundtrip_write_then_parse(tmp_path, suffix):
    recs = _mk_records(5)
    path = str(tmp_path / f"fixture.{suffix}")
    write_warc(path, recs)
    with open(path, "rb") as fh:
        data = fh.read()
    parsed = list(parse_warc_file(data, gzipped=suffix.endswith("gz")))
    # warcinfo header record + 5 responses
    assert [r["warc_type"] for r in parsed] == ["warcinfo"] + ["response"] * 5
    responses = [r for r in parsed if r["warc_type"] == "response"]
    assert [r["url"] for r in responses] == [r["url"] for r in recs]
    assert [r["html"] for r in responses] == [r["body"] for r in recs]
    assert responses[3]["warc_ts"].second == 3
    assert responses[0]["record_id"].startswith("<urn:uuid:")
    # determinism: a rewrite produces identical bytes
    path2 = str(tmp_path / f"again.{suffix}")
    write_warc(path2, recs)
    with open(path2, "rb") as fh:
        assert fh.read() == data


def test_content_length_framing_survives_embedded_markers():
    """A page whose body CONTAINS a WARC header block must not split the
    record — framing is Content-Length, never a marker scan."""
    evil = (b"<html><pre>WARC/1.0\r\nWARC-Type: response\r\n"
            b"Content-Length: 0\r\n\r\n</pre>\r\n\r\n</html>")
    blob = (warc_record_bytes("http://a", "2026-01-01T00:00:00Z", evil)
            + warc_record_bytes("http://b", "2026-01-01T00:00:01Z",
                                b"<html>after</html>"))
    recs = list(parse_warc_file(blob, gzipped=False))
    assert [r["url"] for r in recs] == ["http://a", "http://b"]
    assert recs[0]["html"] == evil


def test_truncated_payload_raises():
    blob = warc_record_bytes("http://a", "2026-01-01T00:00:00Z", b"x" * 100)
    with pytest.raises(ValueError, match="truncated"):
        list(parse_warc_file(blob[:-60], gzipped=False))


@pytest.fixture(scope="module")
def warc_corpus(tmp_path_factory, spark):
    """300 synthetic docs written both as parquet and as two WARC
    archives (one plain, one Common-Crawl-style .gz) — same rows."""
    from onto_text_tag_spark.corpus import distributed_documents_df

    tmp = tmp_path_factory.mktemp("warcsrc")
    docs = distributed_documents_df(spark, 300, seed=11, partitions=3)
    pq = str(tmp / "corpus.parquet")
    docs.write.parquet(pq)
    rows = docs.select("url", "warc_ts", "html").collect()
    warc_dir = tmp / "crawl"
    warc_dir.mkdir()
    half = len(rows) // 2

    def _recs(chunk):
        return [
            {"url": r["url"],
             "date": r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ"),
             "body": bytes(r["html"])}
            for r in chunk
        ]

    write_warc(str(warc_dir / "seg-00000.warc"), _recs(rows[:half]))
    write_warc(str(warc_dir / "seg-00001.warc.gz"), _recs(rows[half:]))
    return {"parquet": pq, "warc_dir": str(warc_dir), "tmp": str(tmp)}


def test_spark_read_warc_matches_corpus(spark, warc_corpus):
    got = read_warc(spark, warc_corpus["warc_dir"]).collect()
    want = {
        r["url"]: r
        for r in spark.read.parquet(warc_corpus["parquet"]).collect()
    }
    assert len(got) == len(want) == 300
    for rec in got:
        src = want[rec["url"]]
        assert bytes(rec["html"]) == bytes(src["html"])
        assert rec["warc_ts"] == src["warc_ts"]
        assert rec["warc_type"] == "response"


def test_warc_tagging_parity(spark, warc_corpus):
    """Mentions tagged straight off the crawl archive == mentions tagged
    off the materialized text column (extractor byte-identity extends
    end-to-end to the WARC path)."""
    from onto_text_tag_spark.dictionary import build_dictionary_rows
    from onto_text_tag_spark.operators.tagger import tag_documents
    from onto_text_tag_spark.plans.kg_pipeline import load_ontology_rows

    dict_rows = build_dictionary_rows(load_ontology_rows([], "mini"))
    via_warc = tag_documents(
        warc_documents(spark, warc_corpus["warc_dir"]),
        dict_rows, id_col="url", html_col="html")
    via_text = tag_documents(
        spark.read.parquet(warc_corpus["parquet"]),
        dict_rows, id_col="url")
    assert via_warc.exceptAll(via_text).count() == 0
    assert via_text.exceptAll(via_warc).count() == 0
    assert via_text.count() > 0


def test_distributed_warc_sink_roundtrip(spark, warc_corpus, tmp_path):
    """write_warc_shards (executor-side export, one shard per partition)
    → read_warc recovers the corpus byte-identically."""
    from onto_text_tag_spark.sources.warc import write_warc_shards

    docs = spark.read.parquet(warc_corpus["parquet"]).repartition(3)
    out = str(tmp_path / "export")
    shards = write_warc_shards(docs, out).collect()
    assert len(shards) == 3
    assert sum(s["records"] for s in shards) == 300
    assert sorted(os.path.basename(s["shard"]) for s in shards) == [
        "seg-00000.warc.gz", "seg-00001.warc.gz", "seg-00002.warc.gz"]
    back = read_warc(spark, out)
    orig = docs.select("url", "warc_ts", "html")
    assert back.select("url", "warc_ts", "html") \
               .exceptAll(orig).count() == 0
    assert orig.exceptAll(back.select("url", "warc_ts", "html")) \
               .count() == 0


def test_kg_build_warc_job(warc_corpus, spark):
    """spark-submit jobs/kg_build.py --warc: the full job from raw crawl
    archives emits the identical mentions relation as the parquet run."""
    tmp = warc_corpus["tmp"]
    pkg = os.path.join(tmp, "pkg.zip")
    with zipfile.ZipFile(pkg, "w", zipfile.ZIP_DEFLATED) as zf:
        pkgdir = os.path.join(REPO, "onto_text_tag_spark")
        for root, _dirs, files in os.walk(pkgdir):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    zf.write(p, os.path.relpath(p, REPO))
    out_dir = os.path.join(tmp, "kg_from_warc")
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable}
    out = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.ui.enabled=false", "--py-files", pkg,
         os.path.join(REPO, "jobs", "kg_build.py"), "--no-warmup",
         "--warc", "--input", warc_corpus["warc_dir"],
         "--output", out_dir],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    rep = json.loads(
        [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1])

    from onto_text_tag_spark.dictionary import build_dictionary_rows
    from onto_text_tag_spark.operators.tagger import tag_documents
    from onto_text_tag_spark.plans.kg_pipeline import load_ontology_rows

    dict_rows = build_dictionary_rows(load_ontology_rows([], "mini"))
    expected = tag_documents(
        spark.read.parquet(warc_corpus["parquet"]), dict_rows, id_col="url")
    got = spark.read.parquet(os.path.join(out_dir, "mentions", "data"))
    assert rep["n_mentions"] == expected.count() == got.count()
    assert got.exceptAll(expected).count() == 0
    assert rep["n_triples"] > 0
