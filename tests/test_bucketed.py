"""Bucketed materialization plan pins (sources/bucketed.py).

Bucketing is the engine's rest-state answer to corpus-keyed shuffles
(SURVEY.md §4: the reference's key-organized shelve stores → Spark
bucketed tables).  These tests pin the physics, not just the values:

* the write emits exactly one file per bucket (the pre-repartition
  aligns task hashing with bucket assignment);
* ``groupBy(bucket_key)`` plans NO Exchange;
* a self-join on the bucket key plans NO Exchange on either side once
  broadcast is off (at scale neither side broadcasts);
* a bucketed ⋈ unbucketed join shuffles ONLY the unbucketed side;
* values are identical to the unbucketed plan.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from onto_text_tag_spark.sources.bucketed import bucketed_path, write_bucketed

BUCKETS = 8


def _plan(df) -> str:
    df.collect()  # finalize AQE so the executed plan is the real one
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE prints "== Final Plan ==" then "== Initial Plan =="; only the
    # final section is what actually ran
    return plan.split("== Initial Plan ==")[0]


@pytest.fixture(scope="module")
def rel(spark):
    """A (url, curie) fact relation with multi-row url groups."""
    return spark.range(0, 5000).select(
        F.concat(F.lit("u"), (F.col("id") % 1000)).alias("url"),
        F.concat(F.lit("C:"), (F.col("id") % 37)).alias("curie"),
    )


@pytest.fixture(scope="module")
def table(spark, rel, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bkt") / "t")
    return write_bucketed(rel, "t_bkt_test", key="url",
                          buckets=BUCKETS, path=path), path


def test_one_file_per_bucket(table):
    t, path = table
    files = [
        f for f in glob.glob(os.path.join(path, "*"))
        if not os.path.basename(f).startswith("_")
    ]
    assert len(files) == BUCKETS


def test_content_roundtrip(rel, table):
    t, _ = table
    assert (
        sorted(map(tuple, t.collect())) == sorted(map(tuple, rel.collect()))
    )


def test_groupby_on_bucket_key_has_no_exchange(table):
    t, _ = table
    agg = t.groupBy("url").agg(F.collect_set("curie").alias("terms"))
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan, plan


def test_selfjoin_on_bucket_key_has_no_exchange(spark, table):
    t, _ = table
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = t.alias("a").join(t.alias("b"), "url").select(
            "url", F.col("a.curie"), F.col("b.curie"))
        plan = _plan(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Exchange" not in plan, plan


def test_join_with_unbucketed_shuffles_only_plain_side(spark, rel, table):
    t, _ = table
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = t.join(rel.withColumnRenamed("curie", "c2"), "url")
        plan = _plan(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # exactly one shuffle — the unbucketed side re-clusters to the
    # bucketed side's distribution (numPartitions == bucket count)
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_bucketed_cooccur_matches_plain(spark, rel, table):
    from onto_text_tag_spark.operators.cooccur import cooccurrence_edges

    t, _ = table
    plain = sorted(map(tuple, cooccurrence_edges(rel).collect()))
    bucketed = sorted(map(tuple, cooccurrence_edges(t).collect()))
    assert plain == bucketed and len(plain) > 0


def test_bucketed_cooccur_groupby_stage_is_exchange_free(table):
    """The corpus-sized exchange of the co-occurrence build (groupBy url
    feeding pair explosion) is eliminated by the bucketed scan; the only
    Exchange left is the edge-keyed pair aggregate."""
    from onto_text_tag_spark.operators.cooccur import cooccurrence_edges

    t, _ = table
    plan = _plan(cooccurrence_edges(t))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "hashpartitioning(src" in plan, plan  # the surviving one


def test_write_is_idempotent(spark, rel, tmp_path):
    # own table + path: re-writing the module fixture's table would
    # invalidate the fixture DataFrame's resolved file listing
    path = str(tmp_path / "t_idem")
    write_bucketed(rel, "t_bkt_idem", key="url",
                   buckets=BUCKETS, path=path)
    t2 = write_bucketed(rel, "t_bkt_idem", key="url",
                        buckets=BUCKETS, path=path)
    assert t2.count() == rel.count()


def test_default_path_is_tmp():
    assert "otts_bucketed" in bucketed_path("x")


def test_reregistered_table_keeps_clustering(spark, table):
    """Dropping the catalog entry (≅ session end) and re-attaching the
    files with CLUSTERED BY DDL restores exchange-free planning — the
    bucket layout is durable in the files, only the spec is session-
    scoped in this sandbox's in-memory catalog."""
    from onto_text_tag_spark.sources.bucketed import register_bucketed

    t, path = table
    rows = sorted(map(tuple, t.collect()))
    spark.sql("DROP TABLE t_bkt_test")
    t2 = register_bucketed(
        spark, "t_bkt_reattached", path,
        "url STRING, curie STRING", key="url", buckets=BUCKETS,
    )
    assert sorted(map(tuple, t2.collect())) == rows
    agg = t2.groupBy("url").agg(F.collect_set("curie").alias("terms"))
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
    # restore the module fixture's table for any later test
    register_bucketed(spark, "t_bkt_test", path,
                      "url STRING, curie STRING", key="url",
                      buckets=BUCKETS)


def test_point_lookup_prunes_to_one_bucket(spark, table):
    """Equality filter on the bucket key reads 1 bucket of N — the
    reference's shelve KV point lookup (app.py:391-399) as storage
    physics.  Needs the bucketed scan kept on: the auto-bucketed-scan
    heuristic disables it for filter-only plans."""
    from onto_text_tag_spark.sources.bucketed import AUTO_BUCKETED_SCAN

    old = spark.conf.get(AUTO_BUCKETED_SCAN)
    spark.conf.set(AUTO_BUCKETED_SCAN, "false")
    try:
        q = spark.table("t_bkt_test").where(F.col("url") == "u17")
        assert q.count() > 0
        plan = _plan(q)
    finally:
        spark.conf.set(AUTO_BUCKETED_SCAN, old)
    assert f"SelectedBucketsCount: 1 out of {BUCKETS}" in plan, plan
    assert "PushedFilters: [IsNotNull(url), EqualTo(url,u17)]" in plan \
        or "EqualTo(url,u17)" in plan, plan
