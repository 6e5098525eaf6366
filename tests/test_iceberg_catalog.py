"""The Iceberg degradation path of the stage sinks (sinks.py): when the
session catalog is Iceberg-backed, ``write_stage`` must route the data
write to ``df.writeTo(table).createOrReplace()`` and ``read_stage`` to
``spark.table(table)``, with the sidecar manifest/marker/snapshot-log
contract (resume, lineage, metrics) intact.

The sandbox has no Iceberg runtime jar, so the catalog is FAKED at the
boundary the routing crosses: the catalog conf key flips
``iceberg_available`` on, and ``DataFrame.writeTo`` /
``SparkSession.table`` are monkeypatched to a parquet-backed table
registry.  What is really under test is this engine's routing + sidecar
logic — the part Iceberg does not provide.
"""

import os

import pytest
from pyspark.sql import DataFrame, SparkSession, functions as F

from onto_text_tag_spark.sinks import (
    iceberg_available,
    iceberg_stage_table,
    read_manifest,
    read_stage,
    run_stage,
    snapshot_log,
    stage_is_current,
    write_stage,
)

ICEBERG_CATALOG_IMPL = "org.apache.iceberg.spark.SparkSessionCatalog"


@pytest.fixture()
def iceberg_session(spark, tmp_path, monkeypatch):
    """The spark session with a faked Iceberg session catalog: conf key
    set, writeTo/table bridged to a parquet-per-table registry."""
    tables_root = str(tmp_path / "_tables")
    registry: dict[str, str] = {}
    part_cols: dict[str, list] = {}
    versions: dict[str, int] = {}

    class FakeWriter:
        def __init__(self, df, table):
            self._df, self._table = df, table
            self._partition_cols: list = []

        def partitionedBy(self, *cols):
            self._partition_cols = list(cols)
            return self

        def append(self):
            # Iceberg's atomic append commit, faked as parquet
            # mode("append") into the registered table path (tables
            # are stored UNPARTITIONED on disk — the partition column
            # rides as a normal column — so appended files mix with
            # the original layout cleanly)
            path = registry.get(self._table)
            if path is None:
                raise ValueError(f"append to unknown table {self._table}")
            self._df.write.mode("append").parquet(path)

        def overwritePartitions(self):
            # Iceberg dynamic-partition replacement: swap exactly the
            # partitions PRESENT in the new df, keep the rest.  Faked
            # by materializing keep ∪ new into a fresh versioned path
            # (can't overwrite a path while lazily reading it).
            path = registry.get(self._table)
            if path is None:
                raise ValueError(
                    f"overwritePartitions on unknown table {self._table}")
            pcols = part_cols.get(self._table, [])
            if not pcols:
                raise ValueError(
                    f"table {self._table} is unpartitioned")
            spark_s = self._df.sparkSession
            existing = spark_s.read.parquet(path)
            vals = [
                tuple(r) for r in
                self._df.select(*pcols).distinct().collect()
            ]
            from pyspark.sql import functions as FF
            import functools
            cond = functools.reduce(
                lambda a, b: a | b,
                [functools.reduce(
                    lambda x, y: x & y,
                    [FF.col(c) == v for c, v in zip(pcols, tup)])
                 for tup in vals],
            )
            keep = existing.where(~cond)
            out = keep.unionByName(self._df.select(*existing.columns))
            versions[self._table] = versions.get(self._table, 0) + 1
            newpath = f"{path}__v{versions[self._table]}"
            out.write.mode("overwrite").parquet(newpath)
            registry[self._table] = newpath

        def createOrReplace(self):
            versions[self._table] = versions.get(self._table, 0) + 1
            path = os.path.join(
                tables_root,
                self._table.replace(".", "__")
                + f"__v{versions[self._table]}")
            names = []
            for c in self._partition_cols:
                if isinstance(c, str):
                    names.append(c)
                else:  # Column reprs as "Column<'name'>"
                    names.append(str(c).split("'")[1])
            # stored unpartitioned (partition col as a normal column)
            # so later append()/overwritePartitions() compose; the
            # partition spec is recorded for overwritePartitions
            self._df.write.mode("overwrite").parquet(path)
            registry[self._table] = path
            part_cols[self._table] = names

    # patch the CONCRETE classes (Spark 4 routes through
    # pyspark.sql.classic subclasses whose methods shadow the base)
    df_cls = type(spark.range(1))
    sess_cls = type(spark)
    real_table = sess_cls.table

    def fake_table(self, name):
        if name in registry:
            return self.read.parquet(registry[name])
        return real_table(self, name)

    monkeypatch.setattr(df_cls, "writeTo",
                        lambda self, table: FakeWriter(self, table))
    monkeypatch.setattr(sess_cls, "table", fake_table)
    spark.conf.set("spark.sql.catalog.spark_catalog", ICEBERG_CATALOG_IMPL)
    try:
        yield spark, registry
    finally:
        spark.conf.unset("spark.sql.catalog.spark_catalog")


def test_iceberg_available_flips_on_catalog_conf(spark):
    assert not iceberg_available(spark)
    spark.conf.set("spark.sql.catalog.spark_catalog", ICEBERG_CATALOG_IMPL)
    try:
        assert iceberg_available(spark)
    finally:
        spark.conf.unset("spark.sql.catalog.spark_catalog")
    assert not iceberg_available(spark)


def test_stage_table_names_are_deterministic_and_root_scoped(spark):
    a1 = iceberg_stage_table(spark, "/data/kg_a", "mentions")
    a2 = iceberg_stage_table(spark, "/data/kg_a", "mentions")
    b = iceberg_stage_table(spark, "/data/kg_b", "mentions")
    assert a1 == a2 and a1 != b
    assert a1.startswith("onto_kg.kg_a_") and a1.endswith("_mentions")


def test_write_stage_routes_to_writeTo_and_reads_back(
        iceberg_session, tmp_path):
    spark, registry = iceberg_session
    root = str(tmp_path / "kg")
    df = spark.range(0, 100).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("bucket"),
    )

    manifest = write_stage(df, root, "nodes", partition_by=["bucket"],
                           input_fingerprint="fp1", metrics={"note": 1})

    table = iceberg_stage_table(spark, root, "nodes")
    assert registry == {table: registry[table]}  # data went through writeTo
    assert not os.path.exists(os.path.join(root, "nodes", "data"))
    assert manifest["format"] == "iceberg"
    assert manifest["table"] == table
    assert manifest["total_rows"] == 100
    assert manifest["partition_by"] == ["bucket"]
    assert sorted(p["bucket"] for p in manifest["partitions"]) == \
        ["0", "1", "2"]
    assert sum(p["rows"] for p in manifest["partitions"]) == 100
    assert manifest["metrics"] == {"note": 1}

    # sidecar resume contract is intact
    assert stage_is_current(root, "nodes", "fp1")
    assert not stage_is_current(root, "nodes", "fp2")
    assert read_manifest(root, "nodes")["table"] == table
    assert len(snapshot_log(root, "nodes")) == 1

    got = read_stage(spark, root, "nodes")
    assert got.count() == 100
    assert set(got.columns) == {"id", "bucket"}

    with pytest.raises(NotImplementedError, match="VERSION AS OF"):
        read_stage(spark, root, "nodes", snapshot_id=1)


def test_run_stage_resume_under_iceberg(iceberg_session, tmp_path):
    spark, registry = iceberg_session
    root = str(tmp_path / "kg")
    calls = []

    def compute():
        calls.append(1)
        return spark.range(0, 7).toDF("id")

    out1 = run_stage(spark, root, "s", compute, input_fingerprint="v1")
    out2 = run_stage(spark, root, "s", compute, input_fingerprint="v1")
    assert len(calls) == 1  # second run resumed from the table snapshot
    assert out1.count() == out2.count() == 7
    run_stage(spark, root, "s", compute, input_fingerprint="v2")
    assert len(calls) == 2  # changed fingerprint recomputes
    assert len(snapshot_log(root, "s")) == 2


def test_file_level_protocol_refused_under_catalog(iceberg_session, tmp_path):
    """The absorb/fold/compact entry points mutate local stage data dirs
    (_append_batch_files / _swap_subtree); under an Iceberg catalog
    those dirs do not exist, so the entry points must refuse UP FRONT
    rather than die mid-protocol with FileNotFoundError."""
    spark, _registry = iceberg_session
    from onto_text_tag_spark.plans.dedup_absorb import absorb_dedup_batch
    from onto_text_tag_spark.plans.ivf_absorb import absorb_embeddings
    from onto_text_tag_spark.plans.kg_absorb import (
        absorb_batch,
        fold_retractions,
        retract_batch,
    )

    docs = spark.createDataFrame([("u", "t")], ["url", "text"])
    for fn, args in [
        (retract_batch, (spark, str(tmp_path / "kg"), docs, "fp")),
        (fold_retractions, (spark, str(tmp_path / "kg"))),
        (absorb_embeddings, (spark, str(tmp_path / "ivf"), docs, "fp")),
        (absorb_dedup_batch, (spark, str(tmp_path / "dd"), None, docs, "fp")),
    ]:
        with pytest.raises(NotImplementedError, match="Iceberg"):
            fn(*args)
    # absorb_batch itself commits table-level since round 4, but its
    # --sketch/--trends side stages still swap files — flags refuse
    with pytest.raises(NotImplementedError, match="Iceberg"):
        absorb_batch(spark, str(tmp_path / "kg"), docs, [], "fp",
                     sketch_k=16)
    with pytest.raises(NotImplementedError, match="Iceberg"):
        absorb_batch(spark, str(tmp_path / "kg"), docs, [], "fp",
                     trends_bucket="month")


def test_commit_stage_refused_on_table_backed_stage(
        iceberg_session, tmp_path):
    spark, _registry = iceberg_session
    from onto_text_tag_spark.sinks import commit_stage, stage_is_table_backed

    root = str(tmp_path / "root")
    write_stage(spark.range(3).select(F.col("id").alias("x")), root, "s1")
    assert stage_is_table_backed(root, "s1")
    with pytest.raises(NotImplementedError, match="table-backed"):
        commit_stage(root, "s1")


def test_stage_exists_sees_table_backed_stages(iceberg_session, tmp_path):
    """View registration checks stage existence; a table-backed stage
    has no data/ dir but must still count as existing."""
    spark, _registry = iceberg_session
    from onto_text_tag_spark.views import _stage_exists

    root = str(tmp_path / "root2")
    write_stage(spark.range(3).select(F.col("id").alias("x")), root, "s1")
    assert not os.path.exists(os.path.join(root, "s1", "data"))
    assert _stage_exists(root, "s1")
    assert not _stage_exists(root, "absent")


def test_pq_absorb_refused_under_catalog(iceberg_session, tmp_path):
    spark, _registry = iceberg_session
    from onto_text_tag_spark.plans.pq_absorb import absorb_pq_batch

    vecs = spark.createDataFrame(
        [(1, [0.1, 0.2])], ["vec_id", "embedding"])
    with pytest.raises(NotImplementedError, match="Iceberg"):
        absorb_pq_batch(spark, str(tmp_path / "pq"), vecs, "fp")


def test_paragraph_absorb_under_catalog_equals_rebuild(
        iceberg_session, tmp_path):
    """VERDICT r3 item 7: the table-level incremental protocol, proven
    on the append-only paragraph-absorb path — absorbing batches under
    the Iceberg session catalog (writeTo(...).append() per stage via
    sinks.append_stage_iceberg) must equal the batch operator over the
    union, replays must no-op, and the sidecar snapshot log must chain
    fingerprints exactly like the file-backed path."""
    spark, registry = iceberg_session
    from onto_text_tag_spark.operators.dedup import paragraph_dedup
    from onto_text_tag_spark.plans.paragraph_absorb import (
        absorb_paragraph_batch,
        init_paragraph_root,
        read_para_deduped,
    )
    from onto_text_tag_spark.sinks import read_manifest, snapshot_log

    schema = "url string, text string, lang string"
    batch_a = [
        ("a01", "Accept all cookies\nalpha body one", "en"),
        ("a02", "accept ALL   cookies\nbeta body two\nshared footer",
         "en"),
        ("a03", "", "en"),
    ]
    batch_b = [
        ("b01", "Accept all cookies\nshared footer\nfresh gamma body",
         "en"),
        ("b02", "fresh gamma body\ndelta body four", "de"),
    ]

    root = str(tmp_path / "para_ice")
    init_paragraph_root(spark, root, schema)
    assert read_manifest(root, "deduped")["format"] == "iceberg"

    r1 = absorb_paragraph_batch(
        spark, root, spark.createDataFrame(batch_a, schema), "fp-A")
    assert r1["status"] == "committed"
    r2 = absorb_paragraph_batch(
        spark, root, spark.createDataFrame(batch_b, schema), "fp-B")
    assert r2["status"] == "committed"

    union = spark.createDataFrame(batch_a + batch_b, schema)
    expected = {
        r["url"]: r
        for r in paragraph_dedup(union, id_col="url").collect()
    }
    live = {r["url"]: r
            for r in read_para_deduped(spark, root).collect()}
    assert set(live) == set(expected)
    for url, exp in expected.items():
        assert live[url]["text"] == exp["text"], url
        assert live[url]["n_paragraphs"] == exp["n_paragraphs"], url
        assert live[url]["n_kept"] == exp["n_kept"], url
    assert live["b02"]["lang"] == "de"

    # replay: committed no-op — the table is untouched
    n_before = read_para_deduped(spark, root).count()
    r3 = absorb_paragraph_batch(
        spark, root, spark.createDataFrame(batch_a, schema), "fp-A")
    assert r3["status"] == "noop_already_committed"
    assert read_para_deduped(spark, root).count() == n_before

    # per-stage idempotency: a direct re-append of an already-sealed
    # batch fingerprint is skipped (the crash-between-appends replay)
    from onto_text_tag_spark.sinks import append_stage_iceberg

    before = read_manifest(root, "para_digests")["total_rows"]
    append_stage_iceberg(
        spark.createDataFrame([(999,)], "digest long"),
        spark, root, "para_digests", "fp-A",
    )
    assert read_manifest(root, "para_digests")["total_rows"] == before

    # sidecar log: init + one entry per committed batch, fingerprints
    # recorded in metrics
    log = snapshot_log(root, "deduped")
    fps = [s.get("metrics", {}).get("batch_fingerprint") for s in log]
    assert fps == [None, "fp-A", "fp-B"]


def test_kg_absorb_under_catalog_equals_file_backed(
        iceberg_session, tmp_path):
    """VERDICT r3 item 7, the named path: the kg_update absorb commits
    table-level under the Iceberg catalog — mention/doc_terms/
    mention-triple appends via append_stage_iceberg, the merged
    co-occurrence branch via writeTo(...).overwritePartitions() (the
    _swap_subtree analog) — and the resulting stages must EQUAL the
    file-backed absorb over the same two batches.  Replays no-op."""
    spark, registry = iceberg_session
    from pyspark.sql import functions as F

    from onto_text_tag_spark.corpus import (
        distributed_documents_df,
        mini_ontology,
    )
    from onto_text_tag_spark.dictionary import build_dictionary_rows
    from onto_text_tag_spark.plans.kg_absorb import (
        absorb_batch,
        init_kg_root,
    )

    onto = mini_ontology()
    dict_rows = build_dictionary_rows(onto)
    docs = distributed_documents_df(spark, 80, seed=13, partitions=4)
    docs.cache().count()
    b1 = docs.where(F.crc32("url") % 2 == 0)
    b2 = docs.where(F.crc32("url") % 2 == 1)

    # catalog-backed root
    ice_root = str(tmp_path / "kg_ice")
    init_kg_root(spark, ice_root, onto)
    s1 = absorb_batch(spark, ice_root, b1, dict_rows, batch_fp="b1")
    assert s1["status"] == "committed"
    s2 = absorb_batch(spark, ice_root, b2, dict_rows, batch_fp="b2")
    assert s2["status"] == "committed"
    rep = absorb_batch(spark, ice_root, b1, dict_rows, batch_fp="b1")
    assert rep["status"] == "noop_already_committed"

    ice_stages = {
        stage: sorted(map(tuple,
                          read_stage(spark, ice_root, stage).collect()))
        for stage in ("mentions", "doc_terms", "triples")
    }

    # file-backed twin over the same batches (catalog off)
    spark.conf.unset("spark.sql.catalog.spark_catalog")
    try:
        file_root = str(tmp_path / "kg_file")
        init_kg_root(spark, file_root, onto)
        absorb_batch(spark, file_root, b1, dict_rows, batch_fp="b1")
        absorb_batch(spark, file_root, b2, dict_rows, batch_fp="b2")
        file_stages = {
            stage: sorted(map(tuple, read_stage(
                spark, file_root, stage).collect()))
            for stage in ("mentions", "doc_terms", "triples")
        }
    finally:
        spark.conf.set("spark.sql.catalog.spark_catalog",
                       ICEBERG_CATALOG_IMPL)

    for stage in ("mentions", "doc_terms", "triples"):
        assert ice_stages[stage] == file_stages[stage], stage
    # co-occurrence weights merged across batches, not replaced: the
    # triples rows must contain cross-batch co_occurs_with weights
    n_cooccur = sum(1 for r in ice_stages["triples"]
                    if "co_occurs_with" in r)
    assert n_cooccur > 0
