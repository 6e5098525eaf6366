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

    class FakeWriter:
        def __init__(self, df, table):
            self._df, self._table = df, table
            self._partition_cols: list = []

        def partitionedBy(self, *cols):
            self._partition_cols = list(cols)
            return self

        def createOrReplace(self):
            path = os.path.join(
                tables_root, self._table.replace(".", "__"))
            w = self._df.write.mode("overwrite")
            if self._partition_cols:
                names = []
                for c in self._partition_cols:
                    if isinstance(c, str):
                        names.append(c)
                    else:  # Column reprs as "Column<'name'>"
                        names.append(str(c).split("'")[1])
                w = w.partitionBy(*names)
            w.parquet(path)
            registry[self._table] = path

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
        (absorb_batch, (spark, str(tmp_path / "kg"), docs, [], "fp")),
        (retract_batch, (spark, str(tmp_path / "kg"), docs, "fp")),
        (fold_retractions, (spark, str(tmp_path / "kg"))),
        (absorb_embeddings, (spark, str(tmp_path / "ivf"), docs, "fp")),
        (absorb_dedup_batch, (spark, str(tmp_path / "dd"), None, docs, "fp")),
    ]:
        with pytest.raises(NotImplementedError, match="Iceberg"):
            fn(*args)


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
