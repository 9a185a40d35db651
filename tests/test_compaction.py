"""Small-file compaction: the parquet-lake maintenance op Snowflake hides
from the reference (micro-partition compaction) made explicit."""

from __future__ import annotations

from enterprise_data_warehouse_spark.sources.sink import compact_parquet, _dir_stats
from enterprise_data_warehouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_compaction_shrinks_file_count_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "orders_small_files")
    orders = load_table(spark, SF, "orders")
    orders.repartition(64).write.parquet(path)  # simulate small-file debris
    n_before, _ = _dir_stats(spark, path)
    assert n_before == 64
    before_rows = spark.read.parquet(path).count()
    before_sum = spark.read.parquet(path).agg({"o_totalprice": "sum"}).first()[0]

    stats = compact_parquet(spark, path)  # tiny table → one 128MB-target file
    assert stats["files_before"] == 64 and stats["files_after"] == 1

    after = spark.read.parquet(path)
    assert after.count() == before_rows
    assert abs(after.agg({"o_totalprice": "sum"}).first()[0] - before_sum) < 1e-6
