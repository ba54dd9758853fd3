"""Backend seam: Iceberg catalog detection + parquet fallback I/O."""


def test_parquet_roundtrip(spark, tmp_path):
    from document_extractor_spark.io_tables import (
        read_table, table_backend, write_table,
    )

    assert table_backend(spark) == "parquet"  # sandbox has no catalog
    df = spark.range(5).withColumnRenamed("id", "x")
    ident = write_table(df, "t1", str(tmp_path))
    assert ident == f"{tmp_path}/t1"
    got = read_table(spark, "t1", str(tmp_path))
    assert sorted(r.x for r in got.collect()) == [0, 1, 2, 3, 4]
    # append mode appends
    write_table(df, "t1", str(tmp_path))
    assert read_table(spark, "t1", str(tmp_path)).count() == 10
    # overwrite replaces
    write_table(df, "t1", str(tmp_path), mode="overwrite")
    assert read_table(spark, "t1", str(tmp_path)).count() == 5


def test_iceberg_catalog_detection(spark):
    from document_extractor_spark.io_tables import (
        iceberg_catalog, table_backend,
    )

    assert iceberg_catalog(spark) is None
    spark.conf.set("spark.sql.catalog.lake",
                   "org.apache.iceberg.spark.SparkCatalog")
    # sub-keys of the catalog must not be mistaken for catalogs
    spark.conf.set("spark.sql.catalog.lake.type", "hadoop")
    try:
        assert iceberg_catalog(spark) == "lake"
        assert table_backend(spark) == "iceberg"
    finally:
        spark.conf.unset("spark.sql.catalog.lake")
        spark.conf.unset("spark.sql.catalog.lake.type")
    assert iceberg_catalog(spark) is None
