"""Table I/O with an Iceberg fast path and a parquet fallback.

The north rule targets Iceberg tables (`pages`, `extracted`, the
metrics table) with snapshot-checkpoint resume. This sandbox has no
Iceberg runtime jar, so the engine is written against this seam:

- On a cluster with a configured Iceberg catalog
  (``spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog``),
  writes go through ``df.writeTo("<catalog>.<table>").append()`` —
  atomic snapshot commits, which is what makes the resume protocol
  exactly-once there (a crash mid-append leaves no partial rows, so
  the manifest in checkpoint.py degenerates to reading the last
  snapshot id).
- In the sandbox (no catalog), writes are parquet appends under a
  directory root, and checkpoint.py's manifest-commit-last protocol
  provides the same idempotency the snapshot would.

Only the backend seam lives here; all plan-building code is
backend-agnostic DataFrames.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_CATALOG_IMPLS = (
    "org.apache.iceberg.spark.SparkCatalog",
    "org.apache.iceberg.spark.SparkSessionCatalog",
)


def iceberg_catalog(spark: SparkSession) -> str | None:
    """Name of the first configured Iceberg catalog, or None.

    Reads ``SET`` output rather than SparkContext's frozen conf so
    catalogs registered either at spark-submit time (--conf) or at
    runtime (spark.conf.set) are both seen.
    """
    prefix = "spark.sql.catalog."
    for row in spark.sql("SET").collect():
        key, value = row[0], row[1]
        if (key.startswith(prefix) and key.count(".") == 3
                and value in ICEBERG_CATALOG_IMPLS):
            return key[len(prefix):]
    return None


def table_backend(spark: SparkSession) -> str:
    return "iceberg" if iceberg_catalog(spark) else "parquet"


def write_table(df: DataFrame, name: str, root: str,
                mode: str = "append") -> str:
    """Write `df` as table `name`; returns the identifier written.

    Iceberg: ``<catalog>.<name>`` via writeTo (snapshot commit).
    Parquet: ``<root>/<name>`` directory (append/overwrite files).
    """
    cat = iceberg_catalog(df.sparkSession)
    if cat:
        ident = f"{cat}.{name}"
        writer = df.writeTo(ident)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            # append() requires an existing table; the FIRST write on a
            # fresh catalog must bootstrap it (create() is the atomic
            # create-with-data form, racing creators: one wins, the
            # loser retries as a plain append)
            try:
                writer.append()
            except Exception:
                try:
                    writer.create()
                except Exception:
                    writer.append()
        return ident
    path = f"{root}/{name}"
    df.write.mode(mode).parquet(path)
    return path


def read_table(spark: SparkSession, name: str, root: str) -> DataFrame:
    cat = iceberg_catalog(spark)
    if cat:
        return spark.read.table(f"{cat}.{name}")
    return spark.read.parquet(f"{root}/{name}")
