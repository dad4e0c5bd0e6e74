"""SparkSession bootstrap for the sketch library.

Creates a session with the configs the library assumes (Arrow-batched
Python UDFs, AQE) and ships the package itself to executors via
``sc.addPyFile`` — the programmatic equivalent of
``spark-submit --py-files`` (north_rule launch mode), so kernels
running inside ``mapInPandas`` can import the package on any cluster,
not just when the driver's cwd happens to be on the workers' path.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
}


def package_zip() -> str:
    """Zip this package into a temp dir; returns the zip path."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    base = os.path.join(tempfile.gettempdir(), "btl_bloomfilter_spark_pyfiles")
    os.makedirs(base, exist_ok=True)
    out = os.path.join(base, "btl_bloomfilter_spark")
    zip_path = shutil.make_archive(out, "zip", root_dir=os.path.dirname(pkg_dir), base_dir=os.path.basename(pkg_dir))
    return zip_path


def get_spark(
    app_name: str = "btl_bloomfilter_spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    ship_package: bool = True,
) -> SparkSession:
    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    for k, v in _DEFAULTS.items():
        b = b.config(k, v)
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, str(v))
    spark = b.getOrCreate()
    if ship_package:
        attach_package(spark)
    return spark


def attach_package(spark: SparkSession) -> None:
    """Ship this package to executors of an existing session."""
    spark.sparkContext.addPyFile(package_zip())
