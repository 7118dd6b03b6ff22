"""S7 — filesystem connectors.

Reference: `DPF/connectors/connector.py:12-160` defines a Connector ABC
with Local and S3 implementations (~120 LoC of IO code). On Spark this
layer is the Hadoop FileSystem abstraction: every reader/writer in this
engine takes a URI, so `file://`, `hdfs://`, and `s3a://` work with
configuration only — no connector code.

These helpers pin down the configuration surface.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def configure_s3(
    spark: SparkSession,
    endpoint: str | None = None,
    access_key: str | None = None,
    secret_key: str | None = None,
    path_style_access: bool = True,
) -> None:
    """Equivalent of constructing `S3Connector`
    (`DPF/connectors/s3_connector.py:9-81`): after this, every
    `spark.read`/`df.write` accepts `s3a://bucket/key` URIs."""
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    if endpoint:
        conf.set("fs.s3a.endpoint", endpoint)
    if access_key:
        conf.set("fs.s3a.access.key", access_key)
    if secret_key:
        conf.set("fs.s3a.secret.key", secret_key)
    conf.set("fs.s3a.path.style.access", str(path_style_access).lower())


def join_path(*parts: str) -> str:
    """URI-safe join (`DPF/connectors/connector.py` join semantics,
    golden-tested like `tests/test_filesystem.py:4-15`)."""
    if not parts:
        return ""
    out = parts[0].rstrip("/")
    for p in parts[1:]:
        out = f"{out}/{p.strip('/')}" if p else out
    return out
