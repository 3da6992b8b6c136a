"""CSV datapackage sink with idempotent (hash-compare) publishing.

Reference behavior (SURVEY.md §2.1 S6/S7, §2.9 X12):
- /root/reference/open_bus_stride_etl/packagers/siri.py:125-137 writes an
  hourly package (res_1.csv + datapackage.json carrying a content hash)
  via the `dataflows` library;
- :150-160 renames to `{base}.csv` / `{base}-metadata.json` and zips;
- :163-203 skips the upload when the destination exists and the content
  hash is unchanged (effectively-once publishing).

Spark re-expression: the data rows are written by executors
(`df.write.csv`) with the content hash and row count computed IN the
same job via the Observation API — one execution per package, where a
naive port would run hash, count and write as three. The manifest is
shaped like the frictionless `datapackage.json` the reference's
`dataflows` dump emits (top-level `hash`/`count_of_rows`, a
`resources[0].schema.fields` list with datapackage types), so consumers
of the reference's packages can read ours; a `spark_type` annotation per
field keeps the round trip lossless (datapackage's `integer`/`number`
erase width and precision). The hash is ORDER-INSENSITIVE (sum of
per-row md5-longs — functions/hashing.py) because Spark row order is
nondeterministic and the skip-if-unchanged contract must survive
re-partitioning. The zip/rename step is driver-side on the final small
artifact, exactly like the reference.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile
import zipfile

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..functions.hashing import content_hash_and_count, hex_to_long, row_md5

# Spark simpleString -> frictionless datapackage field type
# (https://specs.frictionlessdata.io/table-schema/ — public spec).
_SPARK_TO_DP = {
    "string": "string",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "datetime",
    "timestamp_ntz": "datetime",
    "tinyint": "integer",
    "smallint": "integer",
    "int": "integer",
    "bigint": "integer",
    "float": "number",
    "double": "number",
    "binary": "string",
}

# frictionless type -> Spark type, for manifests produced by the
# reference (no spark_type annotation). Widest safe member of each class.
_DP_TO_SPARK = {
    "string": "string",
    "boolean": "boolean",
    "date": "date",
    "datetime": "timestamp",
    "time": "string",
    "year": "int",
    "integer": "bigint",
    "number": "double",
    "any": "string",
}


def _dp_type(spark_type: str) -> str:
    if spark_type.startswith("decimal"):
        return "number"
    return _SPARK_TO_DP.get(spark_type, "string")


def build_manifest(base_name: str, fields: list[dict], row_count: int, chash: int) -> dict:
    """Frictionless-shaped manifest. ``fields`` entries carry
    {"name", "type": <spark simpleString>}."""
    return {
        "name": base_name,
        "profile": "data-package",
        "hash": chash,
        "count_of_rows": row_count,
        "resources": [
            {
                "name": base_name,
                "path": f"{base_name}.csv",
                "profile": "tabular-data-resource",
                "format": "csv",
                "encoding": "utf-8",
                "schema": {
                    "fields": [
                        {
                            "name": f["name"],
                            "type": _dp_type(f["type"]),
                            "spark_type": f["type"],
                        }
                        for f in fields
                    ]
                },
            }
        ],
    }


def manifest_fields(manifest: dict) -> list[dict]:
    """Normalize any supported manifest shape to [{"name", "type":
    <spark type>}]. Accepts our frictionless shape, a reference-produced
    datapackage.json (fields without spark_type), and the legacy flat
    {"fields": [...]} form from earlier rounds."""
    if "resources" in manifest:
        raw = manifest["resources"][0]["schema"]["fields"]
    else:  # legacy flat manifest
        raw = manifest["fields"]
    out = []
    for f in raw:
        if "spark_type" in f:
            spark_type = f["spark_type"]
        elif f.get("type") in _DP_TO_SPARK:  # datapackage vocabulary
            spark_type = _DP_TO_SPARK[f["type"]]
        else:  # legacy flat manifests stored spark simpleStrings directly
            spark_type = f.get("type", "string")
        out.append({"name": f["name"], "type": spark_type})
    return out


def manifest_row_count(manifest: dict) -> int | None:
    return manifest.get("count_of_rows", manifest.get("row_count"))


def write_package(
    df: DataFrame,
    out_dir: str,
    base_name: str,
    precomputed: tuple[int, int] | None = None,
    empty_is_noop: bool = False,
) -> dict | None:
    """Write `{base_name}.csv` + `{base_name}-metadata.json` under
    ``out_dir``. Returns the manifest dict (schema, row count, hash).

    ONE Spark execution: the order-insensitive content hash and row
    count ride along with the CSV write as observed metrics instead of
    running as separate jobs. ``precomputed`` lets a caller that already
    aggregated (hash, count) — e.g. publish_if_changed's skip check —
    avoid even the observation arithmetic. ``empty_is_noop`` returns
    None WITHOUT creating any artifact when the observed row count is 0
    (publish_if_changed's 'empty' contract for never-published hours —
    the check rides the same single execution)."""
    os.makedirs(out_dir, exist_ok=True)
    obs = None
    to_write = df
    if precomputed is None:
        h = hex_to_long(F.substring(row_md5(*[F.col(c) for c in df.columns]), 1, 10))
        obs = Observation()
        to_write = df.observe(
            obs,
            (F.coalesce(F.sum(h), F.lit(0)) + F.count(F.lit(1))).alias("chash"),
            F.count(F.lit(1)).alias("n"),
        )
    tmp = tempfile.mkdtemp(prefix="pkg_")
    try:
        # Executors write shards; the driver stitches the (small, hourly)
        # artifact. A cluster deployment with huge packages would keep
        # the sharded layout and zip per shard instead.
        to_write.write.mode("overwrite").option("header", True).csv(tmp)
        if empty_is_noop and (precomputed or (0, obs.get["n"]))[1] == 0:
            return None  # nothing published; tmp shards removed below
        parts = sorted(glob.glob(os.path.join(tmp, "part-*.csv")))
        csv_path = os.path.join(out_dir, f"{base_name}.csv")
        with open(csv_path, "wb") as out:
            if not parts:  # zero partitions: header-only artifact
                # RFC-4180 quoting, matching Spark's own header escaping
                import csv as _csv  # noqa: PLC0415
                import io  # noqa: PLC0415

                buf = io.StringIO()
                _csv.writer(buf, lineterminator="\n").writerow(df.columns)
                out.write(buf.getvalue().encode())
            for i, p in enumerate(parts):
                with open(p, "rb") as fh:
                    if i > 0:
                        fh.readline()  # drop repeated header
                    shutil.copyfileobj(fh, out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    chash, n_rows = precomputed if precomputed is not None else (
        obs.get["chash"],
        obs.get["n"],
    )
    manifest = build_manifest(
        base_name,
        [{"name": f.name, "type": f.dataType.simpleString()} for f in df.schema],
        n_rows,
        chash,
    )
    with open(os.path.join(out_dir, f"{base_name}-metadata.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def load_package(spark, out_dir: str, base_name: str) -> "DataFrame":
    """Read a package back (SURVEY.md §2.1 S4/S5): CSV loaded with an
    all-string schema first (the reference's CAST_TO_STRINGS strategy,
    packagers/siri.py:435-437), then cast per the manifest's field types
    — schema comes from the datapackage contract, never inference.
    Accepts reference-shaped datapackage.json manifests too."""
    manifest = read_manifest(out_dir, base_name)
    if manifest is None:
        raise FileNotFoundError(f"no manifest for {base_name} in {out_dir}")
    fields = manifest_fields(manifest)
    csv_path = os.path.join(out_dir, f"{base_name}.csv")
    all_string = ", ".join(f"`{f['name']}` string" for f in fields)
    # multiLine: string fields containing a newline are RFC-4180-quoted
    # by Spark's writer and span physical lines; without it the reader
    # splits mid-field (r10). Packages are small hourly artifacts, so
    # the unsplittable-file cost of multiLine is irrelevant here.
    raw = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .schema(all_string)
        .csv(csv_path)
    )
    return raw.select(
        *[F.col(f["name"]).cast(f["type"]).alias(f["name"]) for f in fields]
    )


def read_manifest(out_dir: str, base_name: str) -> dict | None:
    path = os.path.join(out_dir, f"{base_name}-metadata.json")
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def publish_if_changed(df: DataFrame, out_dir: str, base_name: str, zip_it: bool = True) -> dict:
    """Effectively-once publish: skip when the existing manifest hash
    matches (packagers/siri.py:194-202); an hour with no rows and no
    prior package is a no-op ('empty'), so the hour sweep and the
    one-job backfill (which only sees hours that have data) agree.
    ONE Spark execution for never-published targets (the hash/count
    rides the write job as observed metrics — a prior manifest is the
    only thing a skip can compare against, so without one the pre-write
    hash-check pass was pure duplicate work; r9) and when skipped; TWO
    only for the updated path (hash-check aggregation + observed write).
    Returns {status: created|updated|skipped|empty, hash, row_count}."""
    existing = read_manifest(out_dir, base_name)
    if existing is None:
        # An empty frame publishes nothing (write_package returns None
        # before stitching; the observed hash of an empty set is 0+0).
        manifest = write_package(df, out_dir, base_name, empty_is_noop=True)
        if manifest is None:
            return {"status": "empty", "hash": 0, "row_count": 0}
        status = "created"
    else:
        chash, n = content_hash_and_count(df)
        if existing.get("hash") == chash:
            return {
                "status": "skipped",
                "hash": chash,
                "row_count": manifest_row_count(existing),
            }
        manifest = write_package(df, out_dir, base_name, precomputed=(chash, n))
        status = "updated"
    if zip_it:
        zpath = os.path.join(out_dir, f"{base_name}.zip")
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED, compresslevel=9) as zf:
            zf.write(os.path.join(out_dir, f"{base_name}.csv"), f"{base_name}.csv")
            zf.write(
                os.path.join(out_dir, f"{base_name}-metadata.json"),
                f"{base_name}-metadata.json",
            )
    return {
        "status": status,
        "hash": manifest["hash"],
        "row_count": manifest_row_count(manifest),
    }
