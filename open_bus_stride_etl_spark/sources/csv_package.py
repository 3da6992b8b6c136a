"""CSV datapackage sink with idempotent (hash-compare) publishing.

Reference behavior (SURVEY.md §2.1 S6/S7, §2.9 X12):
- /root/reference/open_bus_stride_etl/packagers/siri.py:125-137 writes an
  hourly package (res_1.csv + datapackage.json carrying a content hash)
  via the `dataflows` library;
- :150-160 renames to `{base}.csv` / `{base}-metadata.json` and zips;
- :163-203 skips the upload when the destination exists and the content
  hash is unchanged (effectively-once publishing).

Spark re-expression: the data rows are written by executors
(`df.write.csv`); the manifest carries an ORDER-INSENSITIVE content hash
(sum of per-row md5-longs — functions/hashing.py) because Spark row
order is nondeterministic and the skip-if-unchanged contract must
survive re-partitioning. The zip/rename step is driver-side on the
final small artifact, exactly like the reference.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile
import zipfile

from pyspark.sql import DataFrame

from ..functions.hashing import content_hash_agg, content_hash_and_count


def write_package(df: DataFrame, out_dir: str, base_name: str) -> dict:
    """Write `{base_name}.csv` + `{base_name}-metadata.json` under
    ``out_dir``. Returns the manifest dict (schema, row count, hash)."""
    os.makedirs(out_dir, exist_ok=True)
    chash = content_hash_agg(df)
    n_rows = df.count()
    tmp = tempfile.mkdtemp(prefix="pkg_")
    try:
        # Executors write shards; the driver stitches the (small, hourly)
        # artifact. A cluster deployment with huge packages would keep
        # the sharded layout and zip per shard instead.
        df.write.mode("overwrite").option("header", True).csv(tmp)
        parts = sorted(glob.glob(os.path.join(tmp, "part-*.csv")))
        csv_path = os.path.join(out_dir, f"{base_name}.csv")
        with open(csv_path, "wb") as out:
            for i, p in enumerate(parts):
                with open(p, "rb") as fh:
                    if i > 0:
                        fh.readline()  # drop repeated header
                    shutil.copyfileobj(fh, out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    manifest = {
        "name": base_name,
        "fields": [{"name": f.name, "type": f.dataType.simpleString()} for f in df.schema],
        "row_count": n_rows,
        "hash": chash,
    }
    with open(os.path.join(out_dir, f"{base_name}-metadata.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def load_package(spark, out_dir: str, base_name: str) -> "DataFrame":
    """Read a package back (SURVEY.md §2.1 S4/S5): CSV loaded with an
    all-string schema first (the reference's CAST_TO_STRINGS strategy,
    packagers/siri.py:435-437), then cast per the manifest's field types
    — schema comes from the datapackage contract, never inference."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    manifest = read_manifest(out_dir, base_name)
    if manifest is None:
        raise FileNotFoundError(f"no manifest for {base_name} in {out_dir}")
    csv_path = os.path.join(out_dir, f"{base_name}.csv")
    all_string = ", ".join(f"`{f['name']}` string" for f in manifest["fields"])
    raw = spark.read.option("header", True).schema(all_string).csv(csv_path)
    return raw.select(
        *[F.col(f["name"]).cast(f["type"]).alias(f["name"]) for f in manifest["fields"]]
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
    Returns {status: created|updated|skipped|empty, hash, row_count}."""
    existing = read_manifest(out_dir, base_name)
    chash, n = content_hash_and_count(df)
    if existing is not None and existing.get("hash") == chash:
        return {"status": "skipped", "hash": chash, "row_count": existing.get("row_count")}
    if existing is None and n == 0:
        return {"status": "empty", "hash": chash, "row_count": 0}
    manifest = write_package(df, out_dir, base_name)
    if zip_it:
        zpath = os.path.join(out_dir, f"{base_name}.zip")
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED, compresslevel=9) as zf:
            zf.write(os.path.join(out_dir, f"{base_name}.csv"), f"{base_name}.csv")
            zf.write(
                os.path.join(out_dir, f"{base_name}-metadata.json"),
                f"{base_name}-metadata.json",
            )
    return {
        "status": "created" if existing is None else "updated",
        "hash": manifest["hash"],
        "row_count": manifest["row_count"],
    }
