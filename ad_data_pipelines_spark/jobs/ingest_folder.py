"""Folder-ingest job: the reference's scheduled CSV importer
(`data_ingestion/folder_import.R:9-213`) as a spark-submit entry
point.

    spark-submit -m ad_data_pipelines_spark.jobs.ingest_folder \
        --root /landing/csv --warehouse /data/warehouse

Walks `<root>/<table>/*.csv`, imports files not yet in each table's
manifest (idempotent re-runs, crash-safe write+marker ordering,
per-feed schema cache — `sources/manifest.import_folder`), and prints
ONE JSON line {table: files_imported_this_run}.
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True,
                    help="landing directory: <root>/<table>/*.csv")
    ap.add_argument("--warehouse", required=True,
                    help="parquet warehouse root")
    ap.add_argument("--ext", default=".csv", help="source file extension")
    args = ap.parse_args(argv)

    from ad_data_pipelines_spark.session import get_spark
    from ad_data_pipelines_spark.sources.manifest import import_folder

    spark = get_spark(app_name="ingest_folder")
    print(json.dumps(
        import_folder(spark, args.root, args.warehouse, file_ext=args.ext)
    ))


if __name__ == "__main__":
    main()
