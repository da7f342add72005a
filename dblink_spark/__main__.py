"""CLI entry point: ``python -m dblink_spark <config.conf>``.

Reproduces the reference's ``spark-submit dblink.jar <config.conf>`` surface
(ref: Run.scala:27-49): build a SparkSession, parse the HOCON config, write
run.txt provenance, execute the configured step list.
"""

from __future__ import annotations

import json
import sys

from dblink_spark.project import Project
from dblink_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 1 or argv[0] in ("-h", "--help"):
        print("usage: python -m dblink_spark <config.conf>", file=sys.stderr)
        return 2
    spark = get_spark("dblink_spark")
    try:
        project = Project.from_config_file(spark, argv[0])
        results = project.run()
        print(json.dumps(results, indent=2, default=str))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
