"""Ad-hoc SQL surface: ``python -m the_hive_spark.sql "SELECT ..."``.

Registers the driver testdata tables (region nation customer supplier
part orders lineitem events documents embeddings) as temp views over
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.01) and runs the
given statement through Spark SQL — the engine's general query surface
beyond the pre-registered operators. The same views back
``HiveEngine``'s SQL mode; Catalyst plans ad-hoc statements with the
identical pushdown/broadcast behavior the curated queries get.
"""

from __future__ import annotations

import os
import sys


def main(argv: list[str] | None = None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        raise SystemExit('usage: python -m the_hive_spark.sql "SELECT ..." [limit]')
    stmt = argv[0]
    limit = int(argv[1]) if len(argv) > 1 else 100

    from the_hive_spark.session import get_spark
    from the_hive_spark.tables import register_views

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="the-hive-spark-sql")
    register_views(spark, sf_dir)
    df = spark.sql(stmt)
    df.show(limit, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
