"""Prototype: Spark 4 VARIANT type vs DuckDB JSON parity (VERDICT r11
item 2 — prototype BEFORE registering).

Checks, on the driver corpus, whether a VARIANT-based extraction query
produces values DuckDB's JSON functions replicate exactly:

- ``parse_json(props)`` -> VARIANT
- ``variant_get(v, '$.k', 'long')`` typed extraction
- a CONSTRUCTED nested document (object + array) exercising
  ``$.meta.vals[1]`` path syntax and a missing-path NULL
- ``is_variant_null`` / try_ behavior on junk input

Run: python tools/prototype_variant.py [sf_dir]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from data_engineer_interview_task_spark.plans import prep_session
from data_engineer_interview_task_spark.sources import read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("variant-prototype")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    prep_session(spark)
    read_table(spark, sf_dir, "events").createOrReplaceTempView("events")

    # constructed nested JSON from existing columns (identical string on
    # both engines), then VARIANT extraction of flat/nested/array paths
    spark_sql = """
WITH j AS (
  SELECT event_type,
         parse_json(concat(
           '{"meta": {"type": "', event_type,
           '", "vals": [', CAST(user_id % 7 AS STRING), ', ',
           get_json_object(props, '$.k'),
           ']}, "k": ', get_json_object(props, '$.k'), '}')) AS v
  FROM events
)
SELECT event_type,
       COUNT(*) AS n,
       SUM(variant_get(v, '$.k', 'long')) AS sum_k,
       SUM(variant_get(v, '$.meta.vals[0]', 'long')) AS sum_val0,
       SUM(variant_get(v, '$.meta.vals[1]', 'long')) AS sum_val1,
       SUM(CASE WHEN variant_get(v, '$.meta.type', 'string') = event_type
                THEN 1 ELSE 0 END) AS n_type_match,
       SUM(CASE WHEN try_variant_get(v, '$.missing', 'long') IS NULL
                THEN 1 ELSE 0 END) AS n_missing_null
FROM j
GROUP BY event_type
ORDER BY event_type
"""
    try:
        got = [tuple(r) for r in spark.sql(spark_sql).collect()]
        print("SPARK VARIANT OK:")
        for r in got:
            print("  ", r)
    except Exception as ex:
        print("SPARK VARIANT FAILED:", str(ex)[:500])
        spark.stop()
        return

    con = duckdb.connect()
    con.execute("SET threads=2")
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{sf_dir}/events.parquet')"
    )
    duck_sql = """
WITH j AS (
  SELECT event_type,
         '{"meta": {"type": "' || event_type || '", "vals": ['
         || CAST(CAST(user_id % 7 AS BIGINT) AS VARCHAR) || ', '
         || json_extract_string(props, '$.k')
         || ']}, "k": ' || json_extract_string(props, '$.k') || '}' AS v
  FROM events
)
SELECT event_type,
       COUNT(*) AS n,
       SUM(CAST(json_extract_string(v, '$.k') AS BIGINT)) AS sum_k,
       SUM(CAST(json_extract_string(v, '$.meta.vals[0]') AS BIGINT))
         AS sum_val0,
       SUM(CAST(json_extract_string(v, '$.meta.vals[1]') AS BIGINT))
         AS sum_val1,
       SUM(CASE WHEN json_extract_string(v, '$.meta.type') = event_type
                THEN 1 ELSE 0 END) AS n_type_match,
       SUM(CASE WHEN json_extract_string(v, '$.missing') IS NULL
                THEN 1 ELSE 0 END) AS n_missing_null
FROM j
GROUP BY event_type
ORDER BY event_type
"""
    want = con.execute(duck_sql).fetchall()
    print("DUCKDB JSON:")
    for r in want:
        print("  ", r)
    match = [tuple(r) for r in got] == [tuple(r) for r in want]
    print("PARITY:", "MATCH" if match else "MISMATCH")
    spark.stop()


if __name__ == "__main__":
    main()
