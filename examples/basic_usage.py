"""Programmatic API walkthrough (mirrors reference examples/basic_usage.cpp).

The reference example builds a 3-column table, writes it, and runs the
four query shapes (full scan :49-57, filter :61-73, aggregate :76-85,
group-by :88-98).  Same flow here, Spark-first: create → write parquet →
read → Query builder.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from columnar_analytics_engine_spark import (
    AggFunc,
    CompareOp,
    Query,
    describe,
    get_spark,
    write_table,
)


def main() -> None:
    spark = get_spark(app_name="cae-example")

    # reference fixture: examples/basic_usage.cpp:14-33
    df = spark.createDataFrame(
        [(1, 25, "Paris"), (2, 30, "Lyon"), (3, 25, "Paris"), (4, 35, "Nice"), (5, 30, "Lyon")],
        "id long, age int, city string",
    )

    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/people.parquet"
        write_table(df, path)
        meta = describe(path)
        print(f"total_rows={meta['total_rows']} schema={meta['schema']}")

        people = spark.read.parquet(path)

        # SELECT * FROM people
        Query(people).execute().show()

        # SELECT id, city FROM people WHERE age > 25
        (
            Query(people)
            .set_projection(["id", "city"])
            .add_filter("age", CompareOp.GT, 25)
            .execute()
            .show()
        )

        # SELECT count(*), sum(age), min(age), max(age) FROM people
        Query(people).set_aggregation(AggFunc.SUM, "age").execute().show()

        # SELECT city, count, sum, min, max FROM people GROUP BY city ORDER BY city
        (
            Query(people)
            .set_group_by("city")
            .set_aggregation(AggFunc.SUM, "age")
            .execute()
            .show()
        )


if __name__ == "__main__":
    main()
