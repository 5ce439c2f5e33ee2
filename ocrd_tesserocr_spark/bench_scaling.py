"""One scaling-run worker: extract a prepared pages parquet at a given
core count, print one JSON line with wall time and docs/sec.

Run as: python -m ocrd_tesserocr_spark.bench_scaling <cores> <pages_path>

This is the sandbox evidence protocol for the north rule's N-vs-4N
scaling criterion (BASELINE.md): identical job, identical input, two
parallelism levels; a real cluster would swap `local[N]` for N executors
via spark-submit with the same code.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    cores = int(sys.argv[1])
    pages_path = sys.argv[2]

    from ocrd_tesserocr_spark.pipeline import extract
    from ocrd_tesserocr_spark.plans import EXTRACT
    from ocrd_tesserocr_spark.session import get_spark

    spark = get_spark(f"local[{cores}]", shuffle_partitions=cores, app_name=f"bench{cores}")
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path)
    n_docs = pages.count()

    # warmup: spin up Python workers / Arrow channels on a small slice
    extract(spark, pages.limit(2000), EXTRACT, num_partitions=cores).write.format("noop").mode(
        "overwrite"
    ).save()

    t0 = time.time()
    out = extract(spark, pages, EXTRACT, num_partitions=2 * cores)
    out.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0

    print(
        json.dumps(
            {
                "cores": cores,
                "docs": n_docs,
                "wall_sec": round(wall, 3),
                "docs_per_sec": round(n_docs / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
