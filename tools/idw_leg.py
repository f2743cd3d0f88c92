"""One scaling LEG for the IDW interpolation path (geoparse → shuffled
radius grid join with the value threaded through → integer-weight
groupBy) at a given core count. Prints one JSON line. Used by
tools/idw_scaling.py (alternating min-of-k, same protocol as
pip_scaling.py).

Usage: python tools/idw_leg.py <cpus> [n_pages]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")


def main() -> None:
    cpus = int(sys.argv[1])
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 12_000_000

    from pyspark.sql import functions as F

    from osm_spark.data.pages import PagesSpec, pages_df
    from osm_spark.session import get_spark
    from osm_spark.spatial.geoparse import geoparse_pages
    from osm_spark.spatial.interpolate import idw_interpolate

    spark = get_spark(
        app_name=f"idw-leg-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).select(F.sum("id")).collect()  # JIT warm
    spark.range(0, cpus * 4, 1, cpus).mapInPandas(
        lambda it: it, "id long"
    ).count()  # python worker pool warm (see pip_leg.py)

    pages = pages_df(
        spark, PagesSpec(n_pages=n_pages, n_countries=4)
    ).select("url", "text").persist()
    pages.count()

    pts = geoparse_pages(pages).select(
        "url", "lon", "lat", F.pmod(F.xxhash64("url"), F.lit(1000)).alias("val")
    ).persist()
    pts.count()

    page_no = F.regexp_extract("url", r"page/(\d+)$", 1).cast("long")
    queries = pts.where(page_no % 40 == 0).select("url", "lon", "lat")
    out = idw_interpolate(
        queries, pts, "val", 0.03,
        broadcast_data=False, query_id="url", data_id="url",
    )
    t0 = time.time()
    # order-free content digest: pins identical OUTPUT (not just the
    # row count) across widths — the north rule's correctness half
    row = out.select(
        F.count("*").alias("n"),
        F.sum(
            F.pmod(
                F.xxhash64("query_id", "n_samples", "w_sum", "wv_sum"),
                F.lit(1 << 31).cast("long"),
            )
        ).alias("digest"),
    ).first()
    t = time.time() - t0
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_pages": n_pages,
                "idw_sec": round(t, 2),
                "rows": row["n"],
                "digest": int(row["digest"]),
                "rows_per_sec": int(row["n"] / t),
            }
        )
    )


if __name__ == "__main__":
    main()
