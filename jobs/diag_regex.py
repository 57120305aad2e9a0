"""Does the JVM regex tokenize itself scale with cores? (round-5 flatline hunt)

Times sum(size(terms)) over sf-mid16 — pure scan + codegen regex, no
shuffle, no Python, no write — at local[<cores>], after the standard
warm-up. Prints wall + busy-core samples.
"""

import json
import sys
import threading
import time

sys.path.insert(0, "/root/repo")


def _busy() -> tuple[int, int]:
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return sum(v), v[3] + v[4]


def main() -> None:
    cores = int(sys.argv[1])
    from pyspark.sql import functions as F

    from pageindex_spark.functions.sqlglue import spark_terms
    from pageindex_spark.session import get_spark, warm_up

    spark = get_spark(app_name=f"rgx{cores}", cores=cores)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    warm_up(spark)
    docs = spark.read.parquet("/root/repo/data/sf-mid16/documents.parquet").select("text")
    # one untimed pass so parquet decode + codegen for THIS plan are warm too
    docs.limit(2000).select(F.sum(F.size(F.expr(spark_terms("text"))))).collect()

    samples = []
    stop = threading.Event()

    def sampler() -> None:
        t, i = _busy()
        while not stop.wait(1.0):
            t2, i2 = _busy()
            if t2 > t:
                samples.append(round((1 - (i2 - i) / (t2 - t)) * 32, 1))
            t, i = t2, i2

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    walls = []
    for _ in range(2):
        t0 = time.time()
        n = docs.select(F.sum(F.size(F.expr(spark_terms("text")))).alias("s")).collect()[0]["s"]
        walls.append(round(time.time() - t0, 2))
    stop.set()
    print(
        json.dumps(
            {
                "cores": cores,
                "walls": walls,
                "total_terms": n,
                "busy_samples": samples,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
