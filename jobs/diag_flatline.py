"""Diagnose the 2->8 wall-clock flatline (round 5).

Runs the scaling cell's exact build (sf-mid16, 50k docs, 8m splits) at
local[<cores>] while sampling MACHINE-WIDE busy-core count from /proc/stat
every 2 s. If a local[2] build keeps >>2 cores busy, parallelism is leaking
past the task slots (Arrow/JVM internal pools) and the wall-clock pair
never emulated a 2-core-vs-8-core cluster; if it holds ~2, the flatline
lives in a specific stage (read the [build_index] stage lines).

Usage: python jobs/diag_flatline.py <cores>
"""

import json
import shutil
import sys
import threading
import time

sys.path.insert(0, "/root/repo")


def _busy_jiffies() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    idle = vals[3] + vals[4]  # idle + iowait
    return sum(vals), idle


def main() -> None:
    cores = int(sys.argv[1])
    samples: list[float] = []
    stop = threading.Event()

    def sampler() -> None:
        t, i = _busy_jiffies()
        while not stop.wait(2.0):
            t2, i2 = _busy_jiffies()
            dt, di = t2 - t, i2 - i
            if dt > 0:
                # busy cores = busy fraction * 32 vCPUs
                samples.append((1.0 - di / dt) * 32.0)
            t, i = t2, i2

    from pyspark.sql import SparkSession

    from pageindex_spark import build_index

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.driver.memory", "16g")
        .appName(f"diag{cores}")
        .getOrCreate()
    )
    docs = spark.read.parquet("/root/repo/data/sf-mid16/documents.parquet").select(
        "url", "text"
    )

    def _gc_ms() -> int:
        beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))

    out = f"/root/repo/data/diag_index_{cores}"
    shutil.rmtree(out, ignore_errors=True)
    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    gc0 = _gc_ms()
    t0 = time.time()
    build_index(
        spark,
        docs,
        out,
        num_partitions=max(cores, 8),
        n_buckets=16,
        n_seg_chunks=1,
        n_bucket_chunks=1,
    )
    wall = time.time() - t0
    gc_ms = _gc_ms() - gc0
    stop.set()
    th.join(timeout=3)
    print(
        json.dumps(
            {
                "cores": cores,
                "wall_sec": round(wall, 2),
                "jvm_gc_ms": gc_ms,
                "busy_cores_mean": round(sum(samples) / max(1, len(samples)), 2),
                "busy_cores_max": round(max(samples), 2) if samples else 0.0,
                "busy_cores_samples": [round(s, 1) for s in samples],
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
