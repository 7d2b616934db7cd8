"""Registry-wide RUNTIME profile: wall-time every key at a real SF.

The bench times 13 headline queries at sf0.1; the other ~430 keys
normally execute only at sf0.001/sf0.01 through the test tiers, so a
key could hide a straggler shape that plan-reading missed (the plan
lint catches Cartesian/BNLJ/row-Python, not a skewed exchange or an
oversized state). This tool executes EVERY registered key at the
given SF (default sf0.1, the driver's bench scale), records per-key
wall seconds, and prints a JSON report sorted slowest-first plus the
same host fields bench.py emits — evidence for choosing the next
round's optimization targets.

Usage: ``python tools/registry_profile.py [sf_dir] > profile.json``
Each key runs ONCE (this is a sweep, not a benchmark — compare
magnitudes and ranks, not third decimals).
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .config("spark.sql.shuffle.partitions", "8")
        # 446 keys in ONE JVM: several operators persist loop
        # invariants; at the default 1 g driver heap the accumulated
        # cache killed the JVM ~270 keys in (r11). Size the heap and
        # drop each key's cache before moving on.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "12g"))
        .appName("registry-profile")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from systematic_review_classification_spark import all_queries

    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for key, fn in all_queries().items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).count()
            times[key] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001 — profile must finish
            errors[key] = str(e).split("\n")[0][:160]
        try:
            spark.catalog.clearCache()
        except Exception:  # noqa: BLE001 — cache state is best-effort
            pass
    try:
        load1, _, load15 = os.getloadavg()
    except OSError:
        load1 = load15 = -1.0
    report = {
        "sf_dir": sf_dir,
        "n_keys": len(times) + len(errors),
        "total_sec": round(sum(times.values()), 1),
        "load1": round(load1, 2),
        "load15": round(load15, 2),
        "slowest": dict(
            sorted(times.items(), key=lambda kv: -kv[1])[:30]
        ),
        "errors": errors,
        "times": dict(sorted(times.items())),
    }
    json.dump(report, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
