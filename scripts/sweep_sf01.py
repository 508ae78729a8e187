"""Full-catalog single-pass sweep at sf0.1 (regression check for slow-tail /
OOM; 16g driver needed for g_triangle_count's wedge join)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from surge_spark.session import get_spark  # noqa: E402
from surge_spark.queries import all_queries  # noqa: E402

spark = get_spark("sweep", cpus=32)
times, errors = {}, {}
for name, fn in sorted(all_queries().items()):
    s = time.perf_counter()
    try:
        fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - s, 2)
    except Exception as exc:  # noqa: BLE001
        errors[name] = str(exc).split("\n")[0][:200]
print("TOTAL", round(sum(times.values()), 1), "ERRORS", len(errors))
for k, v in sorted(times.items(), key=lambda kv: -kv[1])[:15]:
    print(f"SLOW {k}: {v}")
for k, v in errors.items():
    print(f"ERR {k}: {v}")
sys.exit(1 if errors else 0)
