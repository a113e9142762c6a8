"""Per-query isolation harness for the optimization rounds (guide §1).

For each named registry query:
  - builds the DataFrame (construction time includes any artifact
    access / bounded driver collects the query performs),
  - captures ``.explain("formatted")`` to plans/<tag>/<name>_<suffix>.txt,
  - times materialization through the **noop sink**
    (``df.write.format("noop")``) so every column of every row is
    computed and the measurement excludes sink cost (guide §1.4) —
    NOTE this is deliberately *stricter* than bench.py's ``.count()``
    (count lets Catalyst prune columns), so isolate numbers are
    comparable only to other isolate numbers,
  - reports construct / first (warm-up) / min-of-2 steady-state
    seconds as one JSON line per query.

Usage: python tools/isolate.py SF_DIR SUFFIX query [query ...]
  SUFFIX names the plan files (e.g. "before" / "after").
Env: SPARK_GRAFT_CPUS respected like bench.py.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r15",
    )
    os.makedirs(plans_dir, exist_ok=True)

    from crypto_price_data_pipeline_spark.queries import QUERIES
    from crypto_price_data_pipeline_spark.session import get_spark

    spark = get_spark(
        "isolate", extra_conf={"spark.cleaner.periodicGC.interval": "2min"}
    )
    import gc

    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"isolate:{name}:construct")
        t0 = time.time()
        df = fn(spark, sf_dir)
        t_construct = time.time() - t0

        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(buf.getvalue())

        samples = []
        for i in range(3):  # first sample is the JIT/footer warm-up
            gc.collect()
            spark.sparkContext.setJobDescription(f"isolate:{name}:pass{i}")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        print(
            json.dumps(
                {
                    "query": name,
                    "construct_sec": round(t_construct, 3),
                    "noop_first_sec": samples[0],
                    "noop_min_sec": min(samples[1:]),
                    "noop_samples": samples,
                }
            ),
            flush=True,
        )
        del df
        gc.collect()
    spark.stop()


if __name__ == "__main__":
    main()
