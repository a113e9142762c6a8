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

Usage: python tools/isolate.py SF_DIR TAG/SUFFIX name [name ...]
  TAG/SUFFIX routes plan files to plans/<TAG>/<name>_<SUFFIX>.txt
  (e.g. "r16/before"); a bare SUFFIX with no slash keeps the r15
  directory for backwards compatibility with that round's captures.
  ``artifact_<name>_build`` names time a forced cold rebuild
  (artifacts.rebuild, the bench's methodology) and capture the BUILD
  plan — the write's input query plan, which bench.py never exposes.
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
    tag_suffix = sys.argv[2]
    names = sys.argv[3:]
    tag, _, suffix = tag_suffix.rpartition("/")
    tag = tag or "r15"  # pre-r16 invocations passed a bare suffix
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(plans_dir, exist_ok=True)

    from crypto_price_data_pipeline_spark import artifacts
    from crypto_price_data_pipeline_spark.queries import QUERIES
    from crypto_price_data_pipeline_spark.session import get_spark

    spark = get_spark(
        "isolate", extra_conf={"spark.cleaner.periodicGC.interval": "2min"}
    )
    import gc

    for name in names:
        if name.startswith("artifact_") and name.endswith("_build"):
            _isolate_build(
                spark, sf_dir, name[len("artifact_") : -len("_build")],
                plans_dir, suffix,
            )
            continue
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


def _isolate_build(spark, sf_dir, art, plans_dir, suffix) -> None:
    """Time a forced artifact cold rebuild (bench methodology: rebuild
    is construct + write + read-back) and capture the BUILD-side plan:
    the builder's DataFrame as handed to the parquet write. bench.py
    times these paths but never exposes their plans — this closes the
    r15 verdict's 'no plan captures for the artifact build paths'.
    The capture pass intercepts ``_artifact`` to explain the build
    frame (one extra lazy construct; for bpe_merges the construct IS
    the 8-round driver loop, so the capture pass pays one extra learn
    — timing samples below are clean rebuilds without the spy)."""
    import gc

    from crypto_price_data_pipeline_spark import artifacts

    orig = artifacts._artifact
    captured: dict[str, str] = {}

    def spy(spark_, name_, sf_, build, stats_fn=None):
        if name_ == art and art not in captured:
            buf = io.StringIO()
            with redirect_stdout(buf):
                build().explain("formatted")
            captured[art] = buf.getvalue()
        return orig(spark_, name_, sf_, build, stats_fn)

    artifacts._artifact = spy
    try:
        spark.sparkContext.setJobDescription(f"isolate:artifact_{art}:plan")
        artifacts.rebuild(spark, sf_dir, art)
    finally:
        artifacts._artifact = orig
    with open(
        os.path.join(plans_dir, f"artifact_{art}_build_{suffix}.txt"), "w"
    ) as fh:
        fh.write(captured.get(art, "(no build plan captured)\n"))

    samples = []
    for i in range(3):  # first sample is the warm-up, as in main()
        gc.collect()
        spark.sparkContext.setJobDescription(f"isolate:artifact_{art}:rebuild{i}")
        t0 = time.time()
        artifacts.rebuild(spark, sf_dir, art)
        samples.append(round(time.time() - t0, 3))
    print(
        json.dumps(
            {
                "query": f"artifact_{art}_build",
                "rebuild_first_sec": samples[0],
                "rebuild_min_sec": min(samples[1:]),
                "rebuild_samples": samples,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
