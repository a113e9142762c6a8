"""session.materialize: the engine-wide eager-materialization helper.

Default (no checkpoint dir): localCheckpoint — fastest, non-reliable
blocks. With sc.setCheckpointDir (cluster practice): RELIABLE
checkpoint, so pinned intermediates survive executor loss instead of
silently truncating recomputable lineage (the round-8 advice item)."""

from __future__ import annotations

import os


def _unset_checkpoint_dir(spark):
    # SparkContext has no public unset; clear the Scala Option directly
    # so the shared test session doesn't leak reliable-checkpoint mode
    # (and its I/O) into every later materialize call in the suite.
    jsc = spark.sparkContext._jsc.sc()
    empty = getattr(spark._jvm.scala.Option, "empty")()
    getattr(jsc, "checkpointDir_$eq")(empty)


def test_materialize_local_by_default(spark):
    from crypto_price_data_pipeline_spark.session import materialize

    assert spark.sparkContext.getCheckpointDir() is None
    out = spark.range(10).transform(materialize)
    assert out.count() == 10


def test_materialize_reliable_when_dir_configured(spark, tmp_path):
    from crypto_price_data_pipeline_spark.session import materialize

    ckpt = str(tmp_path / "ckpt")
    spark.sparkContext.setCheckpointDir(ckpt)
    try:
        out = spark.range(7).transform(materialize)
        assert out.count() == 7
        # reliable checkpointing writes RDD data under the configured dir
        written = [
            os.path.join(root, f)
            for root, _, files in os.walk(ckpt)
            for f in files
        ]
        assert written, "no reliable checkpoint files written"
    finally:
        _unset_checkpoint_dir(spark)
    assert spark.sparkContext.getCheckpointDir() is None
