"""Executable environment probe for ``transformWithStateInPandas``
(VERDICT r5 task 7).

Spark 4's StatefulProcessor API is the successor to
``applyInPandasWithState`` (which this engine implements and
oracle-checks as ``stream_stateful``). Its Python state client speaks to
the JVM state server over protobuf, so the worker dies with ImportError
before ``init`` runs when ``google.protobuf`` is absent — which it is in
this sandbox (see the NOTE at streaming/queries.py:704). Vendoring a
pure-Python protobuf is out of scope: the client imports *generated*
``*_pb2`` modules, so a shim would have to re-implement the protobuf
wire format plus Spark's generated message classes.

This probe makes the block executable instead of a comment: it skips
with the documented reason today, and the moment the driver environment
gains protobuf it RUNS a minimal ValueState counter end-to-end — so the
gap self-retires without anyone remembering to check.
"""

from __future__ import annotations

import importlib.util

import pandas as pd
import pytest

try:  # find_spec raises if the parent package "google" itself is absent
    _HAS_PROTOBUF = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:
    _HAS_PROTOBUF = False


def test_protobuf_absence_is_why_tws_is_skipped():
    """Pin the *reason* for the gap: the state client's import chain
    needs google.protobuf. If this assertion ever flips, the skip below
    flips with it and the real probe runs."""
    if _HAS_PROTOBUF:
        pytest.skip("protobuf present — the end-to-end probe below covers it")
    with pytest.raises(ImportError):
        # the generated pb2 state-client message module
        from pyspark.sql.streaming.proto import StateMessage_pb2  # noqa: F401


@pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithStateInPandas state client needs google.protobuf, "
    "absent in this sandbox (streaming/queries.py:704)",
)
def test_transform_with_state_counter(spark, tmp_path):
    """Minimal StatefulProcessor: per-key running count over a 2-batch
    file replay; final Update-mode row per key must equal the batch
    count — the same single-replay oracle stream_stateful uses."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [StructField("k", LongType()), StructField("n", LongType())]
    )

    class CountProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n", "n BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            total = sum(len(pdf) for pdf in rows)
            prev = self._n.get()
            new = (prev[0] if prev else 0) + total
            self._n.update((new,))
            yield pd.DataFrame({"k": [key[0]], "n": [new]})

        def close(self) -> None:
            pass

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    spark.createDataFrame(
        [(i % 3, i) for i in range(30)], "k BIGINT, v BIGINT"
    ).coalesce(1).write.parquet(str(src_dir / "b0"))
    stream = spark.readStream.schema("k BIGINT, v BIGINT").parquet(
        str(src_dir / "*")
    )
    out = stream.groupBy("k").transformWithStateInPandas(
        statefulProcessor=CountProcessor(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("tws_probe")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        r.k: r.n
        for r in spark.sql(
            "SELECT k, max(n) AS n FROM tws_probe GROUP BY k"
        ).collect()
    }
    assert rows == {0: 10, 1: 10, 2: 10}
