"""Regression tests for the round-6 ADVICE.md findings.

- dedup_simhash's 16-bit SWAR lanes cap exact behavior at 65 535
  distinct words per document; past the cap the fingerprint would wrap
  silently. The guard must raise loudly instead.
- sink_pyds's two-phase commit must be attempt-safe: staging names
  include the task attempt id, commit renames exactly the winning
  attempt's tmp, abort removes only the aborting attempt's own file.
- mm_media_metadata's fake decode must CONSUME the payload bytes
  (VERDICT r6 task 6): flipping one byte must change the output.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from analyse_the_sky_with_apache_spark_spark.registry import queries
from analyse_the_sky_with_apache_spark_spark.sources.scans import (
    _make_jsonl_sink_source,
)


def _write_documents(tmp_path, texts):
    df = pd.DataFrame(
        {
            "doc_id": list(range(1, len(texts) + 1)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["test"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    df["doc_id"] = df["doc_id"].astype("int64")
    df["n_chars"] = df["n_chars"].astype("int64")
    df.to_parquet(os.path.join(str(tmp_path), "documents.parquet"))


def test_simhash_lane_cap_raises_loudly(spark, tmp_path):
    """A document with >65535 distinct words must fail with the cap
    message, not silently wrap its 16-bit lanes (ADVICE r6 item 4)."""
    big = " ".join(f"w{i}" for i in range(65600))
    _write_documents(tmp_path, ["small doc", big])
    q = queries()["dedup_simhash"]
    with pytest.raises(Exception, match="SWAR lane cap"):
        q(spark, str(tmp_path)).collect()


def test_simhash_under_cap_still_runs(spark, tmp_path):
    """The guard must not reject legitimate documents."""
    _write_documents(
        tmp_path, ["alpha beta gamma", "alpha beta gamma", "unrelated text"]
    )
    q = queries()["dedup_simhash"]
    rows = q(spark, str(tmp_path)).collect()
    # the two identical docs share all 4 bands → hamming 0 pair
    assert [(r.ia, r.ib, r.hamming) for r in rows] == [(1, 2, 0)]


def _writer_classes():
    src_cls = _make_jsonl_sink_source()
    writer = src_cls(options={"path": "unused"}).writer(None, False)
    return type(writer), writer


def test_sink_commit_renames_winning_attempt_only(tmp_path):
    """Two attempts of the same partition stage distinct tmp files; the
    commit of the winner must not touch the loser's file, and abort of
    the loser must remove only its own tmp (ADVICE r6 item 1)."""
    writer_cls, writer = _writer_classes()
    part = os.path.join(str(tmp_path), "part-00000.jsonl")
    tmp_win = f"{part}.attempt-7.tmp"
    tmp_lose = f"{part}.attempt-3.tmp"
    with open(tmp_win, "w") as f:
        f.write('{"winner": true}\n')
    with open(tmp_lose, "w") as f:
        f.write('{"winner": false}\n')

    class Msg:
        def __init__(self, path, tmp):
            self.path, self.tmp, self.n = path, tmp, 1

    writer.commit([Msg(part, tmp_win)])
    assert os.path.exists(part)
    with open(part) as f:
        assert "true" in f.read()
    assert os.path.exists(tmp_lose), "commit touched a sibling attempt"

    writer.abort([Msg(part, tmp_lose), None])
    assert not os.path.exists(tmp_lose)
    assert os.path.exists(part), "abort removed the committed file"
    # aborting an attempt that never staged a file is a no-op
    writer.abort([Msg(part, f"{part}.attempt-9.tmp")])


def test_media_metadata_is_payload_derived():
    """One flipped payload byte must change the decoded metadata —
    proving the kernel reads the binary column's CONTENT, not a
    sibling id column (VERDICT r6 task 6)."""
    from analyse_the_sky_with_apache_spark_spark.pipeline.multimodal import (
        _media_metadata,
    )

    def run(payload: bytes) -> dict:
        pdf = pd.DataFrame({"doc_id": [1], "payload": [payload]})
        out = next(_media_metadata(iter([pdf])))
        return out.iloc[0].to_dict()

    a, b = run(b"fake-jpeg-bytes"), run(b"fake-jpeg-byteX")
    assert a["payload_crc"] != b["payload_crc"]
    assert a["n_bytes"] == b["n_bytes"] == 15
    # same-id, different-bytes must NOT collide on the derived fields
    assert (a["width"], a["height"], a["n_frames"]) != (
        b["width"], b["height"], b["n_frames"],
    )
    # truncation moves the length-structured fields (15 % 3 = 0 image,
    # 10 % 3 = 1 audio)
    c = run(b"fake-jpeg-")
    assert c["n_bytes"] == 10 and c["media_type"] != a["media_type"]
