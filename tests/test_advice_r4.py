"""Regression tests for the round-4 ADVICE.md findings.

Each test builds the exact input the fixture never exercises:
- documents with <3 tokens (ANSI descending-sequence hazard in
  corpus_ngram_novelty);
- documents longer than the oracle's 999-position enumeration cap
  (uncapped-Spark/capped-oracle asymmetry in corpus_ngram_novelty and
  the _dup_spans kernel);
- a txn-log add-action whose recorded stats are [null, null] (empty
  compacted half) in scan_txn_log_pruned.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from analyse_the_sky_with_apache_spark_spark.registry import oracle_sql, queries
from tools.canon import compare_spark_duck


def _write_documents(tmp_path, texts):
    """Write a documents.parquet shaped like the driver fixture."""
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
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    return con


# a >1022-char body so gram/shingle positions past the oracle's
# range(1, 1000) cap exist; shared verbatim by two docs so _dup_spans
# has duplicated grams on both sides of the cap boundary.
_LONG = " ".join(f"tok{i % 7}word{i}" for i in range(120))  # ~1300 chars


def test_ngram_novelty_short_and_long_docs(spark, tmp_path):
    """<3-token docs must not crash (ANSI sequence hazard) and must be
    absent from the output on BOTH sides; >1022-char docs must agree
    with the oracle's capped position enumeration."""
    con = _write_documents(
        tmp_path,
        ["one", "two words", "exactly three tokens", _LONG, _LONG + " tail"],
    )
    df = queries()["corpus_ngram_novelty"](spark, str(tmp_path))
    compare_spark_duck(df, con.execute(oracle_sql()["corpus_ngram_novelty"]))
    ids = {r["doc_id"] for r in df.collect()}
    assert ids == {3, 4, 5}, f"<3-token docs must drop out, got {ids}"


def test_dup_spans_beyond_oracle_position_cap(spark, tmp_path):
    """Docs longer than 999 + K - 1 chars: the Spark kernel must cap
    gram positions at 999 exactly like the shared _SPAN_CTE oracle."""
    con = _write_documents(tmp_path, [_LONG, _LONG + " extra tail", "short doc"])
    for key in ("dedup_substring_spans", "dedup_substring_cut"):
        df = queries()[key](spark, str(tmp_path))
        compare_spark_duck(df, con.execute(oracle_sql()[key]))


def test_set_similarity_beyond_oracle_position_cap(spark, tmp_path):
    """>501-token docs: the Spark shingle build must cap positions at
    499 exactly like the oracle's range(1, 500) — a near-dup pair whose
    divergent tail sits past the cap must still be reported identically
    on both sides."""
    base = " ".join(f"w{i % 11}x{i}" for i in range(520))  # 520 tokens
    con = _write_documents(
        tmp_path,
        [base, base + " " + " ".join(f"tail{i}" for i in range(30)), "tiny doc"],
    )
    df = queries()["join_set_similarity"](spark, str(tmp_path))
    compare_spark_duck(df, con.execute(oracle_sql()["join_set_similarity"]))
    pairs = {(r["a"], r["b"]) for r in df.collect()}
    assert (1, 2) in pairs, f"capped shingle sets must still match: {pairs}"


def test_txn_log_pruned_tolerates_null_stats(spark, tmp_path, monkeypatch):
    """An add-action with [null, null] key stats (empty compacted half)
    must be kept conservatively, not raise TypeError(None <= int)."""
    import analyse_the_sky_with_apache_spark_spark.sources.scans as scans

    lo = os.path.join(str(tmp_path), "lo.parquet")
    hi = os.path.join(str(tmp_path), "hi.parquet")
    pd.DataFrame(
        {
            "o_orderkey": pd.array([5, 999], dtype="int64"),
            "o_orderstatus": ["O", "F"],
            "o_totalprice": [10.0, 20.0],
        }
    ).to_parquet(lo)
    pd.DataFrame(
        {
            "o_orderkey": pd.array([2000], dtype="int64"),
            "o_orderstatus": ["O"],
            "o_totalprice": [30.0],
        }
    ).to_parquet(hi)
    monkeypatch.setattr(scans, "_txn_log_build", lambda s, d: "ignored")
    monkeypatch.setattr(
        scans,
        "_txn_active",
        lambda root, version: [
            {"path": lo, "stats": {"o_orderkey": [None, None]}},
            {"path": hi, "stats": {"o_orderkey": [2000, 2000]}},
        ],
    )
    rows = scans.scan_txn_log_pruned.__wrapped__(spark, str(tmp_path)).collect() \
        if hasattr(scans.scan_txn_log_pruned, "__wrapped__") \
        else scans.scan_txn_log_pruned(spark, str(tmp_path)).collect()
    keys = sorted(r["o_orderkey"] for r in rows)
    assert keys == [5, 999], f"null-stats file must be kept and re-filtered: {keys}"
