"""Streaming dedup (dropDuplicatesWithinWatermark): duplicates across
micro-batches within the watermark horizon are dropped and the surviving
key-set equals batch dropDuplicates on the same replayed input."""

from __future__ import annotations

import datetime as dt

import pytest

from twitter_followers_patterns_mapreduce_spark.streaming.dedup import dedup_events_stream
from twitter_followers_patterns_mapreduce_spark.streaming.windows import (
    events_file_stream,
    run_available_now,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
SCHEMA = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"


def at(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def dup_rows():
    return [
        # batch 1
        [(1, at(0), 7, "click", 1.0, "{}"), (2, at(5), 7, "click", 2.0, "{}")],
        # batch 2: event 1 replayed 10 min later (inside 2h horizon) + new
        [(1, at(10), 7, "click", 1.0, "{}"), (3, at(12), 8, "view", 3.0, "{}")],
        # batch 3: events 2 and 3 replayed, one new
        [(2, at(20), 7, "click", 2.0, "{}"), (3, at(25), 8, "view", 3.0, "{}"),
         (4, at(30), 9, "purchase", 4.0, "{}")],
    ]


@pytest.fixture(scope="module")
def dup_dir(spark, tmp_path_factory, dup_rows):
    d = tmp_path_factory.mktemp("dup_stream")
    for i, rows in enumerate(dup_rows):
        spark.createDataFrame(rows, schema=SCHEMA).coalesce(1).write.parquet(
            str(d / f"batch_{i}")
        )
    return str(d) + "/batch_*"


def test_stream_dedup_matches_batch(spark, dup_dir, dup_rows):
    stream = events_file_stream(spark, dup_dir)
    run_available_now(dedup_events_stream(stream), "dedup_stream_t", output_mode="append")
    got = spark.sql("SELECT event_id FROM dedup_stream_t").collect()
    ids = sorted(r["event_id"] for r in got)
    assert ids == [1, 2, 3, 4]  # every duplicate dropped, each key once

    flat = [r for b in dup_rows for r in b]
    batch = spark.createDataFrame(flat, schema=SCHEMA).dropDuplicates(["event_id"])
    assert ids == sorted(r["event_id"] for r in batch.select("event_id").collect())


def test_foreach_batch_ingest_dedups_across_batches(spark, tmp_path):
    """Streaming corpus ingestion: batch 2's near-duplicate of a batch-1
    doc is rejected, its genuinely-new doc admitted — cross-batch state
    is the corpus parquet itself."""
    import time

    from twitter_followers_patterns_mapreduce_spark.streaming.dedup import (
        ingest_dedup_foreach_batch,
    )

    base = "the quick brown fox jumps over the lazy dog again and again every day"
    near = base.replace("day", "night")  # high 3-shingle jaccard vs base
    fresh = "completely different content about spark engines and parquet files here"

    in_dir = tmp_path / "incoming"
    in_dir.mkdir()
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id LONG, text STRING"

    # batch 1 lands first
    spark.createDataFrame([(1, base), (2, fresh)], schema=schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(in_dir / "b1"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "*"))
    )
    q = ingest_dedup_foreach_batch(spark, stream, corpus, ckpt)
    q.awaitTermination()

    # batch 2: one near-dup of doc 1, one new doc
    spark.createDataFrame([(3, near), (4, "fully novel text with nothing shared")],
                          schema=schema).coalesce(1).write.mode("overwrite").parquet(
        str(in_dir / "b2")
    )
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "*"))
    )
    q2 = ingest_dedup_foreach_batch(spark, stream2, corpus, ckpt)
    q2.awaitTermination()
    time.sleep(0.2)

    ids = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    assert ids == [1, 2, 4], ids


def _write_doc_file(spark, path, rows, mtime):
    import glob
    import os

    tmp = str(path) + "_stage"
    spark.createDataFrame(rows, schema="doc_id LONG, text STRING").coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
    os.rename(part, str(path))
    os.utime(str(path), (mtime, mtime))
    import shutil

    shutil.rmtree(tmp)


BASE = "the quick brown fox jumps over the lazy dog near the old stone bridge today"
NEAR = BASE.replace("today", "tonight")  # near-dup of BASE
NEAR2 = BASE.replace("today", "tomorrow")  # near-dup of BASE (and of NEAR)
FRESH = "completely different corpus text about spark shuffles joins and parquet files"
FRESH_NEAR = FRESH.replace("files", "footers")  # near-dup of FRESH


def test_versioned_admission_folds_only_kept_docs(spark, tmp_path):
    """The greedy-state semantics the staged oracle unrolls: doc 20
    (near-dup of the corpus) is rejected; doc 30 near-dups BOTH the
    rejected doc 20 and corpus doc 0, and its verdict names doc 0 —
    rejected docs never enter the band index, so 20 can never be a
    near_dup_of target; doc 50 (near-dup of ADMITTED doc 10) is
    rejected with near_dup_of=10; doc 60 (exact dup of admitted doc 10)
    is exact_dup."""
    import time

    from twitter_followers_patterns_mapreduce_spark.streaming.dedup_admit import (
        admit_apply_stream,
        docs_file_stream,
        verdicts_from_state,
    )

    bootstrap = spark.createDataFrame([(0, BASE)], schema="doc_id LONG, text STRING")
    feed = tmp_path / "feed"
    feed.mkdir()
    now = time.time()
    # batch 0: 10 kept (fresh), 20 near-dup of corpus doc 0
    _write_doc_file(spark, feed / "b0.parquet", [(10, FRESH), (20, NEAR)], now)
    # batch 1: 30 near-dups rejected 20 AND corpus 0; 50 near-dups ADMITTED 10
    _write_doc_file(
        spark, feed / "b1.parquet", [(30, NEAR2), (50, FRESH_NEAR)], now + 1
    )
    # batch 2: 60 exact dup of admitted 10
    _write_doc_file(spark, feed / "b2.parquet", [(60, FRESH)], now + 2)

    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    ids = []
    admit_apply_stream(
        spark, docs_file_stream(spark, str(feed)), bootstrap, state, ckpt,
        threshold=0.5, batch_ids=ids,
    )
    assert ids == [0, 1, 2]
    got = {
        r["doc_id"]: (r["status"], r["near_dup_of"])
        for r in verdicts_from_state(spark, state).collect()
    }
    assert got[10] == ("kept", None)
    assert got[20] == ("near_dup", 0)
    # 30 is a near-dup of 20, but 20 was rejected -> 30 judged only vs
    # {0 (corpus), 10 (admitted)}: its jaccard vs 0 ("tomorrow" vs
    # "today") IS above threshold, so it's near_dup of 0 -- while 50,
    # near-dup of admitted 10, is rejected with near_dup_of=10
    assert got[30] == ("near_dup", 0)
    assert got[50] == ("near_dup", 10)
    assert got[60] == ("exact_dup", None)


def test_versioned_admission_within_batch_independence(spark, tmp_path):
    """Docs within ONE micro-batch are judged new-vs-corpus only, never
    new-vs-new (the batch operator's contract): two exact copies
    arriving together are both kept."""
    import time

    from twitter_followers_patterns_mapreduce_spark.streaming.dedup_admit import (
        admit_apply_stream,
        docs_file_stream,
        verdicts_from_state,
    )

    bootstrap = spark.createDataFrame([(0, BASE)], schema="doc_id LONG, text STRING")
    feed = tmp_path / "feed"
    feed.mkdir()
    _write_doc_file(
        spark, feed / "b0.parquet", [(10, FRESH), (12, FRESH)], time.time()
    )
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    admit_apply_stream(
        spark, docs_file_stream(spark, str(feed)), bootstrap, state, ckpt, threshold=0.5
    )
    got = {r["doc_id"]: r["status"] for r in verdicts_from_state(spark, state).collect()}
    assert got == {10: "kept", 12: "kept"}


def test_versioned_admission_restart_resume(spark, tmp_path):
    """Kill-and-restart: drain two batches, stop, stage two more, restart
    on the SAME checkpoint + state — the resumed stream continues from
    batch 2 and the final verdict log equals the one-shot replay."""
    import time

    from twitter_followers_patterns_mapreduce_spark.streaming.dedup_admit import (
        admit_apply_stream,
        docs_file_stream,
        verdicts_from_state,
    )

    bootstrap = spark.createDataFrame([(0, BASE)], schema="doc_id LONG, text STRING")
    rows_by_batch = [
        [(11, FRESH)],
        [(13, NEAR)],          # near-dup of corpus doc 0
        [(15, FRESH_NEAR)],    # near-dup of admitted 11
        [(17, FRESH)],         # exact dup of admitted 11
    ]

    def run(feed_root, state, ckpt, upto):
        feed = tmp_path / feed_root
        feed.mkdir(exist_ok=True)
        now = time.time()
        for b in range(upto):
            p = feed / f"b{b}.parquet"
            if not p.exists():
                _write_doc_file(spark, p, rows_by_batch[b], now + b)
        ids = []
        admit_apply_stream(
            spark, docs_file_stream(spark, str(feed)), bootstrap,
            state, ckpt, threshold=0.5, batch_ids=ids,
        )
        return ids

    state = str(tmp_path / "state_r")
    ckpt = str(tmp_path / "ckpt_r")
    ids1 = run("feed_r", state, ckpt, 2)
    assert ids1 == [0, 1]
    ids2 = run("feed_r", state, ckpt, 4)  # restart: same ckpt + state
    assert ids2 == [2, 3]  # resumed, batches 0/1 NOT re-run

    got = {
        r["doc_id"]: (r["status"], r["near_dup_of"])
        for r in verdicts_from_state(spark, state).collect()
    }
    # one-shot replay on fresh dirs must agree
    state2, ckpt2 = str(tmp_path / "state_o"), str(tmp_path / "ckpt_o")
    run("feed_o", state2, ckpt2, 4)
    got_oneshot = {
        r["doc_id"]: (r["status"], r["near_dup_of"])
        for r in verdicts_from_state(spark, state2).collect()
    }
    assert got == got_oneshot
    assert got[11] == ("kept", None)
    assert got[13] == ("near_dup", 0)
    assert got[15] == ("near_dup", 11)
    assert got[17] == ("exact_dup", None)

    # the one-pass novelty log resumes identically too (16th class):
    from twitter_followers_patterns_mapreduce_spark.streaming.dedup_admit import (
        novelty_from_state,
    )

    nov = {
        r["doc_id"]: (r["status"], r["n_shingles"], r["n_seen"], r["novelty"])
        for r in novelty_from_state(spark, state).collect()
    }
    nov_oneshot = {
        r["doc_id"]: (r["status"], r["n_shingles"], r["n_seen"], r["novelty"])
        for r in novelty_from_state(spark, state2).collect()
    }
    assert nov == nov_oneshot
    assert set(nov) == {11, 13, 15, 17}
    # 11 arrives first against the BASE-only corpus: fully novel
    assert nov[11][1] > 0 and nov[11][2] == 0 and nov[11][3] == 1.0
    # 17 is an exact copy of ADMITTED 11: every shingle already seen
    assert nov[17][0] == "exact_dup" and nov[17][2] == nov[17][1]
    assert nov[17][3] == 0.0
    # 13 near-dups corpus doc 0 ("today"->"tonight"): high but <1 overlap
    assert 0 < nov[13][2] < nov[13][1]


def test_self_union_stream_dedups_to_base(spark, tmp_path):
    """The registered events_dedup_streamed shape: the same dir read by
    two file sources unioned (every event arrives twice) collapses back
    to the singleton base set."""
    rows = [(i, at(i), i % 3, "click", float(i), "{}") for i in range(6)]
    d = tmp_path / "base"
    spark.createDataFrame(rows, schema=SCHEMA).coalesce(1).write.parquet(str(d))
    doubled = events_file_stream(spark, str(d)).unionByName(
        events_file_stream(spark, str(d))
    )
    run_available_now(
        dedup_events_stream(doubled), "dedup_union_t", output_mode="append"
    )
    got = sorted(r["event_id"] for r in spark.table("dedup_union_t").collect())
    assert got == list(range(6))


def test_versioned_admission_covers_unshingleable_docs(spark, tmp_path):
    """Docs too short to shingle (< 3 tokens) must still get verdict
    rows, and their md5 must enter the corpus exact-dup state once
    admitted (round-10 advice: the former inner signature join silently
    dropped them from both the verdict log and the corpus, so an exact
    copy arriving later would have been 'kept').  They can never be
    NEAR-dup candidates — no shingles, no band rows."""
    import time

    from twitter_followers_patterns_mapreduce_spark.streaming.dedup_admit import (
        admit_apply_stream,
        docs_file_stream,
        verdicts_from_state,
    )

    bootstrap = spark.createDataFrame([(0, BASE)], schema="doc_id LONG, text STRING")
    feed = tmp_path / "feed"
    feed.mkdir()
    now = time.time()
    # batch 0: a 2-token doc (unshingleable) + a normal fresh doc
    _write_doc_file(spark, feed / "b0.parquet", [(10, "tiny doc"), (11, FRESH)], now)
    # batch 1: exact copy of the admitted short doc + a DIFFERENT short doc
    _write_doc_file(
        spark, feed / "b1.parquet", [(12, "tiny doc"), (13, "ok")], now + 1
    )
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    admit_apply_stream(
        spark, docs_file_stream(spark, str(feed)), bootstrap, state, ckpt,
        threshold=0.5,
    )
    got = {
        r["doc_id"]: (r["status"], r["near_dup_of"])
        for r in verdicts_from_state(spark, state).collect()
    }
    assert set(got) == {10, 11, 12, 13}, got  # a verdict for EVERY arrival
    assert got[10] == ("kept", None)
    assert got[11] == ("kept", None)
    assert got[12] == ("exact_dup", None)  # short docs still exact-dup by md5
    assert got[13] == ("kept", None)
