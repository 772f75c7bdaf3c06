"""Streaming-layer tests: journal-resume idempotence (the reference's
core incremental contract) and Structured Streaming window semantics."""

from __future__ import annotations

import json
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from tlmc_etl_spark.streaming.journal import load_journal, pending_work, run_incremental
from tlmc_etl_spark.streaming.windows import (
    read_event_stream,
    run_available_now,
    windowed_type_counts,
)


@pytest.fixture()
def worklist(spark, sf_dir):
    from tlmc_etl_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    return ev.select(F.col("event_id").cast("string").alias("item_id"), "value")


def _process(df):
    return df.withColumn("out_value", F.round(F.col("value") * 2, 4))


class TestJournalResume:
    def test_rerun_is_idempotent(self, spark, worklist, tmp_path):
        out, jr = str(tmp_path / "out"), str(tmp_path / "journal")
        n1 = run_incremental(spark, worklist, _process, out, jr)
        assert n1 == worklist.count()
        n2 = run_incremental(spark, worklist, _process, out, jr)
        assert n2 == 0
        # exactly one output row per item despite two runs
        got = spark.read.parquet(out)
        assert got.count() == n1
        assert got.select("item_id").distinct().count() == n1

    def test_resume_processes_only_remainder(self, spark, worklist, tmp_path):
        out, jr = str(tmp_path / "out"), str(tmp_path / "journal")
        half = worklist.filter(F.col("item_id").cast("long") % 2 == 0)
        n1 = run_incremental(spark, half, _process, out, jr)
        n2 = run_incremental(spark, worklist, _process, out, jr)
        assert n1 + n2 == worklist.count()
        # the second run touched only the odd half
        assert n2 == worklist.count() - half.count()

    def test_pending_is_anti_join(self, spark, worklist, tmp_path):
        jr = str(tmp_path / "journal")
        worklist.limit(100).select("item_id").write.parquet(jr)
        pend = pending_work(worklist, load_journal(spark, jr))
        assert pend.count() == worklist.count() - 100


class TestStructuredStreaming:
    def _write_chunk(self, rows, path, name):
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, name), "w") as f:
            for r in rows:
                f.write(
                    json.dumps(
                        {
                            "event_id": r[0],
                            "ts": r[1].isoformat(sep=" "),
                            "user_id": r[2],
                            "event_type": r[3],
                            "value": r[4],
                        }
                    )
                    + "\n"
                )

    def test_windowed_counts_match_batch_and_resume(self, spark, sf_dir, tmp_path):
        con = duckdb.connect()
        rows = con.execute(
            f"SELECT event_id, ts, user_id, event_type, value FROM '{sf_dir}/events.parquet' ORDER BY ts"
        ).fetchall()
        cut = len(rows) // 2
        in_dir = str(tmp_path / "in")
        out_dir = str(tmp_path / "out")
        cp = str(tmp_path / "cp")

        # run 1: first half of the stream
        self._write_chunk(rows[:cut], in_dir, "chunk0.jsonl")
        agg = windowed_type_counts(read_event_stream(spark, in_dir), "1 hour", "30 minutes")
        run_available_now(agg, out_dir, cp)
        first = spark.read.parquet(out_dir).collect()
        assert len(first) > 0

        # run 2: rest arrives; AvailableNow drains only the delta
        self._write_chunk(rows[cut:], in_dir, "chunk1.jsonl")
        agg2 = windowed_type_counts(read_event_stream(spark, in_dir), "1 hour", "30 minutes")
        run_available_now(agg2, out_dir, cp)
        got = spark.read.parquet(out_dir)

        # no duplicate windows across the two incremental runs
        assert (
            got.groupBy("window_start", "event_type").count().filter("count > 1").count() == 0
        )

        # every emitted (finalized) window must equal the batch computation
        batch = (
            spark.createDataFrame(
                [(r[0], r[1], r[2], r[3], r[4]) for r in rows],
                "event_id long, ts timestamp, user_id long, event_type string, value double",
            )
            .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_batch"))
            .select(F.col("win.start").alias("window_start"), "event_type", "n_batch")
        )
        joined = got.join(batch, ["window_start", "event_type"], "left")
        mismatched = joined.filter(
            F.col("n_batch").isNull() | (F.col("n_events") != F.col("n_batch"))
        )
        assert mismatched.count() == 0


class TestStatefulOperator:
    """applyInPandasWithState: keyed state must accumulate across
    micro-batches and survive a query restart (checkpoint-backed), ending
    equal to the batch groupBy over the full input."""

    def _write_chunk(self, rows, path, name):
        TestStructuredStreaming._write_chunk(self, rows, path, name)

    def test_state_survives_restart_and_matches_batch(self, spark, sf_dir, tmp_path):
        from tlmc_etl_spark.streaming.stateful import track_progress_state

        con = duckdb.connect()
        rows = con.execute(
            f"SELECT event_id, ts, user_id, event_type, value FROM '{sf_dir}/events.parquet' ORDER BY ts"
        ).fetchall()
        cut = len(rows) // 2
        in_dir, out_dir, cp = (str(tmp_path / d) for d in ("in", "out", "cp"))

        for i, chunk in enumerate((rows[:cut], rows[cut:])):
            self._write_chunk(chunk, in_dir, f"chunk{i}.jsonl")
            stream = track_progress_state(read_event_stream(spark, in_dir))
            (
                stream.writeStream.format("parquet")
                .outputMode("append")
                .option("path", out_dir)
                .option("checkpointLocation", cp)
                .trigger(availableNow=True)
                .start()
                .awaitTermination()
            )

        from pyspark.sql import Window

        got = spark.read.parquet(out_dir)
        # last emitted row per user = final state; must equal batch totals
        latest = (
            got.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
                ),
            )
            .filter("rn = 1")
            .select("user_id", "n_events", "total_value", "status")
        )
        batch = (
            spark.createDataFrame(
                [(r[2], r[4]) for r in rows], "user_id long, value double"
            )
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_batch"), F.round(F.sum("value"), 4).alias("v_batch"))
        )
        j = latest.join(batch, "user_id", "full")
        bad = j.filter(
            F.col("n_events").isNull()
            | F.col("n_batch").isNull()
            | (F.col("n_events") != F.col("n_batch"))
            | (F.abs(F.col("total_value") - F.col("v_batch")) > 1e-6)
        )
        assert bad.count() == 0
        # status law: DONE iff n_events >= 50
        assert latest.filter((F.col("n_events") >= 50) & (F.col("status") != "DONE")).count() == 0
        assert latest.filter((F.col("n_events") < 50) & (F.col("status") != "PENDING")).count() == 0


class TestBackpressure:
    def test_max_files_per_trigger_bounds_batches(self, spark, tmp_path):
        import json as _json

        from tlmc_etl_spark.streaming.windows import read_event_stream

        src = tmp_path / "in"
        src.mkdir()
        for i in range(6):
            with open(src / f"part-{i}.json", "w") as f:
                f.write(
                    _json.dumps(
                        {
                            "event_id": i,
                            "ts": "2026-01-01T00:00:00",
                            "user_id": 1,
                            "event_type": "view",
                            "value": 1.0,
                        }
                    )
                    + "\n"
                )
        batches = []
        stream = read_event_stream(spark, str(src), max_files_per_trigger=2)
        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(lambda df, _id: batches.append(df.count()))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # 6 files at 2 files/trigger -> 3 micro-batches of 2 rows each
        assert batches == [2, 2, 2]

    def test_rate_source_schema(self, spark):
        from tlmc_etl_spark.streaming.windows import throttled_rate_source

        df = throttled_rate_source(spark, rows_per_second=10)
        assert df.isStreaming
        assert set(df.columns) == {"timestamp", "value"}


class TestStreamingDedup:
    """dropDuplicatesWithinWatermark: at-least-once input collapses to one
    row per key inside the lateness horizon, with state that ages out —
    the streaming face of doc_exact_dedup."""

    def _write_chunk(self, rows, path, name):
        TestStructuredStreaming._write_chunk(self, rows, path, name)

    def test_replayed_rows_collapse_to_one_per_key(self, spark, sf_dir, tmp_path):
        from tlmc_etl_spark.streaming.windows import streaming_dedup

        con = duckdb.connect()
        rows = con.execute(
            f"SELECT event_id, ts, user_id, event_type, value FROM '{sf_dir}/events.parquet' "
            "ORDER BY ts LIMIT 2000"
        ).fetchall()
        in_dir = str(tmp_path / "in")
        out_dir = str(tmp_path / "out")
        cp = str(tmp_path / "cp")

        # at-least-once delivery: the first chunk is delivered twice and
        # 500 of its rows a third time, all within the watermark horizon
        self._write_chunk(rows, in_dir, "chunk0.jsonl")
        self._write_chunk(rows, in_dir, "chunk0_replay.jsonl")
        self._write_chunk(rows[:500], in_dir, "chunk0_partial_retry.jsonl")

        deduped = streaming_dedup(
            read_event_stream(spark, in_dir), ["event_id"], ts_col="ts", late="2 hours"
        )
        run_available_now(deduped, out_dir, cp)
        got = spark.read.parquet(out_dir)
        assert got.count() == len(rows), "each key must survive exactly once"
        assert got.select("event_id").distinct().count() == len(rows)

    def test_incremental_drain_does_not_reemit_seen_keys(self, spark, sf_dir, tmp_path):
        from tlmc_etl_spark.streaming.windows import streaming_dedup

        con = duckdb.connect()
        rows = con.execute(
            f"SELECT event_id, ts, user_id, event_type, value FROM '{sf_dir}/events.parquet' "
            "ORDER BY ts LIMIT 1000"
        ).fetchall()
        in_dir = str(tmp_path / "in")
        out_dir = str(tmp_path / "out")
        cp = str(tmp_path / "cp")

        self._write_chunk(rows, in_dir, "chunk0.jsonl")
        dd = streaming_dedup(
            read_event_stream(spark, in_dir), ["event_id"], ts_col="ts", late="2 hours"
        )
        run_available_now(dd, out_dir, cp)
        n1 = spark.read.parquet(out_dir).count()

        # the same keys arrive again in a later drain: checkpointed dedup
        # state must swallow them (bounded by the watermark, which hasn't
        # passed within this 1000-row slice)
        self._write_chunk(rows, in_dir, "chunk1_replay.jsonl")
        dd2 = streaming_dedup(
            read_event_stream(spark, in_dir), ["event_id"], ts_col="ts", late="2 hours"
        )
        run_available_now(dd2, out_dir, cp)
        got = spark.read.parquet(out_dir)
        assert n1 == len(rows)
        assert got.count() == len(rows), "replayed keys must not re-emit"


class TestJournalTailSource:
    """Custom streaming source: exactly-once delivery of journal appends
    across separate runs sharing a checkpoint (parquet sink — the memory
    sink cannot recover from a checkpoint)."""

    def _run_once(self, spark, path, ckpt, out):
        from tlmc_etl_spark.streaming.source import register_journal_tail_source

        register_journal_tail_source(spark)
        q = (
            spark.readStream.format("journal_tail")
            .option("path", str(path))
            .load()
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = [r["line"] for r in spark.read.parquet(str(out)).collect()]
        assert len(rows) == len(set(rows)), f"duplicate delivery: {sorted(rows)}"
        return set(rows)

    def test_appends_delivered_exactly_once_across_restarts(self, spark, tmp_path):
        journal = tmp_path / "journal.jsonl"
        ckpt, out = tmp_path / "ckpt", tmp_path / "out"
        journal.write_text('{"id": 1}\n{"id": 2}\n')
        got1 = self._run_once(spark, journal, ckpt, out)
        assert got1 == {'{"id": 1}', '{"id": 2}'}

        # append two more lines plus a PARTIAL line (no newline): the
        # restarted query must add only the two complete new lines
        with open(journal, "a") as fh:
            fh.write('{"id": 3}\n{"id": 4}\n{"id": 5')
        got2 = self._run_once(spark, journal, ckpt, out)
        assert got2 - got1 == {'{"id": 3}', '{"id": 4}'}

        # completing the partial line delivers it (and nothing else again)
        with open(journal, "a") as fh:
            fh.write("}\n")
        got3 = self._run_once(spark, journal, ckpt, out)
        assert got3 - got2 == {'{"id": 5}'}

    def test_offsets_are_byte_positions_of_lines(self, spark, tmp_path):
        from tlmc_etl_spark.streaming.source import register_journal_tail_source

        journal = tmp_path / "j2.jsonl"
        journal.write_text("aa\nbbbb\n")
        register_journal_tail_source(spark)
        q = (
            spark.readStream.format("journal_tail")
            .option("path", str(journal))
            .load()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out2"))
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = {
            r["line"]: r["pos"]
            for r in spark.read.parquet(str(tmp_path / "out2")).collect()
        }
        assert rows == {"aa": 0, "bbbb": 3}

    def test_max_bytes_per_batch_bounds_the_drain(self, spark, tmp_path):
        """Backpressure gate (SURVEY §2.9 bounded work queue): a backlog
        far larger than max_bytes_per_batch drains as MANY micro-batches,
        each advancing at most the bound (line-aligned), with exactly-once
        delivery intact across them."""
        from tlmc_etl_spark.streaming.source import _JournalTailReader

        journal = tmp_path / "big.jsonl"
        lines = [f'{{"id": {i:04d}}}' for i in range(200)]  # 13 bytes w/ newline
        journal.write_text("".join(ln + "\n" for ln in lines))

        # drive the reader the way the engine does, recording each
        # micro-batch span — deterministic, no query-scheduling noise
        reader = _JournalTailReader(
            {"path": str(journal), "max_bytes_per_batch": "100"}
        )
        start, seen, spans = reader.initialOffset(), [], []
        while True:
            it, end = reader.read(start)
            batch = list(it)
            if not batch:
                assert end == start
                break
            spans.append(end["pos"] - start["pos"])
            seen.extend(r[0] for r in batch)
            start = end
        assert len(spans) >= 20, spans  # 2800 bytes / 100-byte bound
        assert all(s <= 100 for s in spans), spans
        assert all(s % 13 == 0 for s in spans)  # line-aligned advances
        assert seen == lines  # exactly once, in order

    def test_oversized_line_still_makes_progress(self, spark, tmp_path):
        from tlmc_etl_spark.streaming.source import _JournalTailReader

        journal = tmp_path / "wide.jsonl"
        big = '{"blob": "' + "x" * 500 + '"}'
        journal.write_text(f'{{"id": 1}}\n{big}\n{{"id": 2}}\n')
        reader = _JournalTailReader(
            {"path": str(journal), "max_bytes_per_batch": "64"}
        )
        start, batches = reader.initialOffset(), []
        while True:
            it, end = reader.read(start)
            batch = [r[0] for r in it]
            if not batch:
                break
            batches.append(batch)
            start = end
        # batch 1: the small line; batch 2: the oversized line alone
        # (documented bound exception); batch 3: the trailing line
        assert batches == [['{"id": 1}'], [big], ['{"id": 2}']]

    def test_bounded_query_end_to_end(self, spark, tmp_path):
        """Continuous drain under the bound: a running query works the
        backlog off in many small micro-batches (each numInputRows stays
        under the bound's line capacity) and converges to exactly-once.
        Note: with Trigger.AvailableNow a run consumes ONE bounded batch
        (the Simple-reader wrapper captures the first prefetched offset
        as 'available now'), so the bounded option pairs with a
        continuous trigger or with the journal-resume run loop."""
        import time as _time

        from tlmc_etl_spark.streaming.source import register_journal_tail_source

        journal = tmp_path / "j3.jsonl"
        journal.write_text("".join(f'{{"id": {i}}}\n' for i in range(50)))
        register_journal_tail_source(spark)
        q = (
            spark.readStream.format("journal_tail")
            .option("path", str(journal))
            .option("max_bytes_per_batch", "120")
            .load()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out3"))
            .option("checkpointLocation", str(tmp_path / "ckpt3"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            deadline = _time.time() + 120
            while _time.time() < deadline:
                try:
                    n = spark.read.parquet(str(tmp_path / "out3")).count()
                except Exception:
                    n = 0
                if n >= 50:
                    break
                _time.sleep(0.5)
            got = sorted(
                r["line"]
                for r in spark.read.parquet(str(tmp_path / "out3")).collect()
            )
            assert got == sorted(f'{{"id": {i}}}' for i in range(50))
            rows_per_batch = [
                p["numInputRows"] for p in q.recentProgress if p["numInputRows"]
            ]
            assert len(rows_per_batch) >= 4, rows_per_batch
            assert all(r <= 12 for r in rows_per_batch), rows_per_batch
        finally:
            q.stop()


class TestForeachBatchMerge:
    """journal_tail -> foreachBatch keyed merge: streamed upserts converge
    to the same state a batch merge of the full journal would produce."""

    def test_streamed_upserts_converge_to_batch_state(self, spark, tmp_path):
        from tlmc_etl_spark.streaming.foreach_merge import start_journal_merge_stream

        journal = tmp_path / "merge_journal.jsonl"
        target = str(tmp_path / "state")
        ckpt = str(tmp_path / "ckpt")
        journal.write_text(
            '{"item_id": "a", "value": 1}\n'
            '{"item_id": "b", "value": 2}\n'
            '{"item_id": "a", "value": 3}\n'  # same-batch dup: last wins
        )
        q = start_journal_merge_stream(spark, str(journal), target, ckpt)
        q.awaitTermination(120)
        state = {r["item_id"]: r["value"] for r in spark.read.parquet(target).collect()}
        assert state == {"a": 3.0, "b": 2.0}

        # second run: update one key, add one — merge, not append
        with open(journal, "a") as fh:
            fh.write('{"item_id": "b", "value": 9}\n{"item_id": "c", "value": 4}\n')
        q = start_journal_merge_stream(spark, str(journal), target, ckpt)
        q.awaitTermination(120)
        state = {r["item_id"]: r["value"] for r in spark.read.parquet(target).collect()}
        assert state == {"a": 3.0, "b": 9.0, "c": 4.0}
        # exactly one row per key survived
        assert spark.read.parquet(target).count() == 3

    def test_swap_crash_recovery_both_sides(self, spark, tmp_path):
        """The publish parks the old snapshot at <target>.old before the
        new one lands; _recover_target must heal BOTH crash positions
        without losing a complete snapshot (the checkpoint has already
        committed — the journal will not replay to rebuild lost state)."""
        import os
        import shutil

        from tlmc_etl_spark.streaming.foreach_merge import _recover_target

        target = str(tmp_path / "state")
        old = target + ".old"
        df = spark.createDataFrame([("a", 1.0)], "item_id string, value double")

        # crash AFTER parking old, BEFORE landing new: only .old exists
        df.write.parquet(target)
        os.rename(target, old)
        _recover_target(target)
        assert os.path.isdir(target) and not os.path.isdir(old)
        assert spark.read.parquet(target).count() == 1

        # crash AFTER landing new, BEFORE cleanup: both exist -> keep new
        df.write.parquet(old.replace(".old", "") + ".tmpold")
        os.rename(target + ".tmpold", old)
        new_df = spark.createDataFrame(
            [("a", 2.0), ("b", 3.0)], "item_id string, value double"
        )
        shutil.rmtree(target)
        new_df.write.parquet(target)
        _recover_target(target)
        assert os.path.isdir(target) and not os.path.isdir(old)
        assert spark.read.parquet(target).count() == 2


class TestStreamStreamJoin:
    """interval_join_streams: two unbounded sides pair online through
    StreamingSymmetricHashJoin; the time bound + watermarks make buffered
    state evictable, and the drained result must equal the batch join."""

    def _write_chunk(self, rows, path, name):
        TestStructuredStreaming._write_chunk(self, rows, path, name)

    def _rows(self, sf_dir):
        con = duckdb.connect()
        return con.execute(
            f"SELECT event_id, ts, user_id, event_type, value FROM "
            f"'{sf_dir}/events.parquet' ORDER BY ts"
        ).fetchall()

    def test_stream_join_matches_batch_join(self, spark, sf_dir, tmp_path):
        from tlmc_etl_spark.streaming.joins import interval_join_streams
        from tlmc_etl_spark.streaming.windows import read_event_stream, run_available_now

        rows = self._rows(sf_dir)
        views = [r for r in rows if r[3] == "view"]
        clicks = [r for r in rows if r[3] == "click"]
        vdir, cdir = str(tmp_path / "views"), str(tmp_path / "clicks")
        self._write_chunk(views, vdir, "v0.jsonl")
        self._write_chunk(clicks, cdir, "c0.jsonl")

        joined = interval_join_streams(
            read_event_stream(spark, vdir),
            read_event_stream(spark, cdir),
            key="user_id",
            within="15 minutes",
        )
        # the physical plan must be the symmetric hash join with event-time
        # watermarks on BOTH sides — the state-bounded form
        assert joined.isStreaming
        out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
        run_available_now(joined, out, cp)
        got = {
            (r["l_event_id"], r["r_event_id"])
            for r in spark.read.parquet(out).collect()
        }

        batch_v = spark.createDataFrame(
            views, "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        batch_c = spark.createDataFrame(
            clicks, "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        cond = (
            (batch_v.user_id == batch_c.user_id)
            & (batch_c.ts > batch_v.ts)
            & (batch_c.ts <= batch_v.ts + F.expr("INTERVAL 15 minutes"))
        )
        want = {
            (r[0], r[1])
            for r in batch_v.join(batch_c, cond)
            .select(batch_v.event_id, batch_c.event_id)
            .collect()
        }
        assert got == want
        assert len(got) > 0  # the fixture must actually exercise the join

    def test_incremental_drain_emits_only_new_pairs(self, spark, sf_dir, tmp_path):
        from tlmc_etl_spark.streaming.joins import interval_join_streams
        from tlmc_etl_spark.streaming.windows import read_event_stream, run_available_now

        rows = self._rows(sf_dir)
        views = [r for r in rows if r[3] == "view"]
        clicks = [r for r in rows if r[3] == "click"]
        cut = len(clicks) // 2
        vdir, cdir = str(tmp_path / "views"), str(tmp_path / "clicks")
        out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
        self._write_chunk(views, vdir, "v0.jsonl")
        self._write_chunk(clicks[:cut], cdir, "c0.jsonl")

        def drain():
            j = interval_join_streams(
                read_event_stream(spark, vdir),
                read_event_stream(spark, cdir),
                key="user_id",
                within="15 minutes",
            )
            run_available_now(j, out, cp)

        drain()
        n_first = spark.read.parquet(out).count()
        self._write_chunk(clicks[cut:], cdir, "c1.jsonl")
        drain()
        result = spark.read.parquet(out)
        # pairs are emitted exactly once across the two drains
        assert result.groupBy("l_event_id", "r_event_id").count().filter("count > 1").count() == 0
        assert result.count() > n_first  # the second half matched something
