"""Journal tail as a custom Structured Streaming source.

The reference's incremental stages poll an append-only JSONL journal
between runs (journal.py:48-126: read what's new, process, append).
This module turns that polling loop into a first-class streaming
source: `spark.readStream.format("journal_tail")` tails the file with
byte offsets as the streaming offset, so Structured Streaming's
checkpoint machinery — not hand-rolled state — guarantees each appended
line is delivered exactly once across restarts.

Offset model: {"pos": <byte offset into the file>}. A micro-batch reads
[start.pos, EOF) and advances the offset to the new EOF; recovery
replays [start, end) byte-identically (readBetweenOffsets), which is
what makes the exactly-once contract hold through a crash between
batch and commit. Partial trailing lines (a writer mid-append, no
newline yet) stay un-consumed until their newline lands — the offset
only ever advances past complete lines.

Rows are (line, pos): raw JSONL plus its starting byte offset — schema
interpretation stays downstream (`F.from_json`), matching the tolerant
reader in sources/jsonl.py.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader


class JournalTailDataSource(DataSource):
    """Options: `path` (the JSONL journal file); `max_bytes_per_batch`
    (optional backpressure bound — see _JournalTailReader)."""

    @classmethod
    def name(cls) -> str:
        return "journal_tail"

    def schema(self) -> str:
        return "line string, pos long"

    def simpleStreamReader(self, schema):
        return _JournalTailReader(self.options)


def complete_eof(path: str) -> int:
    """Byte offset just past the last complete (newline-terminated) line.

    Module-level because drain monitors (streaming/incremental.py's
    bounded-batch path) must latch the SAME boundary the reader uses —
    a drain is done exactly when the committed offset reaches this."""
    if not os.path.exists(path):
        return 0
    size = os.path.getsize(path)
    if size == 0:
        return 0
    with open(path, "rb") as fh:
        fh.seek(size - 1)
        if fh.read(1) == b"\n":
            return size
        # scan back to the last newline; a journal line is small, so
        # reading the tail chunk is bounded
        fh.seek(0)
        data = fh.read(size)
        nl = data.rfind(b"\n")
        return nl + 1 if nl >= 0 else 0


class _JournalTailReader(SimpleDataSourceStreamReader):
    """`max_bytes_per_batch` is the backpressure bound (the reference's
    bounded work queue, SURVEY §2.9; Spark's maxOffsetsPerTrigger
    analogue): one micro-batch advances the offset at most that many
    bytes, aligned DOWN to a complete-line boundary, so a large backlog
    drains as a sequence of bounded batches instead of one unbounded one
    — in-flight memory per batch is capped no matter how far behind the
    consumer is. A single line longer than the bound is still delivered
    whole (the offset must make progress or the stream stalls); that one
    batch exceeds the bound and is the documented exception."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("journal_tail: option('path', <jsonl file>) required")
        mb = options.get("max_bytes_per_batch")
        self.max_bytes = int(mb) if mb is not None else None
        if self.max_bytes is not None and self.max_bytes <= 0:
            raise ValueError("journal_tail: max_bytes_per_batch must be > 0")

    def initialOffset(self):
        return {"pos": 0}

    def _read_span(self, start_pos: int, end_pos: int):
        rows = []
        if end_pos <= start_pos or not os.path.exists(self.path):
            return rows
        with open(self.path, "rb") as fh:
            fh.seek(start_pos)
            data = fh.read(end_pos - start_pos)
        pos = start_pos
        for raw in data.split(b"\n")[:-1]:  # last element is b"" or a partial
            rows.append((raw.decode("utf-8", errors="replace"), pos))
            pos += len(raw) + 1
        return rows

    def _complete_eof(self) -> int:
        return complete_eof(self.path)

    def _bounded_end(self, start_pos: int, eof: int) -> int:
        """Largest complete-line boundary within the backpressure bound;
        extends past the bound only when the FIRST pending line alone
        exceeds it (progress guarantee)."""
        if self.max_bytes is None or eof - start_pos <= self.max_bytes:
            return eof
        with open(self.path, "rb") as fh:
            fh.seek(start_pos)
            window = fh.read(self.max_bytes)
            nl = window.rfind(b"\n")
            if nl >= 0:
                return start_pos + nl + 1
            # oversized first line: scan forward to its newline
            while True:
                chunk = fh.read(1 << 16)
                if not chunk:
                    return eof
                nl = chunk.find(b"\n")
                if nl >= 0:
                    return fh.tell() - len(chunk) + nl + 1

    def read(self, start):
        eof = max(self._complete_eof(), start["pos"])
        end = {"pos": self._bounded_end(start["pos"], eof)}
        # MUST be an iterator, not a list: when the journal has nothing
        # new (end == start), Spark's prefetch wrapper validates
        # emptiness with next(it) — a bare list raises TypeError there,
        # crashing every poll of a drained journal.
        return iter(self._read_span(start["pos"], end["pos"])), end

    def readBetweenOffsets(self, start, end):
        return iter(self._read_span(start["pos"], end["pos"]))

    def commit(self, end):
        pass


def register_journal_tail_source(spark) -> None:
    spark.dataSource.register(JournalTailDataSource)
