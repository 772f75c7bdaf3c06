"""Binary embedding source: `{uuid}.bin` float32 vector files.

The reference stores per-track pooled vectors as raw little-endian
float32 files named by track uuid and loads them with per-file
validation — a non-uuid filename is skipped with a warning, a truncated
file fails its own row (never the batch) via an exact dimension check
(Finalizer/PushToDb/Operations/TrackEmbeddingProcessor.cs:118-168).

Spark shape: `binaryFile` scan (path + content columns, distributed,
predicate-pushes the glob) → one Arrow-batched decode that casts bytes
to float32, so the hot path is a numpy frombuffer per file, not
per-element Python. Invalid rows come back flagged, not dropped — the
caller decides whether to audit or filter them (the reference counts
and reports both kinds)."""

from __future__ import annotations

import uuid as _uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def uuid_of_int(i: int) -> str:
    """Deterministic uuid for an integer id (the synthetic stand-in for
    the catalogue's real track uuids)."""
    return str(_uuid.UUID(int=i))


def read_embedding_bins(spark: SparkSession, dir_path: str, expected_dims: int) -> DataFrame:
    """Scan `{uuid}.bin` files → (track_uuid, track_int, embedding,
    n_floats, valid, reason).

    valid=false rows carry reason 'bad_filename' (stem not a uuid) or
    'wrong_dims' (float count != expected) — the reference's two skip
    classes, surfaced as data instead of console warnings."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(dir_path)
        .select("path", "content")
    )

    def decode(batches):
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                stem = path.rsplit("/", 1)[-1][: -len(".bin")]
                try:
                    u = _uuid.UUID(stem)
                except ValueError:
                    out.append((stem, None, None, 0, False, "bad_filename"))
                    continue
                # uuid ints are 128-bit; only surface the int form when it
                # fits a signed long (the synthetic-uuid case) — a genuine
                # random uuid would overflow the Arrow long conversion and
                # take the whole batch down with it, breaking the
                # "fails its own row, never the batch" contract.
                u_int = u.int if u.int < (1 << 63) else None
                vec = np.frombuffer(content, dtype="<f4")
                if len(vec) != expected_dims:
                    out.append((stem, u_int, None, len(vec), False, "wrong_dims"))
                    continue
                out.append((stem, u_int, vec.tolist(), len(vec), True, None))
            yield pd.DataFrame(
                out,
                columns=["track_uuid", "track_int", "embedding", "n_floats", "valid", "reason"],
            )

    return raw.mapInPandas(
        decode,
        schema=(
            "track_uuid string, track_int long, embedding array<float>, "
            "n_floats int, valid boolean, reason string"
        ),
    )


# ---------------------------------------------------------------------------
# Spark 4 Python DataSource form: `spark.read.format("binvec")`
#
# Same wire format and row contract as read_embedding_bins, but as a
# first-class DataSource V2 implementation: the engine (not a helper
# function) owns schema declaration, driver-side partition planning
# (files bin-packed by count so task sizes stay even), and per-row
# failure isolation inside each partition read. At 100 TB the partition
# planner is the scale lever — a directory of 10M vector files becomes
# 10M/files_per_partition independent tasks, each opening only its own
# slice, with no global list shipped to executors.
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import (  # noqa: E402
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

BINVEC_SCHEMA = (
    "track_uuid string, track_int long, embedding array<float>, "
    "n_floats int, valid boolean, reason string"
)


class _BinvecPartition(InputPartition):
    def __init__(self, files: list[str]):
        self.files = files


class BinvecDataSource(DataSource):
    """`.bin` float32 embedding files as a native Spark source.

    Options: `path` (directory), `dims` (expected float count, default
    64), `files_per_partition` (task granularity, default 256).
    """

    @classmethod
    def name(cls) -> str:
        return "binvec"

    def schema(self) -> str:
        return BINVEC_SCHEMA

    def reader(self, schema):
        return _BinvecReader(self.options)


class _BinvecReader(DataSourceReader):
    def __init__(self, options):
        self.dir_path = options.get("path")
        if not self.dir_path:
            raise ValueError("binvec: .load(path) with a directory is required")
        self.dims = int(options.get("dims", "64"))
        self.per_part = int(options.get("files_per_partition", "256"))

    def partitions(self):
        import glob as _glob
        import json as _json
        import os as _os

        base = self.dir_path.removeprefix("file:")
        # The manifest (written atomically as the writer's commit point)
        # names the live generation; stale .bin files left by a crash
        # between manifest publish and cleanup are thereby invisible.
        # An explicit "files" key is AUTHORITATIVE: a listed file that is
        # missing on disk is an integrity error (silent partial reads
        # must not happen), and an empty committed list means an empty
        # table — never a license to glob up the stale files the
        # manifest exists to hide. Only directories without a
        # file-listing manifest (hand-built fixtures, pre-upgrade
        # writers) fall back to the glob.
        listed = None
        try:
            with open(_os.path.join(base, "manifest.json")) as fh:
                listed = _json.load(fh).get("files")
        except (OSError, ValueError):
            pass
        if listed is not None:
            files = sorted(_os.path.join(base, n) for n in listed)
            missing = [p for p in files if not _os.path.exists(p)]
            if missing:
                raise FileNotFoundError(
                    f"binvec: manifest lists {len(missing)} file(s) absent "
                    f"on disk (first: {missing[0]}); the directory was "
                    "modified outside the writer's commit protocol"
                )
        else:
            files = sorted(_glob.glob(_os.path.join(base, "*.bin")))
        chunks = [
            files[i : i + self.per_part] for i in range(0, len(files), self.per_part)
        ] or [[]]
        return [_BinvecPartition(c) for c in chunks]

    def read(self, partition):
        for path in partition.files:
            stem = path.rsplit("/", 1)[-1][: -len(".bin")]
            try:
                u = _uuid.UUID(stem)
            except ValueError:
                yield (stem, None, None, 0, False, "bad_filename")
                continue
            u_int = u.int if u.int < (1 << 63) else None
            with open(path, "rb") as fh:
                vec = np.frombuffer(fh.read(), dtype="<f4")
            if len(vec) != self.dims:
                yield (stem, u_int, None, len(vec), False, "wrong_dims")
                continue
            yield (stem, u_int, vec.tolist(), len(vec), True, None)


def register_binvec_source(spark: SparkSession) -> None:
    """Register the binvec format on this session (idempotent)."""
    spark.dataSource.register(BinvecDataSource)


class _BinvecCommit(WriterCommitMessage):
    def __init__(self, staging_dir: str, files: list[str]):
        self.staging_dir = staging_dir
        self.files = files


class BinvecWritableDataSource(BinvecDataSource):
    """binvec with the writer half: `df.write.format("binvec")
    .option("path", dir).mode("append"|"overwrite").save()`.

    Each executor task writes its partition's `{uuid}.bin` files into a
    private staging subdir (no driver funnel for the bytes); the
    driver's commit() publishes them with O(n_files) renames FIRST,
    then atomically swaps in a manifest naming the live set (the commit
    point readers resolve files through), and only then deletes stale
    `*.bin` under mode("overwrite") — so no crash window can lose both
    generations, readers never observe a half-written job, and stale
    files can't survive an overwrite. abort() removes every staging
    dir, leaving the previous contents intact: the V2 commit protocol
    carrying the same manifest information sinks/binvec.py returns as a
    DataFrame. Requires `path` on storage shared between executors and
    driver (same assumption the reader makes). Input schema:
    (track_int long, embedding array<float>).
    """

    def writer(self, schema, overwrite: bool):
        return _BinvecWriter(self.options, overwrite)


class _BinvecWriter(DataSourceWriter):
    _STAGING = "_binvec_staging"

    def __init__(self, options, overwrite: bool):
        self.dir_path = options.get("path")
        if not self.dir_path:
            raise ValueError("binvec write: .option('path', dir) required")
        self.overwrite = overwrite

    def write(self, rows):
        import os
        import uuid as _u

        task_dir = os.path.join(self.dir_path, self._STAGING, _u.uuid4().hex)
        os.makedirs(task_dir, exist_ok=True)
        names: list[str] = []
        for row in rows:
            u = uuid_of_int(int(row.track_int))
            arr = np.asarray(row.embedding, dtype="<f4")
            with open(os.path.join(task_dir, f"{u}.bin"), "wb") as fh:
                fh.write(arr.tobytes())
            names.append(f"{u}.bin")
        return _BinvecCommit(task_dir, names)

    def commit(self, messages):
        import glob as _glob
        import json
        import os
        import shutil

        # Publish-first, delete-after: the previous generation stays
        # readable until the new manifest lands. Ordering:
        #   1. os.replace every staged file into place (atomic per file;
        #      colliding names flip whole-file old->new, never half).
        #   2. Atomically publish manifest.json naming the live set —
        #      THE commit point; readers resolve files through it.
        #   3. Only then delete stale .bin files (overwrite mode). A
        #      crash before 2 leaves the old generation fully intact; a
        #      crash after 2 leaves stale files the manifest hides.
        new_files: list[str] = []
        for m in messages:
            if m is None:
                continue
            for name in m.files:
                os.replace(
                    os.path.join(m.staging_dir, name),
                    os.path.join(self.dir_path, name),
                )
                new_files.append(name)
        shutil.rmtree(
            os.path.join(self.dir_path, self._STAGING), ignore_errors=True
        )
        if self.overwrite:
            live = sorted(set(new_files))
        else:  # append: previous generation stays live alongside the new
            live = sorted(
                os.path.basename(p)
                for p in _glob.glob(os.path.join(self.dir_path, "*.bin"))
            )
        manifest_tmp = os.path.join(self.dir_path, "manifest.json.tmp")
        with open(manifest_tmp, "w") as fh:
            json.dump({"n_files": len(live), "dtype": "<f4", "files": live}, fh)
        os.replace(manifest_tmp, os.path.join(self.dir_path, "manifest.json"))
        if self.overwrite:
            keep = set(live)
            for old in _glob.glob(os.path.join(self.dir_path, "*.bin")):
                if os.path.basename(old) not in keep:
                    os.remove(old)

    def abort(self, messages):
        import os
        import shutil

        # drop everything staged (including dirs of failed tasks, whose
        # commit messages never arrived); published files stay untouched
        shutil.rmtree(
            os.path.join(self.dir_path, self._STAGING), ignore_errors=True
        )


def register_binvec_writable(spark: SparkSession) -> None:
    """Register the read+write binvec format (replaces the read-only one)."""
    spark.dataSource.register(BinvecWritableDataSource)
