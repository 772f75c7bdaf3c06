"""Materialize the deterministic synthetic manifest/probe fixtures to
parquet (fixtures/metadata/), so the `metadata_catalog_release` DuckDB
oracle and the Spark query read byte-identical inputs.

Run once and commit the output — the generator is seeded, so re-running
reproduces the same files. Uses pyarrow directly (no Spark session).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from tlmc_etl_spark.sources.synthetic import generate  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "fixtures", "metadata"
)


def main() -> None:
    manifest, probe = generate(seed=42, n_albums=24)
    os.makedirs(OUT_DIR, exist_ok=True)

    m_tbl = pa.table(
        {
            "path": [r[0] for r in manifest],
            "circle_dir": [r[1] for r in manifest],
            "album_dir": [r[2] for r in manifest],
            "rel_dir": [r[3] for r in manifest],
            "filename": [r[4] for r in manifest],
            "ext": [r[5] for r in manifest],
            "size_bytes": pa.array([r[6] for r in manifest], pa.int64()),
            "mtime_s": pa.array([r[7] for r in manifest], pa.int64()),
        }
    )
    tag_fields = ["track", "artist", "title", "album", "album_artist", "date", "event"]
    tags = pa.array(
        [dict(zip(tag_fields, r[2])) for r in probe],
        pa.struct([(f, pa.string()) for f in tag_fields]),
    )
    p_tbl = pa.table(
        {
            "path": [r[0] for r in probe],
            "duration_s": pa.array([r[1] for r in probe], pa.float64()),
            "tags": tags,
            "has_cuesheet": pa.array([r[3] for r in probe], pa.bool_()),
        }
    )
    pq.write_table(m_tbl, os.path.join(OUT_DIR, "manifest.parquet"))
    pq.write_table(p_tbl, os.path.join(OUT_DIR, "probe.parquet"))
    print(f"wrote {len(manifest)} manifest rows, {len(probe)} probe rows -> {OUT_DIR}")


if __name__ == "__main__":
    main()
