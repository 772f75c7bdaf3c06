"""Deterministic synthetic manifest + probe generator (FIXTURES.md §1-2
shapes): canonical and messy filenames, disc-subdir variants, wildcard
dates, missing probes — seeded, so every run sees identical data. Used by
the pipeline tests and the `metadata_catalog_release` catalog query."""

from __future__ import annotations

import random

CIRCLES = ["[Circle Alpha]", "[Circle Beta] べーた", "[Gamma Works]"]
CONVENTIONS = ["C80", "C97", "RTS8"]
TITLES = [
    "Silver Moon",
    "Crimson Night",
    "Emerald Dawn",
    "東方の風",
    "Stardust Memoria",
    "Lunar Gate",
    "Phantom Waltz",
    "Aurora Shift",
]
ARTISTS = ["Alice", "Bob", "Carol", "結月"]


def generate(seed: int = 42, n_albums: int = 12):
    """Returns (manifest_rows, probe_rows) matching
    sources/manifest.MANIFEST_SCHEMA and the probe schema of
    pipelines tests."""
    rng = random.Random(seed)
    manifest, probe = [], []
    for a in range(n_albums):
        circle = CIRCLES[a % len(CIRCLES)]
        conv = CONVENTIONS[a % len(CONVENTIONS)]
        if a % 10 == 7:
            date = ""  # missing date
        elif a % 5 == 0:
            date = f"2011.{(a % 12) + 1:02d}.xx "  # wildcard day
        else:
            date = f"201{a % 10}.{(a % 12) + 1:02d}.{(a % 27) + 1:02d} "
        album = f"{date}[ABC-{100 + a}] Album {a} [{conv}]".strip()
        n_discs = 2 if a % 4 == 0 else 1
        for d in range(1, n_discs + 1):
            if n_discs == 1:
                rel_dir = None
            else:
                rel_dir = ["Disc 1", "CD2", "Disc 3"][d - 1] if d <= 3 else f"Disc {d}"
            n_tracks = 4 + (a + d) % 3
            for t in range(1, n_tracks + 1):
                artist = ARTISTS[(a + t) % len(ARTISTS)]
                title = TITLES[(a * 3 + t) % len(TITLES)]
                style = rng.random()
                if style < 0.7:
                    fname = f"({t:02d}) [{artist}] {title}.flac"
                elif style < 0.85:
                    fname = f"{d}-{t:02d} {title}.mp3"  # disc-track prefix, no number parse
                else:
                    fname = f"{title}.flac"  # bare title
                sub = f"/{rel_dir}" if rel_dir else ""
                path = f"{circle}/{album}{sub}/{fname}"
                manifest.append(
                    (path, circle, album, rel_dir, fname, fname.rsplit(".", 1)[-1].lower(),
                     rng.randrange(10_000_000, 40_000_000), 1700000000 + a * 1000 + t)
                )
                if rng.random() > 0.05:  # ~5% missing probes
                    tag_no = f"{t}/{n_tracks}" if rng.random() < 0.3 else str(t)
                    probe.append(
                        (
                            path,
                            120.0 + ((a * 7 + t * 13) % 240),
                            (tag_no, artist, title, f"Album {a}", artist, "2011-05-08", conv),
                            False,
                        )
                    )
        # every album also has an asset file and some albums a scans dir
        manifest.append(
            (f"{circle}/{album}/cover.jpg", circle, album, None, "cover.jpg", "jpg", 500_000, 1700000000)
        )
        if a % 3 == 0:
            manifest.append(
                (f"{circle}/{album}/Scans/booklet01.png", circle, album, "Scans",
                 "booklet01.png", "png", 900_000, 1700000000)
            )
    return manifest, probe


MANIFEST_SCHEMA = (
    "path string, circle_dir string, album_dir string, rel_dir string, "
    "filename string, ext string, size_bytes long, mtime_s long"
)
PROBE_SCHEMA = (
    "path string, duration_s double, "
    "tags struct<track:string, artist:string, title:string, album:string, "
    "album_artist:string, date:string, event:string>, has_cuesheet boolean"
)


def dataframes(spark, seed: int = 42, n_albums: int = 12):
    m, p = generate(seed, n_albums)
    return (
        spark.createDataFrame(m, MANIFEST_SCHEMA),
        spark.createDataFrame(p, PROBE_SCHEMA),
    )
