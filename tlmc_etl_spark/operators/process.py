"""Subprocess-backed media probe: a real child process per file, batched
inside `mapInPandas`, every failure mode isolated to its own row.

The reference shells out to ffprobe per track and parses its JSON
(info_scanner_ph1.py:550-616, Shared/utils.py:80-113); its journaling
layer makes re-runs skip already-probed paths. The Spark shape: paths
ride a DataFrame, each task probes its Arrow batch sequentially (one
short-lived process per file — the process launch IS the unit of work,
so there is nothing to vectorize), and resume is an anti-join against
the journal of done paths instead of bookkeeping code. A corrupt file,
a missing file, a hung probe, or garbage stdout fails ITS row with a
reason — never the batch, never the job (the same per-row isolation
contract as sources/binvec.py).

Tests drive this with tools/fake_ffprobe so the spawn/timeout/bad-exit
paths actually execute in CI; production swaps `probe_cmd` for the real
ffprobe argv prefix and changes nothing else.
"""

from __future__ import annotations

import json
import math
import re
import subprocess

import pandas as pd
from pyspark.sql import DataFrame

from tlmc_etl_spark.tuning import fanout

FFPROBE_CMD = ["ffprobe", "-v", "error", "-show_format", "-show_streams", "-of", "json"]

PROBE_RESULT_SCHEMA = (
    "path string, duration_s double, codec string, sample_rate int, "
    "channels int, ok boolean, reason string"
)


def probe_media_paths(
    files: DataFrame,
    path_col: str = "path",
    probe_cmd: list[str] | None = None,
    timeout_s: float = 30.0,
    done: DataFrame | None = None,
) -> DataFrame:
    """Probe each path with a child process; one result row per input row.

    `done` (a single-column journal of already-probed paths) is removed
    by anti-join before any process spawns — the journal-resume contract.
    Output: PROBE_RESULT_SCHEMA; ok=false rows carry reason
    'exit_<code>', 'timeout', 'spawn_error:<errno-class>' or 'bad_json'.
    """
    cmd = list(probe_cmd) if probe_cmd is not None else list(FFPROBE_CMD)
    slim = files.select(path_col)
    if done is not None:
        slim = slim.join(done.select(path_col), path_col, "left_anti")
    # Process-per-file is pure CPU/latency with near-zero shuffle bytes:
    # AQE-exempt fan-out keeps every core spawning.
    slim = fanout(slim)

    def run(batches):
        for pdf in batches:
            out = []
            for p in pdf[path_col]:
                try:
                    r = subprocess.run(
                        cmd + [p], capture_output=True, timeout=timeout_s
                    )
                except subprocess.TimeoutExpired:
                    out.append((p, None, None, None, None, False, "timeout"))
                    continue
                except OSError as e:
                    out.append(
                        (p, None, None, None, None, False,
                         f"spawn_error:{type(e).__name__}")
                    )
                    continue
                if r.returncode != 0:
                    out.append(
                        (p, None, None, None, None, False, f"exit_{r.returncode}")
                    )
                    continue
                try:
                    j = json.loads(r.stdout)
                    fmt = j["format"]
                    stream = next(
                        (s for s in j.get("streams", []) if s.get("codec_type") == "audio"),
                        {},
                    )
                    out.append(
                        (
                            p,
                            float(fmt["duration"]),
                            stream.get("codec_name"),
                            int(stream["sample_rate"]) if "sample_rate" in stream else None,
                            int(stream["channels"]) if "channels" in stream else None,
                            True,
                            None,
                        )
                    )
                except (ValueError, KeyError, TypeError):
                    out.append((p, None, None, None, None, False, "bad_json"))
            yield pd.DataFrame(
                out,
                columns=[
                    "path", "duration_s", "codec", "sample_rate",
                    "channels", "ok", "reason",
                ],
            )

    return slim.mapInPandas(run, schema=PROBE_RESULT_SCHEMA)


# The argv the reference runs per track (loudness_measure.py:111-127): -vn
# drops embedded cover art whose broken image stream would otherwise kill a
# decodable audio file; ebur128 measures the ITU-R BS.1770 quantities in one
# pass. "{input}" is replaced by each file's path — a placeholder rather
# than an append because ffmpeg argv order is positional (input after -i,
# output options after the input).
FFMPEG_EBUR128_CMD = [
    "ffmpeg", "-hide_banner", "-nostats", "-i", "{input}", "-vn", "-threads",
    "1", "-af", "ebur128=peak=true", "-f", "null", "-",
]

LOUDNESS_RESULT_SCHEMA = (
    "path string, i double, tp double, lra double, ok boolean, reason string"
)

# ebur128 prints "-inf" for a digitally silent track's peak and "nan" for a
# stream it could not gate; a digits-only pattern would misread both as
# parse failures (loudness_measure.py:60-67 hit exactly this on 85 silent
# tracks). Summary lands at the END of stderr.
_NUM = r"(-?(?:inf|nan|[\d.]+))"
_RE_I = re.compile(r"I:\s*" + _NUM + r"\s*LUFS")
_RE_LRA = re.compile(r"LRA:\s*" + _NUM + r"\s*LU")
_RE_PEAK = re.compile(r"Peak:\s*" + _NUM + r"\s*dBFS")


def _finite_or_none(x: float) -> float | None:
    """Non-finite measurements surface as NULL, not Infinity/NaN: bare
    Infinity/NaN is invalid strict JSON and poisons downstream arithmetic;
    null says 'unmeasurable' portably (loudness_measure.py:246-250)."""
    return x if math.isfinite(x) else None


def measure_loudness_paths(
    files: DataFrame,
    path_col: str = "path",
    ffmpeg_cmd: list[str] | None = None,
    timeout_s: float = 600.0,
    done: DataFrame | None = None,
) -> DataFrame:
    """One-pass ebur128 loudness measurement via a child process per path.

    Same process-UDF shape as probe_media_paths: `done` journal rows are
    anti-joined away before any spawn (resume), each Arrow batch runs its
    files sequentially (the process launch is the unit of work), and a
    corrupt/hung/unparseable file fails only ITS row. stderr is parsed as
    bytes-then-replace because media filenames routinely hold undecodable
    bytes that ffmpeg echoes back (loudness_measure.py:113-118's lesson —
    a UTF-8 decode error must not kill the worker).

    Output: LOUDNESS_RESULT_SCHEMA; i/tp/lra are NULL when non-finite
    (silence or ungateable); ok=false rows carry reason 'exit_<code>',
    'timeout', 'spawn_error:<class>' or 'no_summary'.

    Tests drive this with tools/fake_ffmpeg; production swaps `ffmpeg_cmd`
    for the real ffmpeg argv and changes nothing else.
    """
    cmd = list(ffmpeg_cmd) if ffmpeg_cmd is not None else list(FFMPEG_EBUR128_CMD)
    if "{input}" not in cmd:
        cmd = cmd + ["-i", "{input}"]
    slim = files.select(path_col)
    if done is not None:
        slim = slim.join(done.select(path_col), path_col, "left_anti")
    # Process-per-file: CPU/latency-bound with near-zero shuffle bytes, so
    # the AQE-exempt fan-out is what keeps every core measuring.
    slim = fanout(slim)

    def run(batches):
        for pdf in batches:
            out = []
            for p in pdf[path_col]:
                argv = [a if a != "{input}" else str(p) for a in cmd]
                try:
                    r = subprocess.run(argv, capture_output=True, timeout=timeout_s)
                except subprocess.TimeoutExpired:
                    out.append((p, None, None, None, False, "timeout"))
                    continue
                except OSError as e:
                    out.append(
                        (p, None, None, None, False, f"spawn_error:{type(e).__name__}")
                    )
                    continue
                if r.returncode != 0:
                    out.append((p, None, None, None, False, f"exit_{r.returncode}"))
                    continue
                tail = r.stderr[-2000:].decode("utf-8", errors="replace")
                mi, mlra, mpeak = (
                    _RE_I.search(tail), _RE_LRA.search(tail), _RE_PEAK.search(tail)
                )
                if not (mi and mlra and mpeak):
                    out.append((p, None, None, None, False, "no_summary"))
                    continue
                out.append(
                    (
                        p,
                        _finite_or_none(float(mi.group(1))),
                        _finite_or_none(float(mpeak.group(1))),
                        _finite_or_none(float(mlra.group(1))),
                        True,
                        None,
                    )
                )
            yield pd.DataFrame(
                out, columns=["path", "i", "tp", "lra", "ok", "reason"]
            )

    return slim.mapInPandas(run, schema=LOUDNESS_RESULT_SCHEMA)
