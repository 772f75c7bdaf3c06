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
