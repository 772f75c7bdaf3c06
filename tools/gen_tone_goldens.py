"""Generate the NON-silent golden-PCM fixtures (round-14 VERDICT #1).

The silence goldens value-check the ffmpeg lane's zero path only — an
all-zeros decode bug passes them. These fixtures add real content through
the SAME lane with everything derivable in-container:

 - tone_44k_mono_pcm.npy  — formula-exact int16 tone (functions/media
   .tone_pcm_s16), the golden PCM both files must decode to;
 - tone_44k_mono.wav      — canonical RIFF PCM16 container of that tone;
 - tone_44k_mono.flac     — the tone through the in-repo RFC 9639
   encoder (real Rice-coded entropy frames, LPC mode), losslessness
   guaranteed by construction and re-proved by the committed-fixture
   test decoding it with the in-repo decoder.

MP3/AAC deliberately get NO tone golden in-container: a non-silent
Layer III/AAC golden needs the spec's Huffman tables and the 512-tap
synthesis window verbatim, which cannot be sourced here and must not be
approximated (functions/media.py's must-error-never-fake boundary). The
swap when a sourced environment exists: encode tone_pcm_s16 with a
reference encoder, decode once with a reference decoder, commit both —
tests/test_golden_pcm.py's sample-agreement harness already accepts any
(file, npy) pair.

Usage: python tools/gen_tone_goldens.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, ".")

GOLDEN = os.path.join("fixtures", "golden_pcm")


def main() -> int:
    from tlmc_etl_spark.functions.media import build_wav_pcm16, tone_pcm_s16
    from tlmc_etl_spark.operators.flac import encode_flac, parse_flac_audio

    pcm = tone_pcm_s16()
    np.save(os.path.join(GOLDEN, "tone_44k_mono_pcm.npy"), pcm)
    with open(os.path.join(GOLDEN, "tone_44k_mono.wav"), "wb") as f:
        f.write(build_wav_pcm16(pcm))
    flac = encode_flac(pcm, 44100, mode="lpc", block_size=4096)
    # losslessness proof before committing: decode must return the input
    dec = parse_flac_audio(flac)
    assert np.array_equal(dec["samples"][:, 0], pcm.astype(np.int64)), (
        "in-repo FLAC round-trip broke"
    )
    with open(os.path.join(GOLDEN, "tone_44k_mono.flac"), "wb") as f:
        f.write(flac)
    print(f"wrote tone goldens: {len(pcm)} samples, flac {len(flac)} bytes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
