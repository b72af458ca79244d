"""Generate the example input WAV for audio-mode matching.

The reference ships an ``input_audio/`` directory for target WAVs
(input_audio/README.md: "Conventional directory to place audio for input
into PMFM"). This tool fills it: it synthesises a sequence of FM voices —
one per analysis chunk — with the scalar ground-truth oracle
(ops/oracle.py, the mirror of Objective::synthesiseAudioDoubleSeries,
/root/reference/Evolutionary_Strategy.hpp:403-448), peak-normalises to
[-1, 1] (what a WAV reader hands the matcher, main.cpp:307-335) and writes
24-bit PCM (the reference's write depth, main.cpp:358).

    python tools/make_input_wav.py                       # input_audio/input.wav
    python tools/make_input_wav.py --chunks 16 --log2 11 --out my.wav

The resulting file is matched chunk-by-chunk by
``pmfm -j examples/audio_match.json`` — each chunk holds a different known
FM voice, so per-chunk best-parameter printouts should differ audibly.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pmfm_tpu.io.wav import write_wav  # noqa: E402
from pmfm_tpu.ops.oracle import OracleObjective  # noqa: E402

# fm3_series scaled parameters [I1, F1, I2, F2, I3, F3]: EVEN dims are the
# modulation indices (paramMaxs 3520), ODD dims the oscillator rate /
# carrier offsets in Hz (paramMaxs 8) — the reference's own convention
# (Evolutionary_Strategy.hpp:403-448: inc1 = w2sr*p[1], carrier offsets
# p[3]/p[5]; modulation amounts p[2j]*p[2j+1]). Every voice stays inside
# examples/audio_match.json's paramMins/Maxs so the matcher can actually
# reach it; voice 0 is the reference's example target (parameters.json:39).
VOICES = [
    [3078.0, 2.0, 3015.0, 1.5, 3141.0, 1.0],
    [1500.0, 3.5, 2200.0, 0.8, 900.0, 2.4],
    [440.0, 6.0, 1200.0, 2.2, 2500.0, 0.5],
    [2800.0, 1.1, 600.0, 4.3, 1800.0, 1.7],
    [950.0, 5.2, 3300.0, 0.6, 700.0, 3.1],
    [2000.0, 2.7, 1400.0, 3.8, 1100.0, 0.9],
    [600.0, 7.5, 800.0, 1.3, 3400.0, 2.0],
    [1750.0, 4.4, 2600.0, 2.9, 450.0, 6.5],
]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--out", default="input_audio/input.wav")
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--log2", type=int, default=11,
                    help="samples per chunk = 2^log2 (audioLengthLog2)")
    ap.add_argument("--sample-rate", type=int, default=44100)
    args = ap.parse_args(argv)

    n = 1 << args.log2
    obj = OracleObjective(n, sample_rate=args.sample_rate)
    chunks = []
    for i in range(args.chunks):
        params = np.asarray(VOICES[i % len(VOICES)], np.float32)
        audio = obj.synthesize(params, "fm3_series")
        peak = float(np.abs(audio).max()) or 1.0
        chunks.append(audio / peak)  # per-voice normalise: even loudness
    out = np.concatenate(chunks)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    write_wav(args.out, out, args.sample_rate, bit_depth=24)
    print(f"wrote {args.out}: {len(out)} samples "
          f"({args.chunks} x {n}), {args.sample_rate} Hz, 24-bit")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
