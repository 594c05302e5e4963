"""WER harness — LibriSpeech/AISHELL-style evaluation (BASELINE.md north star).

Dataset layout (either):
  * a directory of ``*.wav`` plus ``transcripts.tsv`` lines ``<utt_id>\t<text>``
    where ``<utt_id>.wav`` exists, or
  * LibriSpeech layout: ``*/*/*.flac|wav`` with ``*.trans.txt`` files
    (``<utt_id> <TEXT>`` lines).

Usage:
  python benchmarks/wer_harness.py --model-dir /path/model --data /path/testset \
      [--unit word|char] [--method greedy_search|modified_beam_search] [--batch 16]

Prints one JSON line: {"wer": ..., "substitutions": ..., "insertions": ...,
"deletions": ..., "utterances": N, "audio_seconds": S, "rtf": ...}.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_dataset(data_dir: str) -> list[tuple[str, str]]:
    """-> [(wav_path, reference_text)]"""
    pairs = []
    tsv = os.path.join(data_dir, "transcripts.tsv")
    if os.path.exists(tsv):
        with open(tsv, encoding="utf-8") as f:
            for line in f:
                if "\t" not in line:
                    continue
                utt, text = line.rstrip("\n").split("\t", 1)
                wav = os.path.join(data_dir, utt + ".wav")
                if os.path.exists(wav):
                    pairs.append((wav, text))
        return pairs
    # LibriSpeech layout
    for trans in glob.glob(os.path.join(data_dir, "**", "*.trans.txt"), recursive=True):
        base = os.path.dirname(trans)
        with open(trans, encoding="utf-8") as f:
            for line in f:
                utt, _, text = line.rstrip("\n").partition(" ")
                for ext in (".wav", ".flac"):
                    p = os.path.join(base, utt + ext)
                    if os.path.exists(p):
                        pairs.append((p, text))
                        break
    return pairs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--unit", default="word", choices=["word", "char"])
    ap.add_argument("--method", default="greedy_search")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args()

    from k2transducerasr_tpu.audio import read_wav, resample_linear
    from k2transducerasr_tpu.runtime.bundle import ModelBundle
    from k2transducerasr_tpu.runtime.offline import OfflineRecognizer
    from k2transducerasr_tpu.utils.metrics import measure

    pairs = load_dataset(args.data)
    if args.limit:
        pairs = pairs[: args.limit]
    if not pairs:
        print("no utterances found", file=sys.stderr)
        return 2

    bundle = ModelBundle.from_dir(args.model_dir)
    rec = OfflineRecognizer(bundle, decoding_method=args.method)
    rate = bundle.frontend_cfg.sample_rate

    refs, hyps = [], []
    audio_s = 0.0
    t0 = time.time()
    for i in range(0, len(pairs), args.batch):
        chunk = pairs[i : i + args.batch]
        streams = []
        for wav, _ in chunk:
            a = read_wav(wav)
            pcm = resample_linear(a.samples, a.sample_rate, rate)
            audio_s += len(pcm) / rate
            s = rec.create_offline_stream()
            s.add_samples(pcm)
            streams.append(s)
        for (_, ref), res in zip(chunk, rec.get_results(streams)):
            refs.append(ref.lower())
            hyps.append(res.text)
    elapsed = time.time() - t0

    er = measure(refs, hyps, unit=args.unit)
    print(
        json.dumps(
            {
                "wer": round(er.rate, 5),
                "substitutions": er.substitutions,
                "insertions": er.insertions,
                "deletions": er.deletions,
                "utterances": len(refs),
                "audio_seconds": round(audio_s, 1),
                "rtf": round(elapsed / max(audio_s, 1e-9), 5),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
