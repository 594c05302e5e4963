"""Offline recognition demo — the analogue of the reference's
``Examples/OfflineRecognizer.cs`` driver: load a model dir, decode wavs
(default: the model's test_wavs), print text + RTF.

  python examples/offline_demo.py /path/to/model [a.wav b.wav ...]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from k2transducerasr_tpu.audio import read_wav, resample_linear
from k2transducerasr_tpu.runtime.bundle import ModelBundle
from k2transducerasr_tpu.runtime.offline import OfflineRecognizer
from k2transducerasr_tpu.utils.profiling import Stopwatch


def main():
    model_dir = sys.argv[1]
    files = sys.argv[2:] or sorted(glob.glob(os.path.join(model_dir, "test_wavs", "*.wav")))
    bundle = ModelBundle.from_dir(model_dir)
    rec = OfflineRecognizer(bundle)

    sw = Stopwatch().start()
    streams, total = [], 0.0
    for f in files:
        audio = read_wav(f)
        pcm = resample_linear(audio.samples, audio.sample_rate, bundle.frontend_cfg.sample_rate)
        total += audio.duration
        s = rec.create_offline_stream()
        s.add_samples(pcm)
        streams.append(s)
    results = rec.get_results(streams)
    sw.stop(total)

    for f, r in zip(files, results):
        print(f)
        print(r.text)
        print()
    print(sw.report())
    print("end!")


if __name__ == "__main__":
    main()
