"""Streaming recognition demo — the analogue of
``Examples/OnlineRecognizer.cs``: feed 800-sample chunks, print partial
results as they change, flush at end of input.

  python examples/online_demo.py /path/to/model [a.wav ...]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from k2transducerasr_tpu.audio import read_wav, resample_linear
from k2transducerasr_tpu.runtime.bundle import ModelBundle
from k2transducerasr_tpu.runtime.online import OnlineRecognizer
from k2transducerasr_tpu.utils.profiling import Stopwatch


def main():
    model_dir = sys.argv[1]
    files = sys.argv[2:] or sorted(glob.glob(os.path.join(model_dir, "test_wavs", "*.wav")))
    bundle = ModelBundle.from_dir(model_dir)
    rec = OnlineRecognizer(bundle, max_lanes=max(1, len(files)), enable_endpoint=True)
    rate = bundle.frontend_cfg.sample_rate

    sw = Stopwatch().start()
    total = 0.0
    for f in files:
        audio = read_wav(f)
        pcm = resample_linear(audio.samples, audio.sample_rate, rate)
        total += audio.duration
        s = rec.create_online_stream()
        last = ""
        for off in range(0, len(pcm), 800):  # reference chunk feed size
            s.add_samples(pcm[off : off + 800])
            text = rec.get_results([s])[0].text
            if text != last:
                print(f"\r{text}", end="", flush=True)
                last = text
        res = rec.decode_to_end(s)
        print(f"\r{res.text}")
        rec.dispose_stream(s)
    sw.stop(total)
    print(sw.report())
    print("end!")


if __name__ == "__main__":
    main()
