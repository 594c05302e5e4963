from k2transducerasr_tpu.audio.wav import read_wav, AudioData
from k2transducerasr_tpu.audio.resample import resample_linear

__all__ = ["read_wav", "AudioData", "resample_linear"]
