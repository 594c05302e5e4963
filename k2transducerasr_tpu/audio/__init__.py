from k2transducerasr_tpu.audio.wav import read_wav, read_audio, AudioData
from k2transducerasr_tpu.audio.resample import resample_linear

__all__ = ["read_wav", "read_audio", "AudioData", "resample_linear"]
