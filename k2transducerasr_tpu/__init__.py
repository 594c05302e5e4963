"""k2transducerasr_tpu — a TPU-native transducer/CTC ASR inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
manyeyes/K2TransducerAsr (C# + OnnxRuntime, reference at /root/reference):
k2/icefall RNN-Transducer and Zipformer-CTC speech recognition, offline and
streaming, for Conformer / LSTM / Zipformer(v1) / Zipformer2 encoder families.

Design principles (TPU-first, not a port):
  * All compute lives device-side in jitted XLA programs: fbank frontend as
    matmul-DFT (MXU), encoders as batched bf16 matmul graphs, and the entire
    RNN-T greedy/beam token loop as ``lax.while_loop`` with masked lanes —
    only final token ids return to the host.
  * Streaming caches are fixed-shape pytrees resident in HBM, donated between
    chunk steps; no host stack/unstack of per-stream state (the reference's
    per-chunk host memcpy, OnlineProjOfZipformer2.cs:144-489, disappears).
  * Scaling is expressed with ``jax.sharding.Mesh`` + ``NamedSharding``
    (data/model axes); XLA inserts the collectives.

Public API (mirrors the reference's recognizer surface,
OfflineRecognizer.cs:71-91 / OnlineRecognizer.cs:60-84):

    from k2transducerasr_tpu import OfflineRecognizer, OnlineRecognizer
"""

__version__ = "0.1.0"

from k2transducerasr_tpu.runtime.offline import OfflineRecognizer, OfflineStream
from k2transducerasr_tpu.runtime.online import OnlineRecognizer, OnlineStream

__all__ = [
    "OfflineRecognizer",
    "OfflineStream",
    "OnlineRecognizer",
    "OnlineStream",
    "__version__",
]
