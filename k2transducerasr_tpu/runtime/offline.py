"""Offline (whole-utterance) recognizer — public API.

Parity surface with the reference (``OfflineRecognizer.cs:71-91``):
``create_offline_stream()``, ``stream.add_samples(pcm)``, ``get_result(s)``,
``get_results(streams)``; decoding methods ``greedy_search`` (RNN-T) and
``greedy_search_ctc`` (forced for *ctc model types,
OfflineRecognizer.cs:46-49).

TPU-first execution: ONE jitted program per (batch-bucket, frame-bucket)
runs fbank -> encoder -> joiner-projection -> full greedy scan on device;
the host sees only final token buffers.  The reference instead crosses the
managed/native boundary per frame (SURVEY.md §3.2).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from k2transducerasr_tpu.decode import ctc_greedy, rnnt_greedy
from k2transducerasr_tpu.frontend.fbank import num_frames_for
from k2transducerasr_tpu.models import ctc as ctc_mod
from k2transducerasr_tpu.models import joiner as joiner_mod
from k2transducerasr_tpu.runtime.bundle import ModelBundle
from k2transducerasr_tpu.text.postprocess import tokens_to_text


@dataclasses.dataclass
class OfflineRecognizerResult:
    """Reference: OfflineRecognizerResultEntity (text/text_len/tokens/
    timestamps — the reference never fills the last two; we do)."""

    text: str
    tokens: list[str]
    timestamps: list[int]

    @property
    def text_len(self) -> int:
        return len(self.text)


class OfflineStream:
    """Per-utterance sample accumulator (reference OfflineStream.cs — but
    features are computed batched at decode time, not per add_samples call;
    equivalent under snip_edges and one device dispatch instead of many)."""

    def __init__(self, sample_rate: int):
        self.sample_rate = sample_rate
        self._chunks: list[np.ndarray] = []
        self.result: OfflineRecognizerResult | None = None

    def add_samples(self, samples: np.ndarray) -> None:
        self._chunks.append(np.asarray(samples, dtype=np.float32))

    @property
    def samples(self) -> np.ndarray:
        if not self._chunks:
            return np.zeros(0, np.float32)
        if len(self._chunks) > 1:
            self._chunks = [np.concatenate(self._chunks)]
        return self._chunks[0]

    # C#-style aliases
    AddSamples = add_samples


def _bucket(n: int, step: int, minimum: int) -> int:
    return max(minimum, -(-n // step) * step)


# ln(1e-10): the reference's pad fill (PadHelper.cs:58)
REFERENCE_PAD_FILL = -23.025850929940457


def apply_reference_pad(feats, feat_lens, tail_len: int = 19):
    """Reproduce the reference's offline feature-pad contract
    (PadHelper.cs:17-58 + OfflineProjOfTransducer.cs:66-69): every lane
    claims max(feat_lens)+tail_len frames (capped at the buffer), frames past
    a lane's true length are filled with ln(1e-10), and any exact-zero
    feature value is also rewritten to ln(1e-10).  Real deployments of the
    reference fed every export input padded this way, so transcript parity
    on real models can hinge on it; the switch is OFF by default because the
    true-length masked path is strictly more accurate.

    feats: [B, T_pad, F]; feat_lens: [B].  Returns (feats, feat_lens)."""
    t_pad = feats.shape[1]
    claim = jnp.minimum(jnp.max(feat_lens) + tail_len, t_pad)
    idx = jnp.arange(t_pad)
    feats = jnp.where(feats == 0.0, REFERENCE_PAD_FILL, feats)
    valid = idx[None, :] < feat_lens[:, None]
    feats = jnp.where(valid[:, :, None], feats, REFERENCE_PAD_FILL)
    return feats, jnp.full_like(feat_lens, claim)


class OfflineRecognizer:
    def __init__(
        self,
        bundle: ModelBundle,
        decoding_method: str = "greedy_search",
        compute_dtype=jnp.bfloat16,
        max_tokens: int = 1024,
        frame_bucket: int = 256,
        max_active_paths: int = 4,
        mesh=None,
        reference_pad_compat: bool = False,
        hotwords: list[str] | None = None,
        accuracy: str | None = None,
    ):
        if bundle.is_ctc:
            decoding_method = "greedy_search_ctc"  # forced, as in reference
        if decoding_method not in (
            "greedy_search",
            "greedy_search_ctc",
            "modified_beam_search",
        ):
            raise ValueError(f"unsupported decoding method {decoding_method!r}")
        self.bundle = bundle
        self.decoding_method = decoding_method
        self.compute_dtype = compute_dtype
        self.max_tokens = max_tokens
        self.frame_bucket = frame_bucket
        self.max_active_paths = max_active_paths
        self.reference_pad_compat = reference_pad_compat
        # hotword-biased n-best selection (text/hotwords.apply_hotwords);
        # requires modified_beam_search — the reference's HotwordsHelper.cs
        # was dead code, here it is reachable surface
        self.hotwords = hotwords
        if hotwords and self.decoding_method != "modified_beam_search":
            raise ValueError("hotwords require decoding_method='modified_beam_search'")
        # multi-chip: DP over the utterance batch + TP param shards; GSPMD
        # inserts the collectives, the decode program is unchanged
        # (SURVEY.md §2.3; reference has no distribution of any kind)
        # accuracy="int8": the reference's production execution mode
        # (int8 ONNX, README.EN.md:276) — encoder linear weights quantized
        # per-channel, int8 x int8 -> int32 matmuls with dynamic per-token
        # activation scales (ops/layers._apply_linear_int8)
        if accuracy not in (None, "auto", "float32", "int8"):
            raise ValueError(f"unsupported accuracy {accuracy!r}")
        self.accuracy = accuracy
        params = bundle.params
        if accuracy == "int8":
            from k2transducerasr_tpu.ops.layers import quantize_tree_int8

            params = dict(params, encoder=quantize_tree_int8(params["encoder"]))
        self.mesh = mesh
        if mesh is not None:
            from k2transducerasr_tpu.parallel import sharding as sh

            self._params = sh.shard_params(params, mesh)
            self._batch_sharding = sh.batch_sharding(mesh)
            self._data_par = mesh.shape["data"]
        else:
            self._params = params
            self._batch_sharding = None
            self._data_par = 1
        self._decode_fn = self._build_decode_fn()

    # -- public API ---------------------------------------------------------

    def create_offline_stream(self) -> OfflineStream:
        return OfflineStream(self.bundle.frontend_cfg.sample_rate)

    create_stream = create_offline_stream
    CreateOfflineStream = create_offline_stream

    def get_result(self, stream: OfflineStream) -> OfflineRecognizerResult:
        return self.get_results([stream])[0]

    def get_results(self, streams: list[OfflineStream]) -> list[OfflineRecognizerResult]:
        return self.end_decode(self.begin_decode(streams))

    def begin_decode(self, streams: list[OfflineStream]):
        """Dispatch the full device program for a batch and return a pending
        handle WITHOUT waiting — transfers and compute are asynchronous, so a
        serving loop can pipeline batch k+1's host prep + upload behind batch
        k's device execution (``get_results`` is begin+end fused).  The
        reference's API is fully synchronous (OfflineRecognizer.cs:77-91);
        this is the TPU-serving addition that hides host<->device latency."""
        cfg = self.bundle.frontend_cfg
        b = len(streams)
        n_samples = [len(s.samples) for s in streams]
        n_frames = np.array([num_frames_for(n, cfg) for n in n_samples], np.int32)

        # ONE device program does fbank -> encoder -> search; the host only
        # ships the padded sample batch (as int16 — bit-exact for PCM16
        # sources and half the tunnel bytes) and reads back token buffers.
        # compat mode claims +19 frames past the longest lane — keep them
        # inside the bucketed buffer
        tail = 19 if self.reference_pad_compat else 0
        t_pad = _bucket(
            int(n_frames.max(initial=1)) + tail, self.frame_bucket, self.frame_bucket
        )
        need = (t_pad - 1) * cfg.frame_shift + cfg.frame_length
        b_pad = -(-b // self._data_par) * self._data_par  # lanes per data shard
        batch = np.zeros((b_pad, need), np.int16)
        for i, s in enumerate(streams):
            x = s.samples[:need]
            batch[i, : len(x)] = np.clip(x * 32768.0, -32768, 32767).astype(np.int16)
        counts = np.zeros((b_pad,), np.int32)
        counts[:b] = np.minimum(n_samples, need)
        samples_dev = jnp.asarray(batch)
        counts_dev = jnp.asarray(counts)
        if self._batch_sharding is not None:
            samples_dev = jax.device_put(samples_dev, self._batch_sharding)
            counts_dev = jax.device_put(counts_dev, self._batch_sharding)
        out = self._decode_fn(
            self._params, self._fbank_tables, samples_dev, counts_dev
        )
        tokens, timestamps, count = out[:3]
        nbest = out[3] if len(out) > 3 else None
        return (streams, tokens, timestamps, count, nbest)

    def end_decode(self, pending) -> list[OfflineRecognizerResult]:
        """Wait for a ``begin_decode`` handle and return the results.  With
        ``hotwords`` set (modified_beam_search only) the returned hypothesis
        per lane is the n-best entry preferred by
        text/hotwords.apply_hotwords instead of the raw best-scoring one."""
        streams, tokens, timestamps, count, nbest = pending
        if self.hotwords and nbest is not None:
            from k2transducerasr_tpu.text.hotwords import apply_hotwords

            results = []
            for i, cands in enumerate(self._nbest_results(streams, nbest)):
                texts = [c.text for c in cands]
                chosen = cands[texts.index(apply_hotwords(texts, self.hotwords))]
                results.append(chosen)
                streams[i].result = chosen
            return results
        b = len(streams)
        raw = rnnt_greedy.extract_results(tokens, timestamps, count)[:b]
        results = []
        for i, (toks, stamps) in enumerate(raw):
            text = tokens_to_text(toks, self.bundle.tokens)
            results.append(
                OfflineRecognizerResult(
                    text=text,
                    tokens=[self.bundle.tokens.get(t) for t in toks],
                    timestamps=stamps,
                )
            )
            streams[i].result = results[-1]
        return results

    def get_nbest_results(
        self, streams: list[OfflineStream]
    ) -> list[list[OfflineRecognizerResult]]:
        """Decode and return ALL ``max_active_paths`` hypotheses per stream,
        best-scoring first (modified_beam_search only).  The beams are not
        recombined, so distinct beams may carry identical token sequences."""
        pending = self.begin_decode(streams)
        nbest = pending[4]
        if nbest is None:
            raise ValueError("get_nbest_results requires modified_beam_search")
        return self._nbest_results(streams, nbest)

    def _nbest_results(self, streams, nbest) -> list[list[OfflineRecognizerResult]]:
        toks, stamps, cnt, _score = jax.device_get(nbest)
        b, k = cnt.shape[:2]
        out = []
        for i in range(len(streams)):
            lane = []
            for j in range(k):
                n = int(cnt[i, j])
                t = toks[i, j, :n].tolist()
                lane.append(
                    OfflineRecognizerResult(
                        text=tokens_to_text(t, self.bundle.tokens),
                        tokens=[self.bundle.tokens.get(x) for x in t],
                        timestamps=stamps[i, j, :n].tolist(),
                    )
                )
            out.append(lane)
        return out

    GetResult = get_result
    GetResults = get_results

    # -- jitted end-to-end decode ------------------------------------------

    def _build_decode_fn(self):
        bundle = self.bundle
        enc_mod = bundle.encoder
        enc_cfg = bundle.encoder_cfg
        fcfg = bundle.frontend_cfg
        compute_dtype = self.compute_dtype
        max_tokens = self.max_tokens
        compat_pad = self.reference_pad_compat

        # fbank matrices ride as device-resident ARGUMENTS, never as program
        # constants: executables carrying multi-MB constants degrade every
        # subsequent host<->device transfer through the axon tunnel (measured
        # 15.7 MB H2D: ~11 ms clean vs ~350 ms after one constant-bearing
        # program has run)
        from k2transducerasr_tpu.frontend.fbank import fbank_matrices

        self._fbank_tables = tuple(jnp.asarray(m) for m in fbank_matrices(fcfg))

        def front(tables, samples, sample_counts):
            """samples [B, N] int16 + true counts -> (feats [B, T_pad, F],
            feat_lens [B]) — fused into the decode jit."""
            from k2transducerasr_tpu.frontend.fbank import (
                fbank_compute,
                num_frames_jnp,
            )

            samples = samples.astype(jnp.float32) * (1.0 / 32768.0)
            n = samples.shape[1]
            t_pad = (n - fcfg.frame_length) // fcfg.frame_shift + 1
            feats = fbank_compute(samples, fcfg, t_pad, n_valid=sample_counts, tables=tables)
            feat_lens = num_frames_jnp(sample_counts, fcfg)
            if compat_pad:
                feats, feat_lens = apply_reference_pad(feats, feat_lens)
            return feats, feat_lens

        if self.decoding_method == "greedy_search_ctc":

            @functools.partial(jax.jit)
            def decode(params, tables, samples, sample_counts):
                feats, feat_lens = front(tables, samples, sample_counts)
                enc_out, enc_lens = enc_mod.forward(
                    params["encoder"], enc_cfg, feats, feat_lens, compute_dtype
                )
                lp = ctc_mod.log_probs(params["ctc"], enc_out, compute_dtype)
                state = ctc_greedy.init_state(samples.shape[0], max_tokens)
                final = ctc_greedy.ctc_frames(
                    state, lp, enc_lens, jnp.zeros((samples.shape[0],), jnp.int32)
                )
                return final.tokens, final.timestamps, final.count

            return decode

        dec_cfg = bundle.decoder_cfg

        if self.decoding_method == "modified_beam_search":
            from k2transducerasr_tpu.decode import rnnt_beam

            paths = self.max_active_paths

            @functools.partial(jax.jit)
            def decode(params, tables, samples, sample_counts):
                feats, feat_lens = front(tables, samples, sample_counts)
                enc_out, enc_lens = enc_mod.forward(
                    params["encoder"], enc_cfg, feats, feat_lens, compute_dtype
                )
                b = samples.shape[0]
                enc_proj = joiner_mod.project_encoder(
                    params["joiner"], enc_out, compute_dtype
                )
                state = rnnt_beam.init_state(
                    params["decoder"], dec_cfg, params["joiner"], b, paths,
                    max_tokens, compute_dtype,
                )
                final = rnnt_beam.beam_frames_skip(
                    params["decoder"], dec_cfg, params["joiner"], state,
                    enc_proj, enc_lens, jnp.zeros((b,), jnp.int32),
                    False, compute_dtype,
                )
                # best triple for get_results + the full ordered n-best
                # buffers; device_get is lazy per-array, so callers that only
                # read the best triple never transfer the K-beam buffers
                return rnnt_beam.best_beam(final) + (rnnt_beam.nbest_beams(final),)

            return decode

        @functools.partial(jax.jit)
        def decode(params, tables, samples, sample_counts):
            feats, feat_lens = front(tables, samples, sample_counts)
            enc_out, enc_lens = enc_mod.forward(
                params["encoder"], enc_cfg, feats, feat_lens, compute_dtype
            )
            enc_proj = joiner_mod.project_encoder(
                params["joiner"], enc_out, compute_dtype
            )
            state = rnnt_greedy.init_state(
                params["decoder"], dec_cfg, params["joiner"], samples.shape[0],
                max_tokens, compute_dtype,
            )
            final = rnnt_greedy.greedy_frames_skip(
                params["decoder"], dec_cfg, params["joiner"], state,
                enc_proj, enc_lens,
                jnp.zeros((samples.shape[0],), jnp.int32),
                False, compute_dtype,
            )
            return final.tokens, final.timestamps, final.count

        return decode
