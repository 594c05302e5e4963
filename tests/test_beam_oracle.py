"""Independent oracle for decode/rnnt_beam.py (VERDICT r3 weak #4 / item 7).

The oracle below is a from-scratch host-side modified_beam_search (plain
Python lists + numpy, following the public icefall algorithm: one expansion
per frame, score+logp candidates over all (beam, token) pairs, top-K, blank
extends no token).  It shares only the NN scoring functions (decoder/joiner
forwards) with the production code — those are pinned separately by the ONNX
import and torch-parity suites — so this test isolates the SEARCH control
flow: beam bookkeeping, parent gather, emission masking, ragged-length
handling, and best-beam extraction, which the device implementation realizes
with top_k/take_along_axis over fixed-shape buffers.
"""

import numpy as np

import jax
import jax.numpy as jnp

from k2transducerasr_tpu.decode import rnnt_beam
from k2transducerasr_tpu.models import decoder as decoder_mod
from k2transducerasr_tpu.models import joiner as joiner_mod

V, D, J, ENC = 23, 16, 20, 24
DEC_CFG = decoder_mod.DecoderConfig(vocab_size=V, decoder_dim=D, context_size=2)


def _params(seed):
    kd, kj = jax.random.split(jax.random.PRNGKey(seed))
    dec = decoder_mod.init_params(kd, DEC_CFG)
    join = joiner_mod.init_params(
        kj, joiner_mod.JoinerConfig(encoder_dim=ENC, decoder_dim=D, joiner_dim=J,
                                    vocab_size=V)
    )
    return dec, join


def _log_softmax(x):
    x = x - x.max()
    return x - np.log(np.exp(x).sum())


def oracle_modified_beam_search(dec_params, join_params, enc_out, n_frames,
                                k, extra_skip_sos=False):
    """enc_out: [T, ENC] for ONE utterance -> (tokens, timestamps, score) of
    the best final hypothesis."""
    enc_proj = np.asarray(joiner_mod.project_encoder(join_params, jnp.asarray(enc_out)))
    blank = DEC_CFG.blank_id
    ctx = DEC_CFG.context_size
    beams = [{"tokens": [], "ts": [], "hyp": [blank] * ctx, "score": 0.0}]
    for t in range(n_frames):
        cands = []  # (score, beam_index, token)
        for bi, bm in enumerate(beams):
            dec = decoder_mod.forward(
                dec_params, DEC_CFG, jnp.asarray([bm["hyp"]], jnp.int32)
            )
            dp = np.asarray(joiner_mod.project_decoder(join_params, dec))[0]
            logits = np.asarray(
                joiner_mod.joint_logits(join_params, jnp.asarray(enc_proj[t]),
                                        jnp.asarray(dp))
            )
            logp = _log_softmax(logits.astype(np.float64))
            logp[2] = -1e30
            if extra_skip_sos:
                logp[1] = -1e30
            for v in range(V):
                cands.append((bm["score"] + logp[v], bi, v))
        cands.sort(key=lambda c: -c[0])
        new_beams = []
        for score, bi, v in cands[:k]:
            src = beams[bi]
            if v == blank:
                new_beams.append({"tokens": list(src["tokens"]), "ts": list(src["ts"]),
                                  "hyp": list(src["hyp"]), "score": score})
            else:
                new_beams.append({
                    "tokens": src["tokens"] + [v],
                    "ts": src["ts"] + [t],
                    "hyp": src["hyp"][1:] + [v],
                    "score": score,
                })
        beams = new_beams
    best = max(beams, key=lambda b: b["score"])
    return best["tokens"], best["ts"], best["score"]


def _run_device(dec_params, join_params, enc_out_b, lens, k, extra_skip_sos=False):
    tokens, ts, count = rnnt_beam.rnnt_beam_search(
        dec_params, DEC_CFG, join_params, jnp.asarray(enc_out_b),
        jnp.asarray(lens, jnp.int32), num_active_paths=k, max_tokens=64,
        extra_skip_sos=extra_skip_sos, compute_dtype=None,
    )
    tokens, ts, count = map(np.asarray, (tokens, ts, count))
    return [
        (tokens[b, : count[b]].tolist(), ts[b, : count[b]].tolist())
        for b in range(tokens.shape[0])
    ]


def test_beam_matches_numpy_oracle_batch_ragged():
    dec_params, join_params = _params(0)
    rng = np.random.default_rng(1)
    b, t = 3, 17
    # scale up so logits have decisive (non-tied) argmax structure
    enc = (rng.standard_normal((b, t, ENC)) * 2.0).astype(np.float32)
    lens = np.array([17, 9, 13], np.int32)

    got = _run_device(dec_params, join_params, enc, lens, k=4)
    for bi in range(b):
        toks, ts, _ = oracle_modified_beam_search(
            dec_params, join_params, enc[bi], int(lens[bi]), k=4
        )
        assert got[bi] == (toks, ts), f"lane {bi}: {got[bi]} != {(toks, ts)}"


def test_beam_matches_numpy_oracle_skip_sos_and_k2():
    dec_params, join_params = _params(7)
    rng = np.random.default_rng(2)
    enc = (rng.standard_normal((2, 12, ENC)) * 2.0).astype(np.float32)
    lens = np.array([12, 12], np.int32)

    got = _run_device(dec_params, join_params, enc, lens, k=2, extra_skip_sos=True)
    for bi in range(2):
        toks, ts, _ = oracle_modified_beam_search(
            dec_params, join_params, enc[bi], 12, k=2, extra_skip_sos=True
        )
        assert got[bi] == (toks, ts), f"lane {bi}: {got[bi]} != {(toks, ts)}"
