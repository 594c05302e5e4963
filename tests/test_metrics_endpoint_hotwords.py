import numpy as np

from k2transducerasr_tpu.runtime.endpoint import EndpointConfig, is_endpoint
from k2transducerasr_tpu.text.hotwords import apply_hotwords, boost_tokens
from k2transducerasr_tpu.utils.metrics import edit_distance, measure


def test_edit_distance_counts():
    assert edit_distance(list("abc"), list("abc")) == (0, 0, 0, 3)
    s, i, d, c = edit_distance("the cat sat".split(), "the bat sat down".split())
    assert (s, i, d) == (1, 1, 0)
    s, i, d, c = edit_distance("a b c".split(), "a c".split())
    assert (s, i, d) == (0, 0, 1)


def test_wer_and_cer():
    wer = measure(["the cat sat"], ["the bat sat"])
    assert wer.errors == 1 and wer.total == 3
    assert abs(wer.rate - 1 / 3) < 1e-9
    cer = measure(["你好世界"], ["你好地界"], unit="char")
    assert cer.errors == 1 and cer.total == 4


def test_wer_empty_hyp():
    wer = measure(["hello world"], [""])
    assert wer.deletions == 2 and wer.rate == 1.0


def test_endpoint_rules():
    cfg = EndpointConfig(frame_seconds=0.04)
    # rule1: long silence, nothing decoded
    assert is_endpoint(cfg, trailing_blank_frames=130, emitted_tokens=0, utterance_frames=150)
    assert not is_endpoint(cfg, 100, 0, 150)
    # rule2: shorter silence after text
    assert is_endpoint(cfg, 61, 5, 150)
    assert not is_endpoint(cfg, 50, 5, 150)
    # rule3: max utterance length
    assert is_endpoint(cfg, 0, 5, 501)


def test_hotwords_nbest_selection():
    nbest = ["call jon now", "call john now", "cole john now"]
    assert apply_hotwords(nbest, ["john"]) == "call john now"
    assert apply_hotwords(nbest, []) == "call jon now"
    assert apply_hotwords([], ["x"]) == ""
    # tie keeps higher rank
    assert apply_hotwords(["a john", "b john"], ["john"]) == "a john"


def test_hotwords_token_boost():
    one_best = ["▁CALL", "▁JON", "▁NOW"]
    alt = ["▁CALL", "▁JOHN", "▁NOW"]
    out = boost_tokens(one_best, [["▁JOHN"]], [alt])
    assert out == alt
    # already contains hotword -> unchanged
    assert boost_tokens(alt, [["▁JOHN"]], [one_best]) == alt
