import numpy as np

from k2transducerasr_tpu.text.bytebpe import (
    BYTE_TO_BCHAR,
    byte_decode,
    byte_encode,
    smart_byte_decode,
)
from k2transducerasr_tpu.text.postprocess import finalize_text, is_cjk, tokens_to_text
from k2transducerasr_tpu.text.symbol_table import SymbolTable


def test_byte_table_shape():
    # 256 distinct printable chars; ASCII printable maps to itself
    assert len(set(BYTE_TO_BCHAR.values())) == 256
    assert BYTE_TO_BCHAR[65] == "A"
    assert BYTE_TO_BCHAR[32] == " "
    assert ord(BYTE_TO_BCHAR[0]) == 256
    assert ord(BYTE_TO_BCHAR[255]) == 422
    # the six skipped non-keyboard letters never appear
    for cp in (306, 307, 319, 320, 329, 383):
        assert chr(cp) not in BYTE_TO_BCHAR.values()


def test_byte_roundtrip():
    for s in ["hello world", "你好世界", "mixed 中文 and English", "émigré café"]:
        assert byte_decode(byte_encode(s)) == s


def test_smart_decode_recovers_truncated_utf8():
    enc = byte_encode("中文")  # 6 bytes
    # drop one trailing byte-char: plain decode fails, smart decode recovers 中
    assert byte_decode(enc[:-1]) == ""
    assert smart_byte_decode(enc[:-1]) == "中"


def test_smart_decode_identity_on_plain_text():
    assert smart_byte_decode(" after early nightfall") == " after early nightfall"


def _table(symbols):
    return SymbolTable([f"{s}" for s in symbols])


def test_tokens_to_text_bpe_english():
    table = _table(["<blk>", "<sos/eos>", "<unk>", "▁AFTER", "▁EARLY", "▁NIGHT", "FALL"])
    ids = [0, 0, 3, 4, 5, 6]
    assert tokens_to_text(ids, table) == " after early nightfall"


def test_tokens_to_text_cjk():
    table = _table(["<blk>", "<sos/eos>", "<unk>", "你", "好"])
    assert tokens_to_text([3, 4], table) == "你好"
    assert is_cjk("你好") and not is_cjk("a你")


def test_tokens_to_text_breaks_at_two_and_skips_neg1():
    table = _table(["<blk>", "<sos/eos>", "<unk>", "▁A", "▁B"])
    assert tokens_to_text([-1, 3, 2, 4], table) == " a"


def test_hex_byte_tokens():
    # "中" = E4 B8 AD
    table = _table(["<blk>", "<sos/eos>", "<unk>", "<0xE4>", "<0xB8>", "<0xAD>"])
    assert tokens_to_text([3, 4, 5], table) == "中"


def test_hex_run_with_invalid_tail():
    assert finalize_text("<0xE4><0xB8><0xAD><0xE4>") == "中"


def test_symbol_table_parsing(tmp_path):
    p = tmp_path / "tokens.txt"
    p.write_text("<blk> 0\n<sos/eos> 1\n<unk> 2\n▁THE 3\n", encoding="utf-8")
    t = SymbolTable.from_file(str(p))
    assert len(t) == 4
    assert t[3] == "▁THE"
    assert t.id_of("<unk>") == 2
