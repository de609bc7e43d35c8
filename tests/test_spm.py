"""SentencePiece tokenizer tests against synthetic ModelProto files."""

import struct

import numpy as np
import pytest

from ptts_tpu.tokenizer.spm import SentencePieceModel

WS = "▁"  # ▁


# -- protobuf writer helpers -------------------------------------------------


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _len_field(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _varint(len(payload)) + payload


def make_piece(text: str, score: float, ptype: int = 1) -> bytes:
    body = _len_field(1, text.encode("utf-8"))
    body += _field(2, 5) + struct.pack("<f", score)
    body += _field(3, 0) + _varint(ptype)
    return body


def make_model(
    pieces,
    add_dummy_prefix=True,
    remove_extra_whitespaces=True,
    escape_whitespaces=True,
    treat_whitespace_as_suffix=False,
    charsmap: bytes = b"",
) -> bytes:
    buf = bytearray()
    for text, score, ptype in pieces:
        buf += _len_field(1, make_piece(text, score, ptype))
    trainer = _field(24, 0) + _varint(1 if treat_whitespace_as_suffix else 0)
    buf += _len_field(2, trainer)
    norm = bytearray()
    if charsmap:
        norm += _len_field(2, charsmap)
    norm += _field(3, 0) + _varint(1 if add_dummy_prefix else 0)
    norm += _field(4, 0) + _varint(1 if remove_extra_whitespaces else 0)
    norm += _field(5, 0) + _varint(1 if escape_whitespaces else 0)
    buf += _len_field(3, bytes(norm))
    return bytes(buf)


BASIC_PIECES = [
    ("<unk>", 0.0, 2),
    ("<s>", 0.0, 3),
    (WS + "hello", -1.0, 1),
    (WS + "world", -1.5, 1),
    (WS, -10.0, 1),
    ("h", -20.0, 1),
    ("e", -20.0, 1),
    ("l", -20.0, 1),
    ("o", -20.0, 1),
    ("w", -20.0, 1),
    ("r", -20.0, 1),
    ("d", -20.0, 1),
    (WS + "he", -8.0, 1),
    ("llo", -8.5, 1),
]


@pytest.fixture
def spm():
    return SentencePieceModel.from_bytes(make_model(BASIC_PIECES))


def test_load_fields(spm):
    assert spm.vocab_size == len(BASIC_PIECES)
    assert spm.unk_id == 0
    assert spm.add_dummy_prefix
    assert spm.escape_whitespaces
    assert spm.piece(2) == (WS + "hello").encode("utf-8")
    assert spm.piece(-1) is None and spm.piece(999) is None


def test_normalize_dummy_prefix_and_escape(spm):
    assert spm.normalize("hello world") == f"{WS}hello{WS}world".encode()
    # extra whitespace removal
    assert spm.normalize("  hello   world  ") == f"{WS}hello{WS}world".encode()


def test_encode_prefers_high_score_pieces(spm):
    ids = spm.encode("hello world")
    assert ids == [2, 3]  # ▁hello ▁world


def test_encode_viterbi_picks_best_split(spm):
    # "▁he" (-8.0) + "llo" (-8.5) = -16.5 worse than "▁hello" (-1.0)
    ids = spm.encode("hello")
    assert ids == [2]


def test_encode_unk_fallback(spm):
    ids = spm.encode("hellz")  # 'z' has no piece -> unk per char
    assert spm.unk_id in ids


def test_encode_char_decomposition(spm):
    ids = spm.encode("how")
    # '▁' + h,o,w single chars (no '▁how' piece; '▁he' doesn't match 'ho')
    pieces = [spm.piece(i).decode() for i in ids]
    assert "".join(pieces) == WS + "how"


def test_viterbi_matches_bruteforce(spm):
    """Independent exhaustive-DP check over all segmentations."""
    import itertools

    text = "hello world"
    norm = spm.normalize(text)
    table = {p.bytes_: (i, p.score) for i, p in enumerate(spm.pieces) if p.bytes_}

    best = {}

    def solve(pos):
        if pos == len(norm):
            return 0.0, []
        if pos in best:
            return best[pos]
        res = (float("-inf"), None)
        for end in range(pos + 1, len(norm) + 1):
            sub = norm[pos:end]
            if sub in table:
                pid, score = table[sub]
                tail_score, tail = solve(end)
                if tail is not None and score + tail_score > res[0]:
                    res = (score + tail_score, [pid] + tail)
        best[pos] = res
        return res

    _, expected = solve(0)
    assert spm.encode(text) == expected


def test_user_defined_pieces_bypass_normalization():
    pieces = BASIC_PIECES + [("<laugh>", 0.0, 4)]
    spm = SentencePieceModel.from_bytes(make_model(pieces))
    out = spm.normalize("hello <laugh>")
    assert b"<laugh>" in out
    ids = spm.encode("hello <laugh>")
    assert ids[-1] == len(pieces) - 1


def test_invalid_utf8_replaced():
    spm = SentencePieceModel.from_bytes(make_model(BASIC_PIECES))
    # lone continuation byte -> U+FFFD
    out = spm._normalize_prefix(b"\x80abc", 0)
    assert out == (b"\xef\xbf\xbd", 1)
    # overlong encoding rejected
    out = spm._normalize_prefix(b"\xe0\x80\x80", 0)
    assert out == (b"\xef\xbf\xbd", 1)
    # valid 2-byte char passes through
    out = spm._normalize_prefix("é".encode(), 0)
    assert out == ("é".encode(), 2)


def test_no_dummy_prefix_no_escape():
    spm = SentencePieceModel.from_bytes(
        make_model(
            [("<unk>", 0.0, 2), ("ab", -1.0, 1), (" ", -5.0, 1), ("a", -9.0, 1), ("b", -9.0, 1)],
            add_dummy_prefix=False,
            escape_whitespaces=False,
            remove_extra_whitespaces=False,
        )
    )
    assert spm.normalize("a b") == b"a b"
    ids = spm.encode("ab")
    assert [spm.piece(i) for i in ids] == [b"ab"]


def test_whitespace_as_suffix():
    spm = SentencePieceModel.from_bytes(
        make_model(
            [("<unk>", 0.0, 2), ("ab" + WS, -1.0, 1), ("ab", -3.0, 1), (WS, -5.0, 1)],
            treat_whitespace_as_suffix=True,
            # with merge-spaces on, the reference still emits a leading space
            # at the first non-ws char (ptts_spm.c:454-459); disable it here
            # to isolate the suffix behavior
            remove_extra_whitespaces=False,
        )
    )
    assert spm.normalize("ab") == ("ab" + WS).encode()
    assert spm.encode("ab") == [1]


def test_decode_roundtrip(spm):
    ids = spm.encode("hello world")
    assert spm.decode(ids) == "hello world"


def test_empty_encode(spm):
    assert spm.encode("") == []


# -- XCDA charsmap -----------------------------------------------------------


def _xcda_node(base: int, lcheck: int, leaf: bool, shift8: bool = False) -> int:
    """Pack an XCDA node: value = (base << 10) | (leaf << 8) | lcheck_lowbits.

    The accessors (ptts_spm.c:320-338) read:
      base  = (node >> 10) << ((node & (1<<9)) >> 6)
      lcheck = node & ((1<<31) | 0xff)
      leaf  = (node >> 8) & 1
    """
    assert 0 <= lcheck <= 0xFF
    node = (base << 10) | ((1 if shift8 else 0) << 9) | ((1 if leaf else 0) << 8) | lcheck
    return node


def test_charsmap_single_replacement():
    """Hand-build a tiny XCDA trie mapping byte 0x41 ('A') -> 'a'.

    Walk: node = base(root=idx0); node ^= c; lcheck(node)==c; leaf?;
    node ^= base(node); value(node) = replacement offset.
    """
    # root at index 0 with base=0 -> start node_index = 0
    # for c=0x41: node = 0 ^ 0x41 = 0x41 -> index 65 must have lcheck 0x41, leaf
    # then node ^= base(65); choose base(65)=0x41^2=67 -> node=2; value at idx 2 = 0
    arr = [0] * 70
    arr[0] = _xcda_node(0, 0, False)
    arr[65] = _xcda_node(65 ^ 2, 0x41, True)
    arr[2] = 0  # value node: offset 0 into replacement strings
    blob = struct.pack("<I", len(arr) * 4) + b"".join(struct.pack("<I", n) for n in arr)
    blob += b"a\x00"  # replacement strings

    pieces = [("<unk>", 0.0, 2), ("a", -1.0, 1), ("b", -1.0, 1), (WS, -1.0, 1)]
    spm = SentencePieceModel.from_bytes(
        make_model(pieces, charsmap=blob, add_dummy_prefix=False,
                   remove_extra_whitespaces=False)
    )
    assert spm._xcda_size == 70
    # 'b' is not in the trie: passes through as UTF-8; no spaces involved.
    assert spm.normalize("AbA") == b"aba"
    assert spm.normalize("A") == b"a"
    assert spm.normalize("AA") == b"aa"
    assert spm.normalize("bA") == b"ba"
