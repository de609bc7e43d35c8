"""prepare_text / estimate_frames parity tests (ptts.c:219-291 semantics)."""

import pytest

from ptts_tpu.text import EmptyPromptError, estimate_frames, prepare_text


def test_basic():
    prepared, words, eos_after = prepare_text("hello world")
    # 2 words -> capitalized, '.' appended, <5 words -> 8-space pad, eos_after=5
    assert prepared == "        Hello world."
    assert words == 2
    assert eos_after == 5


def test_whitespace_collapse():
    prepared, words, eos_after = prepare_text("  foo\t\tbar\nbaz  qux quux extra ")
    assert prepared == "Foo bar baz qux quux extra."
    assert words == 6
    assert eos_after == 3


def test_trailing_punctuation_not_doubled():
    prepared, _, _ = prepare_text("this is five words now!")
    assert prepared == "This is five words now!"  # '!' is not alnum -> no '.'


def test_first_alpha_capitalized_past_digits():
    prepared, _, _ = prepare_text("123 abc def ghi jkl")
    assert prepared == "123 Abc def ghi jkl."


def test_exactly_four_words_padded():
    prepared, words, eos_after = prepare_text("one two three four")
    assert words == 4
    assert eos_after == 5
    assert prepared.startswith(" " * 8)


def test_five_words_not_padded():
    prepared, words, eos_after = prepare_text("one two three four five")
    assert words == 5
    assert eos_after == 3
    assert not prepared.startswith(" ")


def test_empty_raises():
    with pytest.raises(EmptyPromptError):
        prepare_text("   \n\t ")


def test_unicode_passthrough():
    prepared, words, _ = prepare_text("héllo wörld")
    # 'h' is ASCII alpha -> uppercased; accents pass through untouched
    assert prepared == "        Héllo wörld."
    assert words == 2


def test_estimate_frames():
    # frames = (words + 2) * 12.5
    assert estimate_frames(2) == 50
    assert estimate_frames(1) == 37  # 3 * 12.5 = 37.5 -> int() truncation
    assert estimate_frames(0) == 37  # clamps to 1 word
    assert estimate_frames(10) == 150
