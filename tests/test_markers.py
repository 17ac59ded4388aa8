"""Table parity: our codepoint tables == the reference module's, exactly."""

from hidden_characters_detector_spark import markers


def test_hidden_set_matches(refmod):
    assert markers.HIDDEN_CODEPOINTS == {
        ord(c) for c in refmod.MARKER_CHARS_HIDDEN}


def test_typographic_set_matches(refmod):
    assert markers.TYPOGRAPHIC_CODEPOINTS == {
        ord(c) for c in refmod.MARKER_CHARS_TYPOGRAPHIC}


def test_ivs_set_matches(refmod):
    assert markers.IVS_CODEPOINTS == {
        ord(c) for c in refmod.MARKER_CHARS_IDEOGRAPHIC_VS}


def test_word_common_matches(refmod):
    assert markers.WORD_COMMON_CODEPOINTS == {
        ord(c) for c in refmod.WORD_COMMON_CHARS}


def test_replacement_map_matches(refmod):
    ref = {ord(k): tuple(ord(c) for c in v)
           for k, v in refmod.TYPOGRAPHIC_REPLACEMENTS.items()}
    assert markers.REPLACEMENT_MAP == ref


def test_every_live_replacement_differs_from_key():
    # the kernel's `changed` computation relies on this (ref :698-699 would
    # emit "Detected (Rule: no change)" otherwise)
    for cp, out in markers.LIVE_REPLACEMENTS.items():
        assert out != (cp,)


def test_dead_rules():
    # U+2026 / U+2022 have replacements but are not markers; U+201E is only
    # a Word-common char (SURVEY.md §2.2 dead-rule facts)
    for cp in (0x2026, 0x2022):
        assert cp in markers.REPLACEMENT_MAP
        assert cp not in markers.TYPOGRAPHIC_CODEPOINTS
    assert 0x201E in markers.WORD_COMMON_CODEPOINTS
    assert 0x201E not in markers.TYPOGRAPHIC_CODEPOINTS
    assert 0x201E not in markers.REPLACEMENT_MAP


def test_hidden_beats_typographic_overlap():
    # NBSP & friends live in HIDDEN and in REPLACEMENT_MAP but not in the
    # typographic marker set -> removal wins, replacement half is dead
    overlap = markers.HIDDEN_CODEPOINTS & markers.TYPOGRAPHIC_CODEPOINTS
    assert overlap == frozenset()
    assert 0x00A0 in markers.HIDDEN_CODEPOINTS
    assert 0x00A0 in markers.REPLACEMENT_MAP
    assert 0x00A0 not in markers.LIVE_REPLACEMENTS
