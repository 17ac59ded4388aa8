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


def test_hidden_descriptions_match(refmod):
    assert markers.HIDDEN_DESCRIPTIONS == {
        ord(c): d for c, d in refmod.HIDDEN_MARKERS.items()}


def test_typographic_descriptions_match(refmod):
    assert markers.TYPOGRAPHIC_DESCRIPTIONS == {
        ord(c): d for c, d in refmod.TYPOGRAPHIC_MARKERS.items()}


def test_ivs_descriptions_match(refmod):
    for c, d in refmod.IDEOGRAPHIC_VS_MARKERS.items():
        assert markers.ivs_description(ord(c)) == d


def test_desc_lut_covers_every_marker():
    from hidden_characters_detector_spark.functions import kernel
    import numpy as np
    cps = (sorted(markers.HIDDEN_CODEPOINTS)
           + sorted(markers.TYPOGRAPHIC_CODEPOINTS)
           + [markers.IVS_LO, markers.IVS_HI])
    idx = kernel.DESC_IDX_LUT[np.asarray(cps)]
    assert (idx > 0).all()
    assert kernel.DESC_STRINGS[kernel.DESC_IDX_LUT[0x200B]] \
        == markers.HIDDEN_DESCRIPTIONS[0x200B]
    assert kernel.DESC_STRINGS[kernel.DESC_IDX_LUT[0x2019]] \
        == markers.TYPOGRAPHIC_DESCRIPTIONS[0x2019]
    # non-markers map to the null slot
    assert kernel.DESC_IDX_LUT[ord("a")] == 0
