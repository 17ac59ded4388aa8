"""CLI config-surface parity: --exclude-char parsing vs the reference.

Differential test of ``parse_excluded_chars`` against the reference CLI's
``_parse_excluded_chars`` (ref :969-989) over the full accept/reject matrix,
plus the argparse -> DetectorConfig wiring of scripts/run_pipeline.py.
"""

from __future__ import annotations

import pytest

from hidden_characters_detector_spark.functions.kernel import (
    parse_excluded_chars)


class _QuietLogger:
    def debug(self, *a, **k):
        pass

    def error(self, *a, **k):
        pass

    def red(self, s):
        return s


VALID_CASES = [
    ["U+200B"],
    ["200B"],
    ["200b"],                 # lowercase hex
    ["x"],                    # literal char
    ["0041"],
    ["U+0041"],
    ["e0100", "U+E01EF"],     # IVS endpoints, mixed styles
    ["0000"],                 # NUL is accepted
    ["U+A"],                  # trap: len-1 after prefix strip -> literal 'A'
    [" 200B "],               # stripped
    ["10FFFF"],               # max codepoint, 6 hex digits
    ["U+200B", "x", "2014"],  # repeatable, mixed
    ["§"],                    # non-ASCII literal
]

INVALID_CASES = [
    ["U+"],
    ["GGGG"],       # alnum, not hex
    ["12"],         # wrong length, not single char
    ["abc"],        # len 3
    ["110000"],     # beyond U+10FFFF -> chr() range error
    ["1234567"],    # too long
    [""],
    ["U+20 0B"],    # space inside -> not alnum
    ["200B", "zz"],  # one bad token poisons the call
]


@pytest.mark.parametrize("vals", VALID_CASES)
def test_parse_matches_reference_valid(refmod, vals):
    ref = refmod._parse_excluded_chars(list(vals), _QuietLogger())
    got = parse_excluded_chars(vals)
    assert got == frozenset(ord(c) for c in ref)


@pytest.mark.parametrize("vals", INVALID_CASES)
def test_parse_matches_reference_invalid(refmod, vals):
    with pytest.raises(SystemExit):
        refmod._parse_excluded_chars(list(vals), _QuietLogger())
    with pytest.raises(ValueError):
        parse_excluded_chars(vals)


def test_run_pipeline_config_wiring():
    """argparse -> DetectorConfig mirrors the reference from_args."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "run_pipeline", os.path.join(os.path.dirname(__file__), "..",
                                     "scripts", "run_pipeline.py"))
    rp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rp)

    import argparse

    ns = argparse.Namespace(exclude_char=["U+200B", "x"], word=True,
                            no_typographic=True, no_ivs=False,
                            detect_only=True)
    cfg = rp.build_config(ns)
    assert cfg.excluded == frozenset({0x200B, ord("x")})
    assert cfg.exclude_word_chars and not cfg.check_typographic
    assert cfg.check_ivs and not cfg.clean

    ns_bad = argparse.Namespace(exclude_char=["zz"], word=False,
                                no_typographic=False, no_ivs=False,
                                detect_only=False)
    with pytest.raises(SystemExit):
        rp.build_config(ns_bad)
