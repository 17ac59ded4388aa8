"""Differential parity: kernel vs the reference detector run end-to-end.

Contract (BASELINE.json input_hint / FIXTURES.md): for every fixture text,
``tokens_clean == [ord(c) for c in reference_cleaned_text]`` plus equality of
``(n_detected, n_processed, had_marker)`` — under full-clean flags and the
detect-only / flag-variant matrix.  All marker codepoints are written as
explicit escapes so fixtures are byte-deterministic.
"""

from __future__ import annotations

import random

import pytest

from hidden_characters_detector_spark.functions import kernel
from hidden_characters_detector_spark.functions.kernel import DetectorConfig

# --- the FIXTURES.md pattern matrix ----------------------------------------
PATTERNS = {
    "zwsp_embed": "Hello​world and mid‌word j‍oin w⁠ord",
    "bom_lead": "﻿leading bom line\nsecond line",
    "bom_mid": "first\n﻿second line with ﻿ mid",
    "bidi_override": "user‮txt.exe and ⁦iso⁧late⁨s⁩ "
                     "‪emb‫ed‬s‭!",
    "nbsp_precedence": "A B",
    "exotic_spaces": "a b c d e f g h"
                     " i j k l m n　o"
                     "᠎p͏q­r",
    "variation_selectors": "x︀y︍z᠋᠌᠍ end",
    "emoji_vs16": "hi ❤️ there",
    "fe0f_linestart": "line one\n️starts line two",
    "ivs_range": "一\U000e0101 and 丁\U000e0100 丂\U000e01ef",
    "smart_quotes": "“text” and ‘more’",
    "dashes": "a–b—c‒d―e−f﹣g⁒h‐"
              "i‑j",
    "expansion": "a‥b and ell…ipsis",
    "dead_rules": "dots… bullet• low„quote",
    "homoglyph_mixed": "Аpple соde",
    "fullwidth_punct": "！？：；，．／＇",
    "greek_question": "why;",
    "detect_only_typo": "tri⁙colon four⁚dot áccent "
                        "mˈark trip‴rime",
    "clean_text": "plain ascii text with no markers at all",
    "multiline": "one​two\nthree—four\n\nfinal‍\n",
    "trailing_marker_before_newline": "end​\nnext",
    "empty": "",
    "only_markers": "​‌‍",
    "newline_only": "\n\n\n",
    "apostrophes": "caf´e pri′me dou″ble rev‵ r‶ "
                   "comʻma apʼo ringʾ f＇w",
    "commas_slashes": "a،b‚c﹐d，e f⁄g∕h／i",
    "dots": "m·id b∙op tri‣b one․dot hy‧p id。"
            "full sm﹒all f．ull",
    "colons": "s﹕c s﹖s f：c f；s",
    "bang": "clickǃ full！",
    "primes_detect_only": "tr‴iple",
}

FLAG_MATRIX = [
    dict(clean=True, check_typographic=True, check_ivs=True),
    dict(clean=True, check_typographic=False, check_ivs=False),
    dict(clean=True, check_typographic=True, check_ivs=False),
    dict(clean=False, check_typographic=True, check_ivs=True),
    dict(clean=False, check_typographic=False, check_ivs=False),
]


def run_both(oracle, text, **flags):
    exp = oracle.run(text, **flags)
    cfg = DetectorConfig(
        clean=flags.get("clean", True),
        check_typographic=flags.get("check_typographic", True),
        check_ivs=flags.get("check_ivs", True),
        exclude_word_chars=flags.get("exclude_word_chars", False),
        excluded=frozenset(flags.get("excluded", frozenset())),
    )
    toks = [ord(c) for c in text]
    res = kernel.clean_rows([toks], cfg, emit_events=True)
    got_tokens = res.out_tokens[
        res.out_offsets[0]:res.out_offsets[1]].tolist()
    return exp, res, got_tokens


@pytest.mark.parametrize("name", sorted(PATTERNS))
@pytest.mark.parametrize("flags", FLAG_MATRIX,
                         ids=lambda f: f"c{int(f['clean'])}t"
                         f"{int(f['check_typographic'])}i{int(f['check_ivs'])}")
def test_pattern_parity(oracle, name, flags):
    text = PATTERNS[name]
    exp, res, got = run_both(oracle, text, **flags)
    assert got == exp["tokens_clean"], name
    assert int(res.n_detected[0]) == exp["n_detected"], name
    assert int(res.n_processed[0]) == exp["n_processed"], name
    assert bool(res.had_marker[0]) == exp["had_marker"], name


def test_excluded_chars(oracle):
    text = "zw​sp and nb sp"
    exp, res, got = run_both(oracle, text, clean=True, check_typographic=True,
                             check_ivs=True, excluded=frozenset({0x200B}))
    assert got == exp["tokens_clean"]
    assert 0x200B in got                          # ZWSP untouched
    assert 0x00A0 not in got                      # NBSP removed
    assert int(res.n_detected[0]) == exp["n_detected"]


def test_word_mode(oracle):
    text = "“quoted” en–dash nb sp ell…ipsis"
    exp, res, got = run_both(oracle, text, clean=True, check_typographic=True,
                             check_ivs=True, exclude_word_chars=True)
    assert got == exp["tokens_clean"]
    assert got == [ord(c) for c in text]  # everything untouched


def test_bom_detect_only_unreported(oracle):
    exp, res, got = run_both(oracle, "﻿hello", clean=False,
                             check_typographic=True, check_ivs=True)
    assert exp["n_detected"] == 0 and exp["had_marker"] is False
    assert int(res.n_detected[0]) == 0 and not bool(res.had_marker[0])


def test_bom_clean_counts(oracle):
    exp, res, got = run_both(oracle, "﻿hello", clean=True,
                             check_typographic=True, check_ivs=True)
    assert got == [ord(c) for c in "hello"]
    assert int(res.n_detected[0]) == 1 == exp["n_detected"]
    assert int(res.n_processed[0]) == 1 == exp["n_processed"]
    # event action is the BOM special case
    assert res.ev_action.tolist() == [kernel.ACT_BOM]


def test_processed_count_quirk(oracle):
    # a changed line counts ALL its reports as processed, including
    # detect-only typographic ones (ref :750-753); an unchanged line with
    # detect-only reports contributes 0 processed
    text = "a​b tri⁙colon\nonly tri⁙colon here\n"
    exp, res, got = run_both(oracle, text, clean=True, check_typographic=True,
                             check_ivs=True)
    assert got == exp["tokens_clean"]
    assert int(res.n_detected[0]) == exp["n_detected"] == 3
    assert int(res.n_processed[0]) == exp["n_processed"] == 2


def test_expansion_lengths(oracle):
    exp, res, got = run_both(oracle, "a‥b", clean=True,
                             check_typographic=True, check_ivs=True)
    assert got == [ord(c) for c in "a..b"]
    assert len(got) == 4  # output longer than the 3-token input


def test_multirow_batch(oracle):
    texts = list(PATTERNS.values())
    cfg = DetectorConfig()
    res = kernel.clean_rows([[ord(c) for c in t] for t in texts], cfg,
                            emit_events=True)
    for i, t in enumerate(texts):
        exp = oracle.run(t)
        got = res.out_tokens[res.out_offsets[i]:res.out_offsets[i + 1]].tolist()
        assert got == exp["tokens_clean"], t
        assert int(res.n_detected[i]) == exp["n_detected"], t
        assert int(res.n_processed[i]) == exp["n_processed"], t
        assert bool(res.had_marker[i]) == exp["had_marker"], t
    # events grouped per row and consistent with detected counts
    assert res.ev_offsets[-1] == res.n_detected.sum()


MARKER_POOL = (
    [0x200B, 0x200C, 0x200D, 0x2060, 0xFEFF, 0x00A0, 0x202F, 0x202E, 0x2066,
     0xFE00, 0xFE0F, 0x180B, 0x00AD, 0x2063]
    + [0x2013, 0x2014, 0x2018, 0x2019, 0x201C, 0x201D, 0x2025, 0x2026,
       0x2022, 0x2059, 0x0410, 0x0441, 0x043E, 0xFF01, 0x037E, 0x0301]
    + [0xE0100, 0xE0150, 0xE01EF]
)
BASE_POOL = [ord(c) for c in
             "abcdefghijklmnopqrstuvwxyz ABCDEFXYZ0123456789.,!?-'\"\t"] \
    + [0x4E2D, 0x6587, 0x1F600, 0x2764, 0x00E9]


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("flags", FLAG_MATRIX[:4],
                         ids=["full", "hidden_only", "no_ivs", "detect"])
def test_randomized_differential(oracle, seed, flags):
    rng = random.Random(42 + seed)
    rows = []
    for _ in range(30):
        n = rng.randint(0, 60)
        toks = []
        for _ in range(n):
            r = rng.random()
            if r < 0.25:
                toks.append(rng.choice(MARKER_POOL))
            elif r < 0.30:
                toks.append(0x0A)
            else:
                toks.append(rng.choice(BASE_POOL))
        rows.append(toks)
    cfg = DetectorConfig(clean=flags["clean"],
                         check_typographic=flags["check_typographic"],
                         check_ivs=flags["check_ivs"])
    res = kernel.clean_rows(rows, cfg)
    for i, toks in enumerate(rows):
        text = "".join(map(chr, toks))
        exp = oracle.run(text, **flags)
        got = res.out_tokens[res.out_offsets[i]:res.out_offsets[i + 1]].tolist()
        assert got == exp["tokens_clean"], (i, toks)
        assert int(res.n_detected[i]) == exp["n_detected"], (i, toks)
        assert int(res.n_processed[i]) == exp["n_processed"], (i, toks)
        assert bool(res.had_marker[i]) == exp["had_marker"], (i, toks)


@pytest.mark.parametrize("flags", FLAG_MATRIX,
                         ids=lambda f: f"c{int(f['clean'])}t"
                         f"{int(f['check_typographic'])}i{int(f['check_ivs'])}")
def test_exhaustive_marker_sweep(oracle, flags):
    """Every marker codepoint in the inventory, each in ascii context."""
    from hidden_characters_detector_spark import markers as mk
    cps = sorted(mk.HIDDEN_CODEPOINTS | mk.TYPOGRAPHIC_CODEPOINTS
                 | {mk.IVS_LO, mk.IVS_LO + 1, mk.IVS_HI}
                 | {0x2026, 0x2022, 0x201E})  # dead rules too
    text = "x".join(chr(cp) for cp in cps)
    exp, res, got = run_both(oracle, text, **flags)
    assert got == exp["tokens_clean"]
    assert int(res.n_detected[0]) == exp["n_detected"]
    assert int(res.n_processed[0]) == exp["n_processed"]


def test_family_counts_sum_to_detected():
    rows = [[ord(c) for c in t] for t in PATTERNS.values()]
    for cfg in (DetectorConfig(), DetectorConfig(clean=False)):
        res = kernel.clean_rows(rows, cfg)
        assert (res.n_hidden + res.n_ivs + res.n_typo
                == res.n_detected).all()


@pytest.mark.parametrize("seed", range(4))
def test_sparse_core_equals_dense(seed):
    """The memory-lean sparse core == the dense implementation on
    newline-heavy random corpora (both event and non-event paths)."""
    rng = random.Random(1000 + seed)
    rows = []
    for _ in range(60):
        n = rng.randint(0, 80)
        rows.append([
            rng.choice(MARKER_POOL) if rng.random() < 0.3
            else (0x0A if rng.random() < 0.15 else rng.choice(BASE_POOL))
            for _ in range(n)])
    lengths = [len(r) for r in rows]
    offsets = [0]
    for ln in lengths:
        offsets.append(offsets[-1] + ln)
    import numpy as np
    flat = np.array([t for r in rows for t in r], dtype=np.int64)
    off = np.array(offsets, dtype=np.int64)
    for cfg in (DetectorConfig(), DetectorConfig(clean=False),
                DetectorConfig(check_ivs=False),
                DetectorConfig(excluded=frozenset({0x200B}))):
        a = kernel.clean_flat(flat, off, cfg, emit_events=True)
        b = kernel.clean_flat_dense(flat, off, cfg, emit_events=True)
        assert a.out_tokens.tolist() == b.out_tokens.tolist()
        assert a.out_offsets.tolist() == b.out_offsets.tolist()
        for f in ("n_detected", "n_processed", "had_marker", "n_hidden",
                  "n_ivs", "n_typo", "ev_offsets", "ev_line_no", "ev_idx",
                  "ev_token", "ev_type", "ev_action"):
            assert getattr(a, f).tolist() == getattr(b, f).tolist(), f
