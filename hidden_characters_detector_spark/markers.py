"""Unicode marker codepoint tables, as *data*.

These tables reproduce, codepoint for codepoint, the marker inventory of the
reference detector (``/root/reference/hidden-characters-detector.py``):

* hidden markers            -> ``HIDDEN_MARKERS``          (ref :39-110)
* typographic markers       -> ``TYPOGRAPHIC_MARKERS``     (ref :113-224)
* MS-Word common chars      -> ``WORD_COMMON_CHARS``       (ref :227-247)
* replacement rules         -> ``TYPOGRAPHIC_REPLACEMENTS``(ref :255-406)
* ideographic VS range      -> ``IDEOGRAPHIC_VS_MARKERS``  (ref :409-412)

Everything here is expressed over ``int`` codepoints (the engine's token type)
rather than 1-char strings; ``tests/test_markers.py`` asserts equality against
the reference module imported from source, so any transcription slip fails CI.

Dead-rule facts preserved by construction (SURVEY.md SS2.2):

* U+2026 / U+2022 have replacement entries but are NOT typographic markers
  (commented out at ref :124-125) -> never detected, never replaced.
* U+201E is only a Word-common char (ref :245) -> never detected.
* The whitespace/zero-width half of the replacement map (ref :383-405) is dead
  for cleaning because those codepoints are hidden markers and the hidden
  branch wins (ref :674 ``if`` before :694 ``elif``).
"""

from __future__ import annotations

NEWLINE = 0x0A  # line unit separator inside a token sequence (ref :740-742)
BOM = 0xFEFF
VS16 = 0xFE0F

# --- hidden markers (ref :39-110) ------------------------------------------
_ZERO_WIDTH = (0x200B, 0x200C, 0x200D, 0x2060, BOM)
_ODD_SPACES = (0x00A0, 0x202F) + tuple(range(0x2000, 0x200B)) + (0x205F, 0x3000)
_INVISIBLE = (0x180E, 0x034F, 0x00AD)
_DIRECTIONAL = (
    0x200E, 0x200F, 0x202A, 0x202B, 0x202C, 0x202D, 0x202E,
    0x2061, 0x2062, 0x2063, 0x2064,  # invisible math operators
    0x2066, 0x2067, 0x2068, 0x2069,  # bidi isolates
)
_VARIATION_SELECTORS = tuple(range(0xFE00, 0xFE10))  # VS1..VS16
_MONGOLIAN_FVS = (0x180B, 0x180C, 0x180D)

HIDDEN_CODEPOINTS: frozenset[int] = frozenset(
    _ZERO_WIDTH + _ODD_SPACES + _INVISIBLE + _DIRECTIONAL
    + _VARIATION_SELECTORS + _MONGOLIAN_FVS
)

# --- typographic markers (ref :113-224) ------------------------------------
_DASH_MARKERS = (0x2010, 0x2011, 0x2013, 0x2014, 0x2012, 0x2015, 0x2212, 0xFE63)
_QUOTE_MARKERS = (0x2018, 0x2019, 0x201C, 0x201D)
_DOT_MARKERS = (0x00B7, 0x2219, 0x2023, 0x2024, 0x2025, 0x2027, 0x2059,
                0x3002, 0xFE52, 0x205A)
_APOSTROPHE_MARKERS = (0x00B4, 0x02B9, 0x02BB, 0x02BC, 0x02C8, 0x0301)
_PRIME_MARKERS = (0x2032, 0x2033, 0x2034, 0x2035, 0x2036)
_SUBTLE_MARKERS = (0x2052, 0x02BE, 0xFF0E, 0xFF0C, 0xFF07)
_COMMA_MARKERS = (0x060C, 0x201A, 0xFE50)
_SLASH_MARKERS = (0x2044, 0x2215, 0xFF0F)
_BANG_MARKERS = (0x01C3, 0xFF01)
_QUESTION_MARKERS = (0x037E, 0xFF1F)
_COLON_MARKERS = (0xFE55, 0xFE56, 0xFF1A, 0xFF1B)
# Greek/Cyrillic homoglyphs of Latin letters (ref :191-223)
_HOMOGLYPH_MARKERS = (
    0x0391, 0x0410, 0x0421, 0x0395, 0x0415, 0x0397, 0x041D, 0x0399, 0x0406,
    0x0408, 0x039A, 0x039C, 0x041C, 0x039F, 0x041E, 0x03A1, 0x0420, 0x0405,
    0x03A4, 0x03A7, 0x0425, 0x03A5, 0x0430, 0x0441, 0x0435, 0x0456, 0x0458,
    0x03BF, 0x043E, 0x0440, 0x0445, 0x0443,
)

TYPOGRAPHIC_CODEPOINTS: frozenset[int] = frozenset(
    _DASH_MARKERS + _QUOTE_MARKERS + _DOT_MARKERS + _APOSTROPHE_MARKERS
    + _PRIME_MARKERS + _SUBTLE_MARKERS + _COMMA_MARKERS + _SLASH_MARKERS
    + _BANG_MARKERS + _QUESTION_MARKERS + _COLON_MARKERS + _HOMOGLYPH_MARKERS
)

# --- MS-Word auto-edit chars (ref :227-247), merged into the user-excluded
# set under --word (ref :597-599) --------------------------------------------
WORD_COMMON_CODEPOINTS: frozenset[int] = frozenset((
    0x2018, 0x2019, 0x201C, 0x201D,   # smart quotes
    0x2013, 0x2014,                   # dashes
    0x2026, 0x00A0, 0x2022,           # ellipsis, nbsp, bullet
    0x201A, 0x201E, 0x2011,           # low-9 quotes, nb hyphen
))

# --- replacement rules (ref :255-406), keyed by codepoint, value = tuple of
# output codepoints (possibly 1->N expansion, possibly empty = removal) ------
def _repl(mapping: dict[int, str]) -> dict[int, tuple[int, ...]]:
    return {cp: tuple(ord(c) for c in out) for cp, out in mapping.items()}


REPLACEMENT_MAP: dict[int, tuple[int, ...]] = _repl({
    # smart quotes -> straight quotes
    0x2018: "'", 0x2019: "'", 0x201C: '"', 0x201D: '"',
    # dash family -> hyphen-minus
    **{cp: "-" for cp in (0x2010, 0x2011, 0x2013, 0x2014, 0x2012, 0x2015,
                          0x2212, 0xFE63, 0x2052)},
    # dots / bullets / ellipsis (U+2026/U+2022 live here but are dead rules:
    # not in TYPOGRAPHIC_CODEPOINTS); note the 1->N expansions
    0x2026: "...", 0x00B7: ".", 0x2219: ".", 0x2022: "*", 0x2023: "*",
    0x2024: ".", 0x2025: "..", 0x2027: ".", 0x3002: ".", 0xFE52: ".",
    0xFF0E: ".",
    # apostrophe-ish / primes
    0x00B4: "'", 0x02B9: "'", 0x02BB: "'", 0x02BC: "'", 0x02BE: "'",
    0x2032: "'", 0x2033: '"', 0x2035: "'", 0x2036: '"', 0xFF07: "'",
    # commas
    0x060C: ",", 0x201A: ",", 0xFE50: ",", 0xFF0C: ",",
    # slashes
    0x2044: "/", 0x2215: "/", 0xFF0F: "/",
    # exclamation / question
    0x01C3: "!", 0xFF01: "!", 0x037E: ";", 0xFF1F: "?",
    # colons / semicolons
    0xFE55: ":", 0xFE56: ";", 0xFF1A: ":", 0xFF1B: ";",
    # homoglyph folding -> Latin ASCII
    0x0391: "A", 0x0410: "A", 0x0421: "C", 0x0395: "E", 0x0415: "E",
    0x0397: "H", 0x041D: "H", 0x0399: "I", 0x0406: "I", 0x0408: "J",
    0x039A: "K", 0x039C: "M", 0x041C: "M", 0x039F: "O", 0x041E: "O",
    0x03A1: "P", 0x0420: "P", 0x0405: "S", 0x03A4: "T", 0x03A7: "X",
    0x0425: "X", 0x03A5: "Y", 0x0430: "a", 0x0441: "c", 0x0435: "e",
    0x0456: "i", 0x0458: "j", 0x03BF: "o", 0x043E: "o", 0x0440: "p",
    0x0445: "x", 0x0443: "y",
    # whitespace normalizations (dead for cleaning: all are hidden markers,
    # and hidden removal wins -- kept for table parity with ref :383-398)
    **{cp: " " for cp in (0x00A0,) + tuple(range(0x2000, 0x200B))
       + (0x202F, 0x3000)},
    # zero-width removals (same dead-rule situation, ref :400-405)
    **{cp: "" for cp in (0x00AD, 0x200B, 0x200C, 0x200D, 0xFEFF)},
})

# --- ideographic variation selectors VS17..VS256 (ref :409-412) -------------
IVS_LO, IVS_HI = 0xE0100, 0xE01EF
IVS_CODEPOINTS: frozenset[int] = frozenset(range(IVS_LO, IVS_HI + 1))

# The *live* replacement gate: a codepoint is replaced iff it is detected as a
# typographic marker AND has a replacement rule (ref :696-698).
LIVE_REPLACEMENTS: dict[int, tuple[int, ...]] = {
    cp: out for cp, out in REPLACEMENT_MAP.items()
    if cp in TYPOGRAPHIC_CODEPOINTS
}

# Typographic markers that are detected but never replaced (ref :287 comment;
# e.g. U+2059 Tricolon, U+205A Four Dot Mark, U+02C8, U+0301, U+2034).
DETECT_ONLY_TYPOGRAPHIC: frozenset[int] = (
    TYPOGRAPHIC_CODEPOINTS - frozenset(LIVE_REPLACEMENTS)
)

MAX_REPLACEMENT_LEN = max(len(v) for v in REPLACEMENT_MAP.values())

# --- human-readable marker descriptions (ref :39-110, :113-224, :409-412) ---
# Emitted verbatim in detection events (MarkerReport.description, ref :527);
# the strings ARE the reference's spec data (public Unicode character names)
# and are asserted equal to the reference module in tests/test_markers.py.
HIDDEN_DESCRIPTIONS: dict[int, str] = {
    0x200B: 'Zero Width Space (U+200B)',
    0x200C: 'Zero Width Non-Joiner (U+200C)',
    0x200D: 'Zero Width Joiner (U+200D)',
    0x2060: 'Word Joiner (U+2060)',
    0xFEFF: 'Byte Order Mark (BOM) / Zero Width No-Break Space (U+FEFF)',
    0x00A0: 'Non-Breaking Space (U+00A0)',
    0x202F: 'Narrow No-Break Space (U+202F)',
    0x2000: 'En Quad (U+2000)',
    0x2001: 'Em Quad (U+2001)',
    0x2002: 'En Space (U+2002)',
    0x2003: 'Em Space (U+2003)',
    0x2004: 'Three-Per-Em Space (U+2004)',
    0x2005: 'Four-Per-Em Space (U+2005)',
    0x2006: 'Six-Per-Em Space (U+2006)',
    0x2007: 'Figure Space (U+2007)',
    0x2008: 'Punctuation Space (U+2008)',
    0x2009: 'Thin Space (U+2009)',
    0x200A: 'Hair Space (U+200A)',
    0x205F: 'Medium Mathematical Space (U+205F)',
    0x3000: 'Ideographic Space (U+3000)',
    0x180E: 'Mongolian Vowel Separator (U+180E)',
    0x034F: 'Combining Grapheme Joiner (U+034F)',
    0x00AD: 'Soft Hyphen (U+00AD)',
    0x200E: 'Left-to-Right Mark',
    0x200F: 'Right-to-Left Mark',
    0x202A: 'Left-to-Right Embedding',
    0x202B: 'Right-to-Left Embedding',
    0x202C: 'Pop Directional Formatting',
    0x202D: 'Left-to-Right Override',
    0x202E: 'Right-to-Left Override',
    0x2061: 'Function Application',
    0x2062: 'Invisible Times',
    0x2063: 'Invisible Separator',
    0x2064: 'Invisible Plus',
    0x2066: 'Left-to-Right Isolate',
    0x2067: 'Right-to-Left Isolate',
    0x2068: 'First Strong Isolate',
    0x2069: 'Pop Directional Isolate',
    0xFE00: 'Variation Selector-1 (U+FE00)',
    0xFE01: 'Variation Selector-2 (U+FE01)',
    0xFE02: 'Variation Selector-3 (U+FE02)',
    0xFE03: 'Variation Selector-4 (U+FE03)',
    0xFE04: 'Variation Selector-5 (U+FE04)',
    0xFE05: 'Variation Selector-6 (U+FE05)',
    0xFE06: 'Variation Selector-7 (U+FE06)',
    0xFE07: 'Variation Selector-8 (U+FE07)',
    0xFE08: 'Variation Selector-9 (U+FE08)',
    0xFE09: 'Variation Selector-10 (U+FE09)',
    0xFE0A: 'Variation Selector-11 (U+FE0A)',
    0xFE0B: 'Variation Selector-12 (U+FE0B)',
    0xFE0C: 'Variation Selector-13 (U+FE0C)',
    0xFE0D: 'Variation Selector-14 (U+FE0D)',
    0xFE0E: 'Variation Selector-15 (U+FE0E)',
    0xFE0F: 'Variation Selector-16 (U+FE0F)',
    0x180B: 'Mongolian Free Variation Selector One (FVS1, U+180B)',
    0x180C: 'Mongolian Free Variation Selector Two (FVS2, U+180C)',
    0x180D: 'Mongolian Free Variation Selector Three (FVS3, U+180D)',
}

TYPOGRAPHIC_DESCRIPTIONS: dict[int, str] = {
    0x2010: 'Hyphen (U+2010)',
    0x2011: 'Non-Breaking Hyphen (U+2011)',
    0x2013: 'En Dash (U+2013)',
    0x2014: 'Em Dash (U+2014)',
    0x2012: 'Figure Dash (U+2012)',
    0x2015: 'Horizontal Bar (U+2015)',
    0x2212: 'Minus Sign (U+2212)',
    0xFE63: 'Small Hyphen-Minus (U+FE63)',
    0x2018: 'Left Single Quotation Mark (U+2018)',
    0x2019: 'Right Single Quotation Mark (U+2019)',
    0x201C: 'Left Double Quotation Mark (U+201C)',
    0x201D: 'Right Double Quotation Mark (U+201D)',
    0x00B7: 'Middle Dot (U+00B7)',
    0x2219: 'Bullet Operator (U+2219)',
    0x2023: 'Triangular Bullet (U+2023)',
    0x2024: 'One Dot Leader (U+2024)',
    0x2025: 'Two Dot Leader (U+2025)',
    0x2027: 'Hyphenation Point (U+2027)',
    0x2059: 'Tricolon (U+2059)',
    0x3002: 'Ideographic Full Stop (U+3002)',
    0xFE52: 'Small Full Stop (U+FE52)',
    0x205A: 'Four Dot Mark (U+205A)',
    0x00B4: 'Acute Accent (U+00B4)',
    0x02B9: 'Modifier Letter Prime (U+02B9)',
    0x02BB: 'Modifier Letter Turned Comma (U+02BB)',
    0x02BC: 'Modifier Letter Apostrophe (U+02BC)',
    0x02C8: 'Modifier Letter Vertical Line (U+02C8)',
    0x0301: 'Combining Acute Accent (U+0301 - Use with space or letter)',
    0x2032: 'Prime (U+2032)',
    0x2033: 'Double Prime (U+2033)',
    0x2034: 'Triple Prime (U+2034)',
    0x2035: 'Reversed Prime (U+2035)',
    0x2036: 'Reversed Double Prime (U+2036)',
    0x2052: 'Commercial Minus (U+2052)',
    0x02BE: 'Modifier Letter Right Half Ring (U+02BE)',
    0xFF0E: 'Full-Width Full Stop (U+FF0E)',
    0xFF0C: 'Full-Width Comma (U+FF0C)',
    0xFF07: 'Fullwidth Apostrophe (U+FF07)',
    0x060C: 'Arabic Comma (U+060C)',
    0x201A: 'Single Low-9 Quotation Mark (U+201A)',
    0xFE50: 'Small Comma (U+FE50)',
    0x2044: 'Fraction Slash (U+2044)',
    0x2215: 'Division Slash (U+2215)',
    0xFF0F: 'Fullwidth Solidus (U+FF0F)',
    0x01C3: 'Latin Letter Retroflex Click (U+01C3)',
    0xFF01: 'Fullwidth Exclamation Mark (U+FF01)',
    0x037E: 'Greek Question Mark (U+037E)',
    0xFF1F: 'Fullwidth Question Mark (U+FF1F)',
    0xFE55: 'Small Colon (U+FE55)',
    0xFE56: 'Small Semicolon (U+FE56)',
    0xFF1A: 'Fullwidth Colon (U+FF1A)',
    0xFF1B: 'Fullwidth Semicolon (U+FF1B)',
    0x0391: 'Greek Capital Letter Alpha (U+0391)',
    0x0410: 'Cyrillic Capital Letter A (U+0410)',
    0x0421: 'Cyrillic Capital Letter Es (U+0421)',
    0x0395: 'Greek Capital Letter Epsilon (U+0395)',
    0x0415: 'Cyrillic Capital Letter Ie (U+0415)',
    0x0397: 'Greek Capital Letter Eta (U+0397)',
    0x041D: 'Cyrillic Capital Letter En (U+041D)',
    0x0399: 'Greek Capital Letter Iota (U+0399)',
    0x0406: 'Cyrillic Capital Letter Byelorussian-Ukrainian I (U+0406)',
    0x0408: 'Cyrillic Capital Letter Je (U+0408)',
    0x039A: 'Greek Capital Letter Kappa (U+039A)',
    0x039C: 'Greek Capital Letter Mu (U+039C)',
    0x041C: 'Cyrillic Capital Letter Em (U+041C)',
    0x039F: 'Greek Capital Letter Omicron (U+039F)',
    0x041E: 'Cyrillic Capital Letter O (U+041E)',
    0x03A1: 'Greek Capital Letter Rho (U+03A1)',
    0x0420: 'Cyrillic Capital Letter Er (U+0420)',
    0x0405: 'Cyrillic Capital Letter Dze (U+0405)',
    0x03A4: 'Greek Capital Letter Tau (U+03A4)',
    0x03A7: 'Greek Capital Letter Chi (U+03A7)',
    0x0425: 'Cyrillic Capital Letter Ha (U+0425)',
    0x03A5: 'Greek Capital Letter Upsilon (U+03A5)',
    0x0430: 'Cyrillic Small Letter A (U+0430)',
    0x0441: 'Cyrillic Small Letter Es (U+0441)',
    0x0435: 'Cyrillic Small Letter Ie (U+0435)',
    0x0456: 'Cyrillic Small Letter Byelorussian-Ukrainian I (U+0456)',
    0x0458: 'Cyrillic Small Letter Je (U+0458)',
    0x03BF: 'Greek Small Letter Omicron (U+03BF)',
    0x043E: 'Cyrillic Small Letter O (U+043E)',
    0x0440: 'Cyrillic Small Letter Er (U+0440)',
    0x0445: 'Cyrillic Small Letter Ha (U+0445)',
    0x0443: 'Cyrillic Small Letter U (U+0443)',
}


def ivs_description(cp: int) -> str:
    """IVS descriptions follow the reference's formula (ref :409-412)."""
    n = 17 + (cp - IVS_LO)
    return f"Ideographic Variation Selector-{n} (VS{n}, U+{cp:05X})"


# Emoji base codepoints for the VS16 context rule (ref :664-671): keep U+FE0F
# when the preceding char + FE0F forms an emoji, *iff* the optional ``emoji``
# library is importable (ref :14-23).  When absent (this sandbox), the rule is
# inert and FE0F is treated as an ordinary hidden marker -- bit-identical to
# the reference's fallback behavior.
try:  # pragma: no cover - environment dependent
    import emoji as _emoji

    EMOJI_VS16_BASES: frozenset[int] = frozenset(
        ord(seq[0]) for seq in _emoji.EMOJI_DATA
        if len(seq) == 2 and seq[1] == chr(VS16)
    )
except ImportError:  # pragma: no cover
    EMOJI_VS16_BASES = frozenset()
