"""Vectorized marker detection/cleaning kernel.

This is the engine's hot path: the semantics of the reference's fused per-char
scan (``_process_line``, ``/root/reference/hidden-characters-detector.py:648-708``)
and per-file accumulation (``_process_file``, ref :711-779), re-expressed as
whole-batch numpy array ops over a *flattened* token stream — one Arrow batch
of ``tokens: list<int32>`` becomes one flat int array plus row offsets, and
every predicate is a single vectorized gather/compare. No per-row Python.

Design (SURVEY.md §7.5):

* classification is a one-gather LUT (``uint8[0x110000]``) instead of set
  membership — hidden / IVS / typographic resolved in O(1) per token;
* line structure (the reference processes files line by line, line number and
  in-line index feed the BOM and VS16 rules) is recovered with
  ``np.maximum.accumulate`` over scattered line-start seeds;
* 1→N replacement expansion is a cumsum of per-token output lengths followed
  by at most ``MAX_REPLACEMENT_LEN`` masked scatters (replacements are ≤3
  codepoints), so cleaned rows can be longer than inputs without any loop
  over rows;
* the per-file count quirk (``processed`` counts *all* reports on a changed
  line, ref :750-753) is reproduced with line-grouped bincounts.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .. import markers


def _tune_malloc() -> None:
    """Keep freed kernel temps resident (runtime mallopt, glibc only).

    This sandbox's lazily-backed VM memory makes fresh page writes cost
    ~0.5 ms each; without pinning the trim/mmap thresholds every Arrow batch
    re-faults its temporaries (10-30x slowdowns).  Runs at import time in
    every Python worker, so it applies even when the driver env was not
    prepared (e.g. an externally created SparkSession).  No-op off glibc.
    """
    try:  # pragma: no cover - environment dependent
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
        libc.mallopt(M_MMAP_THRESHOLD, 256 << 20)
    except Exception:
        pass


_tune_malloc()

# --- marker-type / action codes (event schema vocabulary) -------------------
TYPE_HIDDEN, TYPE_IVS, TYPE_TYPOGRAPHIC = 1, 2, 3
TYPE_NAMES = {TYPE_HIDDEN: "Hidden", TYPE_IVS: "IdeographicVS",
              TYPE_TYPOGRAPHIC: "Typographic"}

ACT_DETECTED, ACT_REMOVED, ACT_REPLACED, ACT_BOM, ACT_NOCHANGE = 1, 2, 3, 4, 5
ACTION_NAMES = {ACT_DETECTED: "Detected", ACT_REMOVED: "Removed",
                ACT_REPLACED: "Replaced", ACT_BOM: "Processed (BOM)",
                ACT_NOCHANGE: "Detected (Rule: no change)"}

_UNICODE_MAX = 0x110000


def _build_luts():
    """One-time LUT construction; broadcast to executors via module import."""
    cls = np.zeros(_UNICODE_MAX, dtype=np.uint8)
    # order matters: hidden wins over typographic (ref :674 if / :694 elif)
    for cp in markers.TYPOGRAPHIC_CODEPOINTS:
        cls[cp] = TYPE_TYPOGRAPHIC
    cls[markers.IVS_LO:markers.IVS_HI + 1] = TYPE_IVS
    for cp in sorted(markers.HIDDEN_CODEPOINTS):
        cls[cp] = TYPE_HIDDEN

    repl_len = np.zeros(_UNICODE_MAX, dtype=np.int8)
    repl_idx = np.zeros(_UNICODE_MAX, dtype=np.int64)
    flat: list[int] = []
    for cp, out in sorted(markers.LIVE_REPLACEMENTS.items()):
        repl_len[cp] = len(out)
        repl_idx[cp] = len(flat)
        flat.extend(out)
    return cls, repl_len, repl_idx, np.asarray(flat, dtype=np.int64)


CLASS_LUT, REPL_LEN_LUT, REPL_IDX_LUT, REPL_FLAT = _build_luts()


def _build_desc_lut():
    """codepoint -> description-string index (0 = none); the string pool is
    tiny (~650 entries) so events gather descriptions with one int LUT +
    one Arrow ``take`` — no per-row Python, no string LUT of 0x110000."""
    descs: list[str | None] = [None]
    idx = np.zeros(_UNICODE_MAX, dtype=np.int32)
    # typographic first, hidden second: hidden wins, like CLASS_LUT
    for table in (markers.TYPOGRAPHIC_DESCRIPTIONS,
                  markers.HIDDEN_DESCRIPTIONS):
        for cp, d in table.items():
            idx[cp] = len(descs)
            descs.append(d)
    for cp in range(markers.IVS_LO, markers.IVS_HI + 1):
        idx[cp] = len(descs)
        descs.append(markers.ivs_description(cp))
    return idx, descs


DESC_IDX_LUT, DESC_STRINGS = _build_desc_lut()
EMOJI_BASE_ARR = np.fromiter(sorted(markers.EMOJI_VS16_BASES), dtype=np.int64,
                             count=len(markers.EMOJI_VS16_BASES))


@dataclass(frozen=True)
class DetectorConfig:
    """Mirrors the reference constructor flags (ref :576-599) 1:1."""

    clean: bool = True
    check_typographic: bool = True
    check_ivs: bool = True
    exclude_word_chars: bool = False
    excluded: frozenset[int] = frozenset()

    def excluded_array(self) -> np.ndarray:
        ex = set(self.excluded)
        if self.exclude_word_chars:  # --word merges WORD_COMMON (ref :597-599)
            ex |= markers.WORD_COMMON_CODEPOINTS
        return np.fromiter(sorted(ex), dtype=np.int64, count=len(ex))


FULL_CLEAN = DetectorConfig()
DETECT_ONLY = DetectorConfig(clean=False)


def parse_excluded_chars(vals: list[str] | tuple[str, ...]) -> frozenset[int]:
    """CLI ``--exclude-char`` strings -> excluded codepoints.

    Accepts ``U+XXXX``, bare 4-6 digit hex, or a single literal character —
    the exact accept/reject matrix of the reference CLI parser
    (``/root/reference/hidden-characters-detector.py:969-989``), including
    its traps: ``U+A`` falls through to the literal branch (one char after
    the prefix strip, so it means ``ord('A')``, not ``0xA``), and any
    invalid token (bad hex, out-of-range codepoint, wrong length) is an
    error — raised here as ``ValueError`` (the CLI maps it to exit code 1,
    like the reference's ``SystemExit(1)``).
    """
    out: set[int] = set()
    for token in vals:
        tok = token.strip()
        parsed: int | None = None
        if tok.startswith("U+") and len(tok) > 2:
            tok = tok[2:]
        if 4 <= len(tok) <= 6 and tok.isalnum():
            try:
                parsed = int(tok, 16)
                chr(parsed)  # range check (chr raises beyond U+10FFFF)
            except ValueError:
                parsed = None
        elif len(tok) == 1:
            parsed = ord(tok)
        if parsed is None:
            raise ValueError(
                f"Invalid format for --exclude-char '{token}'. "
                "Use U+XXXX, plain char, or hex.")
        out.add(parsed)
    return frozenset(out)


@dataclass
class KernelResult:
    """Flat-array outputs of one kernel invocation over R rows."""

    out_tokens: np.ndarray      # flat cleaned token stream (int64)
    out_offsets: np.ndarray     # R+1 offsets into out_tokens
    n_detected: np.ndarray      # per-row report count (ref `detected`)
    n_processed: np.ndarray     # per-row changed-line report count (`processed`)
    had_marker: np.ndarray      # per-row bool (ref `had_marker_or_change`)
    # per-row per-family report counts (map-side pre-aggregation: lets
    # density windows aggregate sequences instead of exploded events)
    n_hidden: np.ndarray = field(default=None)
    n_ivs: np.ndarray = field(default=None)
    n_typo: np.ndarray = field(default=None)
    # detection events, flat, grouped by row via ev_offsets
    ev_offsets: np.ndarray = field(default=None)
    ev_line_no: np.ndarray = field(default=None)
    ev_idx: np.ndarray = field(default=None)      # char index within line
    ev_token: np.ndarray = field(default=None)
    ev_type: np.ndarray = field(default=None)     # TYPE_* codes
    ev_action: np.ndarray = field(default=None)   # ACT_* codes


def _line_structure(toks, offsets, lengths, n):
    """Per-token (line_start_pos, idx_in_line, line_no); all vectorized.

    Lines reset at row starts and after each 0x0A token (the reference reads
    files line-by-line with the trailing newline attached, ref :740-742).
    """
    g = np.arange(n, dtype=np.int64)
    row_start = np.repeat(offsets[:-1], lengths)
    # scatter line-start seeds, then forward-fill with maximum.accumulate
    seed = np.full(n, -1, dtype=np.int64)
    nz = offsets[:-1][lengths > 0]
    seed[nz] = nz
    after_nl = g[toks == markers.NEWLINE] + 1
    after_nl = after_nl[after_nl < n]
    seed[after_nl] = after_nl  # row starts re-seed identically; harmless
    line_start = np.maximum.accumulate(seed)
    idx_in_line = g - line_start
    nl_cum = np.concatenate([[0], np.cumsum(toks == markers.NEWLINE)])
    line_no = 1 + nl_cum[g] - nl_cum[row_start]
    return row_start, line_start, idx_in_line, line_no


def clean_flat(toks: np.ndarray, offsets: np.ndarray,
               cfg: DetectorConfig = FULL_CLEAN,
               emit_events: bool = False) -> KernelResult:
    """Run detection/cleaning over a flattened token batch.

    ``toks``: int array of concatenated per-row codepoints.
    ``offsets``: int array, length R+1, row i = toks[offsets[i]:offsets[i+1]].

    Delegates to :mod:`.kernel_core` (memory-lean implementation; sparse
    line attribution, int32 temporaries).  The dense reference
    implementation below is kept as ``clean_flat_dense`` for differential
    testing of the core itself.
    """
    from . import kernel_core

    consts = (CLASS_LUT, REPL_LEN_LUT, REPL_IDX_LUT, REPL_FLAT,
              EMOJI_BASE_ARR, TYPE_HIDDEN, TYPE_IVS, TYPE_TYPOGRAPHIC,
              ACT_DETECTED, ACT_REMOVED, ACT_REPLACED, ACT_BOM,
              _UNICODE_MAX, KernelResult)
    return kernel_core.run(toks, offsets, cfg, emit_events, consts)


def clean_flat_dense(toks: np.ndarray, offsets: np.ndarray,
                     cfg: DetectorConfig = FULL_CLEAN,
                     emit_events: bool = False) -> KernelResult:
    """Original dense implementation (cross-checked against the sparse
    core in tests)."""
    toks = np.asarray(toks, dtype=np.int64)
    offsets = np.asarray(offsets, dtype=np.int64)
    n = int(toks.shape[0])
    nrows = int(offsets.shape[0]) - 1
    lengths = np.diff(offsets)

    if n == 0:
        z = np.zeros(nrows, dtype=np.int64)
        return KernelResult(
            toks, offsets, z.copy(), z.copy(), np.zeros(nrows, dtype=bool),
            n_hidden=z.copy(), n_ivs=z.copy(), n_typo=z.copy(),
            ev_offsets=np.zeros(nrows + 1, dtype=np.int64),
            ev_line_no=z[:0], ev_idx=z[:0], ev_token=z[:0],
            ev_type=np.zeros(0, np.int8), ev_action=np.zeros(0, np.int8))

    row_start, line_start, idx_in_line, line_no = _line_structure(
        toks, offsets, lengths, n)

    safe = np.where((toks >= 0) & (toks < _UNICODE_MAX), toks, 0)
    cls = CLASS_LUT[safe]

    ex_arr = cfg.excluded_array()
    not_excluded = (~np.isin(toks, ex_arr)) if ex_arr.size else \
        np.ones(n, dtype=bool)

    # VS16 emoji-context keep rule (ref :664-671): only when the emoji
    # library is importable; requires idx>0 *within the line*.
    fe0f_keep = np.zeros(n, dtype=bool)
    if EMOJI_BASE_ARR.size:
        cand = (toks == markers.VS16) & (idx_in_line > 0) & not_excluded
        pos = np.nonzero(cand)[0]
        fe0f_keep[pos] = np.isin(toks[pos - 1], EMOJI_BASE_ARR)

    hidden = (cls == TYPE_HIDDEN) & not_excluded & ~fe0f_keep
    # BOM = U+FEFF at line 1, index 0 == global row start (ref :675)
    is_bom = hidden & (toks == markers.BOM) & (np.arange(n) == row_start)
    ivs = (cls == TYPE_IVS) & not_excluded if cfg.check_ivs else \
        np.zeros(n, dtype=bool)
    typo = (cls == TYPE_TYPOGRAPHIC) & not_excluded if cfg.check_typographic \
        else np.zeros(n, dtype=bool)

    rlen = REPL_LEN_LUT[safe]
    typo_replace = typo & (rlen > 0) & cfg.clean

    if cfg.clean:
        report = hidden | ivs | typo
        removed = hidden | ivs
        # every live replacement differs from its key (asserted in tests),
        # so `changed` is exactly removal-or-replacement (ref :682,:690,:699)
        changed = removed | typo_replace
    else:
        report = (hidden & ~is_bom) | ivs | typo  # lead BOM unreported (ref :677)
        removed = np.zeros(n, dtype=bool)
        changed = np.zeros(n, dtype=bool)

    # ---- output rebuild (clean) or passthrough (detect) --------------------
    if cfg.clean:
        out_len = np.ones(n, dtype=np.int64)
        out_len[removed] = 0
        out_len[typo_replace] = rlen[typo_replace]
        cum = np.concatenate([[0], np.cumsum(out_len)])
        out_offsets = cum[offsets]
        out = np.empty(int(cum[-1]), dtype=np.int64)
        plain = (out_len == 1) & ~typo_replace
        out[cum[:-1][plain]] = toks[plain]
        rp = np.nonzero(typo_replace)[0]
        if rp.size:
            starts, ridx, rl = cum[rp], REPL_IDX_LUT[toks[rp]], rlen[rp]
            for k in range(markers.MAX_REPLACEMENT_LEN):
                sel = rl > k
                out[starts[sel] + k] = REPL_FLAT[ridx[sel] + k]
    else:
        out, out_offsets = toks, offsets

    # ---- per-row stats -----------------------------------------------------
    row_of = np.repeat(np.arange(nrows, dtype=np.int64), lengths)
    n_detected = np.bincount(row_of[report], minlength=nrows)
    had_marker = n_detected > 0
    hidden_rep = hidden if cfg.clean else (hidden & ~is_bom)
    n_hidden_row = np.bincount(row_of[hidden_rep], minlength=nrows)
    n_ivs_row = np.bincount(row_of[ivs], minlength=nrows)
    n_typo_row = np.bincount(row_of[typo], minlength=nrows)

    if cfg.clean:
        # compact per-line ids from the monotone line_start positions
        new_line = np.concatenate([[True], np.diff(line_start) > 0])
        lid = np.cumsum(new_line) - 1
        nlines = int(lid[-1]) + 1
        line_det = np.bincount(lid[report], minlength=nlines)
        line_chg = np.bincount(lid[changed], minlength=nlines) > 0
        line_row = row_of[np.nonzero(new_line)[0]]
        n_processed = np.bincount(
            line_row, weights=line_det * line_chg, minlength=nrows
        ).astype(np.int64)
    else:
        n_processed = np.zeros(nrows, dtype=np.int64)

    res = KernelResult(out, out_offsets, n_detected.astype(np.int64),
                       n_processed, had_marker,
                       n_hidden=n_hidden_row.astype(np.int64),
                       n_ivs=n_ivs_row.astype(np.int64),
                       n_typo=n_typo_row.astype(np.int64))

    if emit_events:
        ev = np.nonzero(report)[0]
        res.ev_offsets = np.searchsorted(ev, offsets, side="left").astype(np.int64)
        res.ev_line_no = line_no[ev]
        res.ev_idx = idx_in_line[ev]
        res.ev_token = toks[ev]
        ev_type = cls[ev].astype(np.int8)
        action = np.full(ev.size, ACT_DETECTED, dtype=np.int8)
        if cfg.clean:
            action[(hidden | ivs)[ev]] = ACT_REMOVED
            action[is_bom[ev]] = ACT_BOM
            action[typo_replace[ev]] = ACT_REPLACED
        res.ev_type = ev_type
        res.ev_action = action
    return res


def clean_rows(rows: list[list[int]], cfg: DetectorConfig = FULL_CLEAN,
               emit_events: bool = False) -> KernelResult:
    """Convenience wrapper for tests: list-of-token-lists in, flat result out."""
    lengths = np.fromiter((len(r) for r in rows), dtype=np.int64,
                          count=len(rows))
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    toks = np.concatenate([np.asarray(r, dtype=np.int64) for r in rows]) \
        if len(rows) and offsets[-1] else np.zeros(0, dtype=np.int64)
    return clean_flat(toks, offsets, cfg, emit_events)
