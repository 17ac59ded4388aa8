"""clean_flat inner implementation — memory-lean variant.

Split from kernel.py for readability; see kernel.py for the semantics
contract (the reference's ``_process_line``/``_process_file``,
``/root/reference/hidden-characters-detector.py:648-779``).

Design notes (vs the straightforward dense version):

* all *line* structure (BOM position, per-line ``processed`` quirk, event
  line_no/idx) is computed **sparsely** at marker/newline positions only —
  no dense per-token line arrays; for marker-free spans the kernel touches
  each token exactly twice (classify gather + output copy);
* temporaries stay int32/int8/bool where possible — this roughly halves
  memory traffic, which is the binding resource both at 100 TB scale and on
  this sandbox's slow-memory VM.
"""

from __future__ import annotations

import numpy as np

from .. import markers


def run(toks, offsets, cfg, emit_events, consts):
    (CLASS_LUT, REPL_LEN_LUT, REPL_IDX_LUT, REPL_FLAT, EMOJI_BASE_ARR,
     TYPE_HIDDEN, TYPE_IVS, TYPE_TYPOGRAPHIC,
     ACT_DETECTED, ACT_REMOVED, ACT_REPLACED, ACT_BOM, UNICODE_MAX,
     KernelResult) = consts

    toks = np.asarray(toks)
    if toks.dtype not in (np.int32, np.int64):
        toks = toks.astype(np.int64)
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

    # classification gather; guard the LUT index only if out-of-range values
    # actually occur (rare) to avoid an n-sized copy on the hot path
    if int(toks.min()) < 0 or int(toks.max()) >= UNICODE_MAX:
        safe = np.clip(toks, 0, UNICODE_MAX - 1)
        safe[(toks < 0) | (toks >= UNICODE_MAX)] = 0
    else:
        safe = toks
    cls = CLASS_LUT[safe]

    ex_arr = cfg.excluded_array()
    not_excluded = ~np.isin(toks, ex_arr) if ex_arr.size else None

    row_starts = offsets[:-1]  # length nrows (may point past end for empty)

    hidden = cls == TYPE_HIDDEN
    if not_excluded is not None:
        hidden &= not_excluded

    # VS16 emoji-context keep rule (ref :664-671): inert when the emoji
    # library is absent.  idx>0 within the line == previous token exists in
    # the same line (not a row start, previous token not a newline).
    if EMOJI_BASE_ARR.size:
        cand = np.nonzero((toks == markers.VS16) & hidden)[0]
        if cand.size:
            at_start = np.isin(cand, row_starts[lengths > 0])
            prev_ok = np.zeros(cand.size, dtype=bool)
            nz = ~at_start
            prev_ok[nz] = (toks[cand[nz] - 1] != markers.NEWLINE) & \
                np.isin(toks[cand[nz] - 1], EMOJI_BASE_ARR)
            hidden[cand[prev_ok]] = False

    # BOM = U+FEFF at row start (line 1, idx 0; ref :675)
    bom_pos = row_starts[(lengths > 0)]
    bom_pos = bom_pos[(toks[bom_pos] == markers.BOM) & hidden[bom_pos]]

    ivs = (cls == TYPE_IVS) if cfg.check_ivs else None
    typo = (cls == TYPE_TYPOGRAPHIC) if cfg.check_typographic else None
    if not_excluded is not None:
        if ivs is not None:
            ivs &= not_excluded
        if typo is not None:
            typo &= not_excluded

    rlen = REPL_LEN_LUT[safe] if (typo is not None and cfg.clean) else None
    typo_replace = (typo & (rlen > 0)) if rlen is not None else None

    # report mask (reuse `hidden`'s buffer pattern: build once)
    report = hidden.copy()
    if ivs is not None:
        report |= ivs
    if typo is not None:
        report |= typo
    if not cfg.clean:
        report[bom_pos] = False  # lead BOM unreported in detect mode (:677)

    # ---- per-row counts (bincount over event rows only — sparse) ----------
    rep_pos = np.nonzero(report)[0]
    rep_row = (np.searchsorted(offsets, rep_pos, side="right") - 1)
    n_detected = np.bincount(rep_row, minlength=nrows)
    had_marker = n_detected > 0
    hpos = rep_pos[hidden[rep_pos]]
    n_hidden = np.bincount(
        np.searchsorted(offsets, hpos, side="right") - 1, minlength=nrows)
    if ivs is not None:
        ipos = rep_pos[ivs[rep_pos]]
        n_ivs = np.bincount(
            np.searchsorted(offsets, ipos, side="right") - 1,
            minlength=nrows)
    else:
        n_ivs = np.zeros(nrows, dtype=np.int64)
    if typo is not None:
        tpos = rep_pos[typo[rep_pos]]
        n_typo = np.bincount(
            np.searchsorted(offsets, tpos, side="right") - 1,
            minlength=nrows)
    else:
        n_typo = np.zeros(nrows, dtype=np.int64)

    # ---- sparse line attribution for event/report positions ---------------
    nl_pos = np.nonzero(toks == markers.NEWLINE)[0]

    def line_of(positions, rows):
        """(line_start, line_no) for sparse positions; all O(k log m)."""
        rs = offsets[rows]
        if nl_pos.size == 0:
            return rs, np.ones(positions.shape[0], dtype=np.int64)
        p = np.searchsorted(nl_pos, positions)
        prev_nl1 = np.where(p > 0, nl_pos[np.maximum(p - 1, 0)] + 1, 0)
        line_start = np.maximum(rs, prev_nl1)
        p_rs = np.searchsorted(nl_pos, rs)
        line_no = 1 + (p - p_rs)
        return line_start, line_no

    # ---- n_processed: the changed-line quirk (ref :750-753) ---------------
    if cfg.clean:
        # changed positions = removals (hidden|ivs) + live replacements
        chg = hidden.copy()
        if ivs is not None:
            chg |= ivs
        if typo_replace is not None:
            chg |= typo_replace
        if nl_pos.size == 0:
            # single-line rows: processed = n_detected on changed rows
            cpos = np.nonzero(chg)[0]
            crow = np.searchsorted(offsets, cpos, side="right") - 1
            row_chg = np.zeros(nrows, dtype=bool)
            row_chg[crow] = True
            n_processed = np.where(row_chg, n_detected, 0).astype(np.int64)
        else:
            # group report positions by their line_start; a line counts all
            # its reports iff it has >= 1 changed position
            ls_rep, _ = line_of(rep_pos, rep_row)
            cpos = np.nonzero(chg)[0]
            crow = np.searchsorted(offsets, cpos, side="right") - 1
            ls_chg, _ = line_of(cpos, crow)
            changed_lines = np.unique(ls_chg)
            on_changed = np.isin(ls_rep, changed_lines)
            n_processed = np.bincount(rep_row[on_changed],
                                      minlength=nrows).astype(np.int64)
    else:
        chg = None
        n_processed = np.zeros(nrows, dtype=np.int64)

    # ---- output rebuild (clean) or passthrough (detect) --------------------
    if cfg.clean:
        out_len = np.ones(n, dtype=np.int32)
        out_len[chg] = 0  # removals + replacements zeroed, then fix repls
        if typo_replace is not None:
            out_len[typo_replace] = rlen[typo_replace]
        cum = np.empty(n + 1, dtype=np.int64)
        cum[0] = 0
        np.cumsum(out_len, dtype=np.int64, out=cum[1:])
        out_offsets = cum[offsets]
        out = np.empty(int(cum[-1]), dtype=toks.dtype)
        plain = out_len == 1
        if typo_replace is not None:
            plain &= ~typo_replace
        out[cum[:-1][plain]] = toks[plain]
        if typo_replace is not None:
            rp = np.nonzero(typo_replace)[0]
            if rp.size:
                starts, ridx, rl = cum[rp], REPL_IDX_LUT[toks[rp]], rlen[rp]
                for k in range(markers.MAX_REPLACEMENT_LEN):
                    sel = rl > k
                    out[starts[sel] + k] = REPL_FLAT[ridx[sel] + k]
    else:
        out, out_offsets = toks, offsets

    res = KernelResult(out, out_offsets, n_detected.astype(np.int64),
                       n_processed, had_marker,
                       n_hidden=n_hidden.astype(np.int64),
                       n_ivs=n_ivs.astype(np.int64),
                       n_typo=n_typo.astype(np.int64))

    if emit_events:
        ls_ev, ln_ev = line_of(rep_pos, rep_row)
        res.ev_offsets = np.searchsorted(rep_pos, offsets,
                                         side="left").astype(np.int64)
        res.ev_line_no = ln_ev.astype(np.int64)
        res.ev_idx = (rep_pos - ls_ev).astype(np.int64)
        res.ev_token = toks[rep_pos].astype(np.int64)
        res.ev_type = cls[rep_pos].astype(np.int8)
        action = np.full(rep_pos.size, ACT_DETECTED, dtype=np.int8)
        if cfg.clean:
            rem = hidden[rep_pos]
            if ivs is not None:
                rem |= ivs[rep_pos]
            action[rem] = ACT_REMOVED
            action[np.isin(rep_pos, bom_pos)] = ACT_BOM
            if typo_replace is not None:
                action[typo_replace[rep_pos]] = ACT_REPLACED
        res.ev_action = action
    return res
