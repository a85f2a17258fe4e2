"""Stripped-text copy-paste scanner (VERDICT r03 builder action).

The driver's mechanical detector compares RAW file text, which docstrings and
comments dilute below its 0.6 threshold.  This scanner strips comments,
docstrings, and blank lines from both sides, then SequenceMatcher-compares
every package file against (a) the same-named reference file and (b) any
reference file within 2x of its stripped size.  Run each round:

    python scripts/copycheck_stripped.py            # report > 0.6
    python scripts/copycheck_stripped.py --min 0.5  # lower threshold
"""

from __future__ import annotations

import argparse
import io
import json
import pathlib
import tokenize
from difflib import SequenceMatcher

REPO = pathlib.Path(__file__).resolve().parents[1]
REF = pathlib.Path("/root/reference")


def strip_source(text: str) -> str:
    """Remove comments, docstrings, and blank lines; normalize whitespace."""
    out = []
    prev_end = (1, 0)
    last_tok = None
    try:
        toks = list(tokenize.generate_tokens(io.StringIO(text).readline))
    except (tokenize.TokenizeError, IndentationError, SyntaxError):
        return text
    for tok in toks:
        ttype, tstr, start, end, _line = tok
        if ttype == tokenize.COMMENT:
            continue
        if ttype == tokenize.STRING:
            # docstring heuristic: a STRING statement (previous token is
            # NEWLINE/INDENT/DEDENT or module start)
            if last_tok is None or last_tok in (
                    tokenize.NEWLINE, tokenize.NL, tokenize.INDENT,
                    tokenize.DEDENT):
                continue
        if ttype in (tokenize.NL, tokenize.NEWLINE):
            out.append("\n")
        else:
            if start[0] == prev_end[0] and start[1] > prev_end[1]:
                out.append(" ")
            out.append(tstr)
        prev_end = end
        if ttype not in (tokenize.NL,):
            last_tok = ttype
    lines = [ln.strip() for ln in "".join(out).splitlines()]
    return "\n".join(ln for ln in lines if ln)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--min", type=float, default=0.6)
    args = ap.parse_args()

    repo_files = sorted(
        p for p in (REPO / "gpax_tpu").rglob("*.py")) + [REPO / "hypo.py"] \
        if (REPO / "hypo.py").exists() else sorted(
            p for p in (REPO / "gpax_tpu").rglob("*.py"))
    ref_files = sorted(REF.rglob("*.py")) if REF.exists() else []
    ref_stripped = {}
    for rf in ref_files:
        try:
            ref_stripped[rf] = strip_source(rf.read_text(errors="ignore"))
        except OSError:
            pass

    findings = []
    for pf in repo_files:
        try:
            mine = strip_source(pf.read_text(errors="ignore"))
        except OSError:
            continue
        if len(mine) < 200:
            continue
        candidates = []
        for rf, theirs in ref_stripped.items():
            same_name = rf.name == pf.name
            size_ok = 0.5 <= (len(theirs) + 1) / (len(mine) + 1) <= 2.0
            if same_name or size_ok:
                candidates.append((rf, theirs))
        best = (None, 0.0)
        for rf, theirs in candidates:
            r = SequenceMatcher(None, mine, theirs).quick_ratio()
            if r <= best[1] or r < args.min:
                continue
            r_full = SequenceMatcher(None, mine, theirs).ratio()
            if r_full > best[1]:
                best = (rf, r_full)
        if best[0] is not None and best[1] >= args.min:
            findings.append({
                "file": str(pf.relative_to(REPO)),
                "ref": str(best[0].relative_to(REF)),
                "stripped_similarity": round(best[1], 3),
            })

    findings.sort(key=lambda f: -f["stripped_similarity"])
    print(json.dumps(findings, indent=2))
    print(f"# {len(findings)} file(s) >= {args.min} stripped similarity")


if __name__ == "__main__":
    main()
