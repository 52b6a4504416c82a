#!/usr/bin/env python3
"""Generate the static Unicode *data* files shipped with sparkft.

These are pure data assets (codepoint lists / word lists), extracted once from
the reference snapshot's data files and from Python's own `unicodedata`:

- separators.txt / context_separators.txt: the default separator strings used
  by the tokenizer (reference: charabia/src/separators.rs:18-169 — a curated
  list of Unicode punctuation/symbol/space characters plus ". ", ", ",
  "\\0" and the Khmer et-cetera sign sequence).
- nonspacing_marks.txt: 1281 codepoints of nonspacing marks removed by the
  diacritic-folding normalizer (reference:
  charabia/dictionaries/bin/nonspacing_mark/marks.bin — little-endian u32s).
- thai_words.txt / german_words.txt: dictionary word lists for the
  longest-prefix segmenters (reference: charabia/dictionaries/txt/*/words.txt).
- kvariants.tsv: CJK kVariant char→char map (reference:
  irg-kvariants/dictionaries/*.tsv, Unicode IRG data).

Run from the repo root:  python scripts/gen_data.py
Idempotent; writes into sparkft/data/.
"""
from __future__ import annotations

import json
import pathlib
import re
import struct
import sys

REF = pathlib.Path("/root/reference")
OUT = pathlib.Path(__file__).resolve().parent.parent / "sparkft" / "data"


def parse_rust_str_list(src: str, const_name: str) -> list[str]:
    """Parse a `pub const NAME: &[&str] = &[ ... ];` literal list of strings."""
    m = re.search(rf"const {const_name}[^=]*=\s*&\[(.*?)\];", src, re.S)
    if not m:
        raise SystemExit(f"could not find {const_name}")
    body = m.group(1)
    # strip line comments
    body = re.sub(r"//[^\n]*", "", body)
    out = []
    for sm in re.finditer(r'"((?:\\.|[^"\\])*)"', body):
        raw = sm.group(1)
        # decode rust escapes: \0 \n \r \t \\ \" \u{XXXX}
        def sub(mo):
            e = mo.group(0)
            if e == r"\0":
                return "\0"
            if e == r"\n":
                return "\n"
            if e == r"\r":
                return "\r"
            if e == r"\t":
                return "\t"
            if e == r"\\":
                return "\\"
            if e == r"\"":
                return '"'
            if e.startswith(r"\u"):
                return chr(int(mo.group(1), 16))
            raise ValueError(e)

        s = re.sub(r"\\u\{([0-9a-fA-F]+)\}|\\.", sub, raw)
        out.append(s)
    return out


def write_seps(name: str, seps: list[str]) -> None:
    # store as JSON array (handles \0, newlines, multi-char entries losslessly)
    (OUT / name).write_text(json.dumps(seps, ensure_ascii=False, indent=0))
    print(f"{name}: {len(seps)} entries")


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)

    src = (REF / "charabia/src/separators.rs").read_text()
    seps = parse_rust_str_list(src, "DEFAULT_SEPARATORS")
    ctx = parse_rust_str_list(src, "CONTEXT_SEPARATORS")
    write_seps("separators.json", seps)
    write_seps("context_separators.json", ctx)

    marks = (REF / "charabia/dictionaries/bin/nonspacing_mark/marks.bin").read_bytes()
    cps = sorted(struct.unpack(f"<{len(marks)//4}I", marks))
    (OUT / "nonspacing_marks.txt").write_text("\n".join(f"{c:X}" for c in cps))
    print(f"nonspacing_marks.txt: {len(cps)} codepoints")

    for lang in ("thai", "german"):
        words = (REF / f"charabia/dictionaries/txt/{lang}/words.txt").read_text()
        (OUT / f"{lang}_words.txt").write_text(words)
        print(f"{lang}_words.txt: {len(words.splitlines())} words")

    # kVariants: TSV rows like "㨲 (U+3A32)\twrong!\t㩍 (U+3A4D)" -> variant char -> canonical char.
    # Relations kept: wrong! / sem / simp / old / = (same set the reference loader accepts).
    tsv = REF / "irg-kvariants" / "dictionaries" / "source" / "kVariants.tsv"
    keep = {"wrong!", "sem", "simp", "old", "="}
    seen: dict[int, int] = {}
    for line in tsv.read_text().splitlines():
        parts = line.split("\t")
        if len(parts) < 3 or parts[1].strip() not in keep:
            continue
        lhs, rhs = parts[0].strip()[0], parts[2].strip()[0]
        seen[ord(lhs)] = ord(rhs)  # last wins on dup keys (none expected)
    (OUT / "kvariants.tsv").write_text(
        "\n".join(f"{a:X}\t{b:X}" for a, b in sorted(seen.items()))
    )
    print(f"kvariants.tsv: {len(seen)} mappings")


if __name__ == "__main__":
    sys.exit(main())
