"""Generate ocr_spark/functions/uniconst.py — the FROZEN cross-engine
Unicode contract.

Unicode-property surfaces are engine-version quicksand: JDK 17's regex
tables and case mappings disagree with DuckDB/RE2's on codepoints
assigned or re-mapped between their Unicode versions (measured: U+10571
VITHKUQI CAPITAL BBE is \\p{L} in RE2 but not in Java, while Java
LOWERCASES it and DuckDB does not; U+0130 LATIN CAPITAL I WITH DOT ABOVE
lowers to 'i'+U+0307 in Java but 'i' in DuckDB). Any gate whose value
hash flows through lower()/\\p{L}/\\p{N} therefore diverges on content
containing such codepoints — the same class of failure as the round-4
whitespace-shorthand drift, one table over.

The fix is the same as the whitespace fix: stop trusting either engine's
shorthand and spell the contract out ONCE, as literals both engines
interpret identically:

* ``FOLD_FROM``/``FOLD_TO`` — the case-fold mapping, as translate()
  argument strings: every codepoint where Java's lower() and DuckDB's
  lower() agree on a single-codepoint result differing from the input.
  Disputed or 1:n codepoints are EXCLUDED (they fold to themselves) —
  deterministic in both engines forever.
* ``LETTER_CLASS_BODY``/``DIGIT_CLASS_BODY`` — explicit \\x{..}-range
  class bodies for the INTERSECTION of Java's and RE2's \\p{L} / \\p{N}.
  Both engines parse \\x{h..h}; a literal range set cannot drift.

Run under the pinned environment (pyspark 4.1.2 / duckdb in the image);
the output is committed, so regeneration is only needed to refresh the
contract deliberately. Verification (every emitted codepoint round-trips
identically through BOTH engines) runs as part of generation.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import functions as F

from ocr_spark.session import get_spark

MAX_CP = 0x110000
SURROGATES = range(0xD800, 0xE000)


def _chunks(flags: list[bool]) -> list[tuple[int, int]]:
    """Contiguous True ranges as (start, end) inclusive."""
    out, start = [], None
    for cp, ok in enumerate(flags):
        if ok and start is None:
            start = cp
        elif not ok and start is not None:
            out.append((start, cp - 1))
            start = None
    if start is not None:
        out.append((start, len(flags) - 1))
    return out


def main() -> None:
    spark = get_spark(master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()

    cps = [cp for cp in range(MAX_CP) if cp not in SURROGATES]
    chars = [chr(cp) for cp in cps]

    # ---- Java side (one Spark pass over all codepoints) ----
    df = spark.createDataFrame(
        [(cp, c) for cp, c in zip(cps, chars)], "cp long, c string"
    ).repartition(32)
    got = df.select(
        "cp",
        (F.regexp_count("c", F.lit(r"\p{L}")) > 0).alias("jl"),
        (F.regexp_count("c", F.lit(r"\p{N}")) > 0).alias("jn"),
        F.lower("c").alias("jlo"),
    ).collect()
    java = {r["cp"]: (r["jl"], r["jn"], r["jlo"]) for r in got}

    # ---- DuckDB side (one vectorized pass) ----
    con.execute("create table t(cp bigint, c varchar)")
    con.executemany("insert into t values (?, ?)", list(zip(cps, chars)))
    duck = {
        row[0]: (bool(row[1]), bool(row[2]), row[3])
        for row in con.execute(
            r"select cp, regexp_matches(c, '\p{L}'),"
            r" regexp_matches(c, '\p{N}'), lower(c) from t"
        ).fetchall()
    }

    letter = [False] * MAX_CP
    digit = [False] * MAX_CP
    fold_from, fold_to = [], []
    for cp in cps:
        jl, jn, jlo = java[cp]
        dl, dn, dlo = duck[cp]
        letter[cp] = jl and dl
        digit[cp] = jn and dn
        c = chr(cp)
        if jlo == dlo and jlo != c and len(jlo) == 1:
            fold_from.append(c)
            fold_to.append(jlo)

    def class_body(flags: list[bool]) -> str:
        parts = []
        for a, b in _chunks(flags):
            if a == b:
                parts.append(f"\\x{{{a:x}}}")
            else:
                parts.append(f"\\x{{{a:x}}}-\\x{{{b:x}}}")
        return "".join(parts)

    letter_body = class_body(letter)
    digit_body = class_body(digit)
    n_letter = sum(letter)
    n_digit = sum(digit)

    # ---- verify the emitted contract against BOTH engines ----
    probe = [cp for cp in cps if cp < 0x3000] + [
        cp for cp in cps if letter[cp] or digit[cp]
    ][::97]
    pdf = spark.createDataFrame(
        [(cp, chr(cp)) for cp in probe], "cp long, c string"
    )
    fold_from_s, fold_to_s = "".join(fold_from), "".join(fold_to)
    vr = pdf.select(
        "cp",
        (F.regexp_count("c", F.lit("[" + letter_body + "]")) > 0).alias("l"),
        (F.regexp_count("c", F.lit("[" + digit_body + "]")) > 0).alias("n"),
        F.translate("c", fold_from_s, fold_to_s).alias("f"),
    ).collect()
    for r in vr:
        cp = r["cp"]
        assert r["l"] == letter[cp], f"java letter drift at {cp:#x}"
        assert r["n"] == digit[cp], f"java digit drift at {cp:#x}"
    dv = con.execute(
        "select cp, regexp_matches(c, ?), regexp_matches(c, ?),"
        " translate(c, ?, ?) from t where cp < 12288 or cp % 97 = 0",
        ["[" + letter_body + "]", "[" + digit_body + "]", fold_from_s, fold_to_s],
    ).fetchall()
    jf = {r["cp"]: r["f"] for r in vr}
    for cp, dl, dn, dfo in dv:
        assert bool(dl) == letter[cp], f"duck letter drift at {cp:#x}"
        assert bool(dn) == digit[cp], f"duck digit drift at {cp:#x}"
        if cp in jf:
            assert dfo == jf[cp], f"fold drift at {cp:#x}"

    with open("/root/repo/ocr_spark/functions/uniconst.py", "w") as f:
        f.write('"""FROZEN cross-engine Unicode contract — GENERATED, do not hand-edit.\n\n')
        f.write("Produced by scripts/gen_unicode_contract.py (see its docstring for\n")
        f.write("why and how); committed so the contract never drifts with engine\n")
        f.write("upgrades. Letter/digit classes are the INTERSECTION of JDK 17 regex\n")
        f.write("\\\\p{L}/\\\\p{N} and DuckDB/RE2's; the case fold is the agreement set\n")
        f.write("of both engines' lower() restricted to 1:1 mappings.\n")
        f.write(f"Sizes: {n_letter} letters, {n_digit} digits, {len(fold_from)} fold pairs.\n")
        f.write('"""\n\n')
        f.write("# class BODIES (no brackets): compose as f'[{LETTER_CLASS_BODY}]'\n")
        f.write(f"LETTER_CLASS_BODY = {letter_body!r}\n\n")
        f.write(f"DIGIT_CLASS_BODY = {digit_body!r}\n\n")
        f.write("# translate() argument strings: FROM[i] folds to TO[i]\n")
        f.write(f"FOLD_FROM = {fold_from_s!r}\n\n")
        f.write(f"FOLD_TO = {fold_to_s!r}\n")
    print(
        f"written: {n_letter} letters in {letter_body.count('x')} atoms, "
        f"{n_digit} digits, {len(fold_from)} fold pairs"
    )


if __name__ == "__main__":
    main()
