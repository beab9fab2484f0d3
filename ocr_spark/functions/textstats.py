"""Text-analysis column functions for corpus curation — all native.

Language-ID (character n-gram/script heuristic), quality scoring, token
counting (whitespace + BPE-ish regex) and rolling-hash document
fingerprinting, as JVM-side expressions usable straight in filters and
aggregations on a trillion-row documents table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


#: THE whitespace contract, spelled out. Java's ``\\s`` is exactly these six
#: ASCII chars and RE2's ``\\s`` is the same set minus ``\\x0b`` — but the
#: word-split surface feeds value-exact cross-engine comparisons, so neither
#: engine's shorthand is trusted: every word/token regex on BOTH sides uses
#: these explicit classes (the escapes \\t \\n \\x0b \\f \\r are interpreted
#: identically by Java regex and RE2, so one literal serves both).
WS_CHARS = r" \t\n\x0b\f\r"
WS_CLASS = "[" + WS_CHARS + "]"
NON_WS_RUN = "[^" + WS_CHARS + "]+"


def whitespace_token_count(col: Column | str) -> Column:
    """Whitespace-delimited tokens: the number of non-whitespace runs; 0 for
    empty/null/whitespace-only text.

    Counted directly with ``regexp_count`` — the earlier
    ``size(split(trim(text)))`` form materialized an array AND miscounted
    when the text had leading/trailing NON-SPACE whitespace (``F.trim``
    strips spaces only, so ``"\\nhello"`` split to ``["", "hello"]`` — a
    phantom empty token). Uses the explicit ``NON_WS_RUN`` class, never the
    engine-default ``\\S``. SQL-oracle twin:
    ``len(regexp_extract_all(text, '[^ \\t\\n\\x0b\\f\\r]+'))``."""
    return F.regexp_count(F.coalesce(_c(col), F.lit("")), F.lit(NON_WS_RUN))


# Pinned cross-engine Unicode contract (uniconst is GENERATED — see
# scripts/gen_unicode_contract.py): engine \p{L}/\p{N} and lower() are
# version quicksand (JDK 17 vs RE2 disagree on codepoints assigned or
# re-mapped between their Unicode versions — U+10571 is \p{L} only in
# RE2 yet lowercased only by Java; U+0130 lowers 1:2 in Java, 1:1 in
# DuckDB). The shared table is RE2's, so DuckDB oracles keep the bare
# (fast) shorthands while the Java classes here add the tiny diff set
# via class algebra — keeping Java's property-table fast path. A first
# cut inlined the full 1112-range intersection class instead and Java's
# linear class-atom walk made token_stats 35× slower at sf0.1.
from ocr_spark.functions.uniconst import (  # noqa: E402
    FOLD_FROM,
    FOLD_TO,
    JAVA_ONLY_DIGIT_BODY,
    JAVA_ONLY_LETTER_BODY,
    RE2_ONLY_DIGIT_BODY,
    RE2_ONLY_LETTER_BODY,
)


def _java_class(prop: str, adds: str, subs: str) -> str:
    """Java class reproducing an RE2 property table: property ∪ adds ∖ subs
    (Java supports &&[^…] subtraction; RE2 needs nothing — its bare
    shorthand IS the table)."""
    return "[" + prop + adds + ("&&[^" + subs + "]" if subs else "") + "]"


LETTER_CLASS = _java_class(r"\p{L}", RE2_ONLY_LETTER_BODY, JAVA_ONLY_LETTER_BODY)
DIGIT_CLASS = _java_class(r"\p{N}", RE2_ONLY_DIGIT_BODY, JAVA_ONLY_DIGIT_BODY)

# BPE-ish pre-tokenization: letter runs, digit runs, or single non-space
# symbols — the GPT-2-style pretoken boundary classes, minus lookaheads.
# Whitespace is the explicit shared class (WS_CHARS); letters/digits are
# the pinned shared tables (a codepoint adjacent to a letter run that one
# engine classifies as a letter and the other as a symbol splits the run
# in one engine only — measured on U+10571 before the pin). The symbol
# alternative is ¬(letter ∪ digit ∪ ws) over the SHARED tables: negate
# the Java property classes plus the re2-only additions, then union back
# the java-only subtractions (they are symbols under the shared table).
BPE_TOKEN_RE = (
    LETTER_CLASS + "+|" + DIGIT_CLASS + "+|"
    "[[^" + r"\p{L}" + RE2_ONLY_LETTER_BODY + r"\p{N}" + RE2_ONLY_DIGIT_BODY
    + WS_CHARS + "]" + JAVA_ONLY_LETTER_BODY + JAVA_ONLY_DIGIT_BODY + "]"
)


def fold_lower(col: Column | str) -> Column:
    """Portable case fold: ``translate`` over the FROZEN agreement set of
    Java's and DuckDB's ``lower()`` (1:1 mappings both engines produce
    identically; disputed codepoints fold to themselves). Identical to
    ``lower()`` on ASCII and on every ordinary cased script; differs only
    where the engines differ from EACH OTHER — which is exactly where
    ``lower()`` must not sit on a value-exact surface. 1:1 by
    construction, so ``length(fold_lower(x)) == length(x)``.
    SQL twin: ``translate(x, FOLD_FROM, FOLD_TO)``."""
    return F.translate(F.coalesce(_c(col), F.lit("")), FOLD_FROM, FOLD_TO)


def bpe_token_count(col: Column | str) -> Column:
    """Regex-token count approximating BPE pre-tokenization (native
    regexp_count over the frozen letter/digit classes)."""
    return F.regexp_count(F.coalesce(_c(col), F.lit("")), F.lit(BPE_TOKEN_RE))


def char_class_counts(col: Column | str) -> dict[str, Column]:
    """Counts of script classes used by the language heuristic."""
    c = F.coalesce(_c(col), F.lit(""))
    return {
        "total": F.length(c),
        "hiragana": F.regexp_count(c, F.lit(r"[぀-ゟ]")),
        "katakana": F.regexp_count(c, F.lit(r"[゠-ヿ]")),
        "cjk": F.regexp_count(c, F.lit(r"[一-鿿]")),
        "latin": F.regexp_count(c, F.lit(r"[A-Za-z]")),
        "digit": F.regexp_count(c, F.lit(r"[0-9]")),
        "punct": F.regexp_count(c, F.lit(r"[\p{Punct}。、「」・]")),
        "space": F.regexp_count(c, F.lit(WS_CLASS)),
    }


def detect_language(col: Column | str) -> Column:
    """Script-ratio language ID: 'ja' when kana+CJK dominate, 'en' when latin
    dominates, else 'other'; 'unknown' for empty text."""
    cc = char_class_counts(col)
    total = F.greatest(cc["total"], F.lit(1)).cast("double")
    ja_ratio = (cc["hiragana"] + cc["katakana"] + cc["cjk"]) / total
    en_ratio = cc["latin"] / total
    return (
        F.when(cc["total"] == 0, "unknown")
        .when(ja_ratio >= 0.15, "ja")
        .when(en_ratio >= 0.40, "en")
        .otherwise("other")
    )


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality score for corpus filtering.

    Components (each clamped to [0,1]):
      length_ok   — saturating length signal (≥200 chars → 1)
      word_ok     — mean token length in a sane band (2–12 chars)
      punct_ok    — punctuation ratio below 30%
      alpha_ok    — letter-ish (non-digit, non-space) density ≥ 50%
    Score = mean of the four.
    """
    c = F.coalesce(_c(col), F.lit(""))
    cc = char_class_counts(col)
    total = F.greatest(cc["total"], F.lit(1)).cast("double")
    n_tokens = F.greatest(whitespace_token_count(col), F.lit(1)).cast("double")
    mean_tok_len = (total - cc["space"]) / n_tokens
    length_ok = F.least(F.length(c).cast("double") / 200.0, F.lit(1.0))
    word_ok = F.when((mean_tok_len >= 2.0) & (mean_tok_len <= 12.0), 1.0).otherwise(0.0)
    punct_ok = F.when(cc["punct"] / total <= 0.30, 1.0).otherwise(0.0)
    alpha_ratio = (total - cc["digit"] - cc["space"]) / total
    alpha_ok = F.when(alpha_ratio >= 0.5, 1.0).otherwise(0.0)
    # 5dp: the mean of quarter-components steps in 0.00125 increments, which
    # is exact at 5 decimals (4dp would sit on rounding boundaries)
    return F.round((length_ok + word_ok + punct_ok + alpha_ok) / 4.0, 5)


def doc_fingerprint(col: Column | str) -> Column:
    """Stable 64-bit whole-document fingerprint over normalized text
    (portable fold — the fingerprint is a value-exact gate surface)."""
    norm = F.trim(F.regexp_replace(fold_lower(col), WS_CLASS + "+", " "))
    return F.xxhash64(norm)


def rolling_fingerprints(col: Column | str, window: int = 8) -> Column:
    """Winnowing-style rolling fingerprints: hash every ``window``-word
    sliding chunk — array<long>, native. Feed to ``array_min`` for a
    winnowed doc signature or explode for chunk-level matching."""
    words = F.split(
        F.trim(F.regexp_replace(fold_lower(col), WS_CLASS + "+", " ")),
        " ",
    )
    n = F.size(words)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n - (window - 1), F.lit(1))),
        lambda i: F.xxhash64(F.array_join(F.slice(words, i, window), " ")),
    )
