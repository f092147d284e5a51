"""Text analysis operators: tokenization, language ID, quality
scoring, fingerprinting (SURVEY.md §2.2 #30 + mandated extensions).

Everything here is JVM-side Catalyst expressions (split / regexp /
array higher-order functions) — no Python UDFs — so the operators run
inside WholeStageCodegen and scale linearly with no shuffle until the
final aggregation. Token semantics are chosen to be expressible
identically in DuckDB (``string_split_regex`` + list lambdas) so every
derived metric has an exact oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tokenizer contract shared with the DuckDB oracles:
#: lowercase → trim → split on runs of whitespace.
TOKENS_SQL = r"split(trim(lower({c})), '\\s+')"
TOKENS_DUCK = r"string_split_regex(trim(lower({c})), '\s+')"

#: BPE-ish surface tokenizer: letter runs, digit runs, single symbols.
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: Tiny per-language stopword sets for the n-gram/stopword language
#: heuristic. Priority order breaks ties deterministically.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "es": ["el", "la", "de", "y", "es"],
    "fr": ["le", "la", "de", "et", "est"],
    "de": ["der", "die", "das", "und", "ist"],
    "zh": ["de", "shi", "le", "zai", "he"],
}
LANG_PRIORITY = ["en", "es", "fr", "de", "zh"]


def tokens(col: str = "text") -> Column:
    """Whitespace tokens of a lowercased, trimmed text column."""
    return F.expr(TOKENS_SQL.format(c=col))


def token_count(col: str = "text") -> Column:
    return F.size(tokens(col)).cast("long")


def bpe_token_count(col: str = "text") -> Column:
    """Sub-word-ish token count via the BPE-like regex.

    The ``\\s`` must be double-escaped inside the Spark SQL string
    literal (the SQL parser eats one level of backslash; unescaped it
    silently becomes the class ``[^...9s]``).
    """
    pat = BPE_RE.replace("\\", "\\\\")
    return F.size(F.expr(rf"regexp_extract_all({col}, '{pat}', 0)")).cast("long")


def punct_count(col: str = "text") -> Column:
    return F.size(
        F.expr(rf"regexp_extract_all({col}, '[^A-Za-z0-9\\s]', 0)")
    ).cast("long")


def stopword_hits(col: str = "text", lang: str = "en") -> Column:
    """How many tokens are in ``lang``'s stopword list (JVM lambda)."""
    words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return F.expr(
        f"CAST(size(filter({TOKENS_SQL.format(c=col)}, "
        f"t -> array_contains(array({words}), t))) AS BIGINT)"
    )


def stopword_hits_duck(col: str, lang: str) -> str:
    """The DuckDB spelling of :func:`stopword_hits` (oracle side)."""
    words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return (
        f"CAST(len(list_filter({TOKENS_DUCK.format(c=col)}, "
        f"t -> list_contains([{words}], t))) AS BIGINT)"
    )


def predicted_lang(col: str = "text") -> Column:
    """Argmax language by stopword hits, ties broken by LANG_PRIORITY.

    A deliberately simple, deterministic n-gram-free heuristic (real
    language ID would be a fastText-style model behind a pandas UDF —
    out of scope per the container constraints; the *pipeline shape*
    is what matters at 100 TB: one linear scan, no shuffle).
    """
    return F.expr(_predicted_lang_sql(col, spark_dialect=True))


def _predicted_lang_sql(col: str, spark_dialect: bool) -> str:
    hit_exprs = []
    for lang in LANG_PRIORITY:
        words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        if spark_dialect:
            hit_exprs.append(
                f"size(filter({TOKENS_SQL.format(c=col)}, "
                f"t -> array_contains(array({words}), t)))"
            )
        else:
            hit_exprs.append(
                f"len(list_filter({TOKENS_DUCK.format(c=col)}, "
                f"t -> list_contains([{words}], t)))"
            )
    greatest = f"greatest({', '.join(hit_exprs)})"
    case = "CASE "
    for lang, hits in zip(LANG_PRIORITY, hit_exprs):
        case += f"WHEN {hits} = {greatest} AND {greatest} > 0 THEN '{lang}' "
    case += "ELSE 'unknown' END"
    return case


def predicted_lang_duck(col: str = "text") -> str:
    return _predicted_lang_sql(col, spark_dialect=False)


def fingerprint(col: str = "text") -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted set
    of tokens — the classic near-dup-robust 'fingerprint' normalization
    (case/whitespace/word-order insensitive)."""
    return F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col))))
    )


FINGERPRINT_DUCK = (
    "md5(array_to_string(list_sort(list_distinct("
    + TOKENS_DUCK.format(c="{c}")
    + ")), ' '))"
)


def rolling_kgram_hashes(col: str = "text", k: int = 8) -> Column:
    """Rolling character-k-gram hashes of a document (one per
    position). Materialize this as a COLUMN before winnowing —
    inlining it would re-hash the whole document per reference
    (the shingles_from_tokens lesson, operators/dedup.py)."""
    return F.expr(
        f"IF(length({col}) < {k}, array(), "
        f"transform(sequence(1, length({col}) - {k - 1}), "
        f"i -> xxhash64(substring({col}, i, {k}))))"
    )


def winnow_from_hashes(hash_col: str, window: int = 4) -> Column:
    """Winnowed fingerprint selection (Schleimer/Wilkerson/Aiken MOSS
    scheme) over a materialized rolling-hash column: keep the minimum
    hash of each ``window`` consecutive k-grams, dedupe.

    Near-duplicate documents share most selected fingerprints even
    under local edits (the guarantee winnowing is built for), so the
    selected-set overlap is a position-robust dup signal — the
    'rolling hash fingerprinting' pipeline op, all Catalyst lambdas:
    O(len·window) per doc, no shuffle, no Python.
    """
    return F.expr(
        f"""
        IF(size({hash_col}) < {window}, array(),
           array_distinct(transform(
             sequence(0, size({hash_col}) - {window}),
             w -> array_min(slice({hash_col}, w + 1, {window})))))
        """
    )


def with_text_stats(df: DataFrame, col: str = "text") -> DataFrame:
    """Attach per-document token/length/punctuation statistics."""
    t = tokens(col)
    n_tok = F.size(t).cast("long")
    return df.withColumns(
        {
            "n_tokens": n_tok,
            "n_bpe_tokens": bpe_token_count(col),
            "n_punct": punct_count(col),
            # integer fixed-point: avg token length ×100, floor-divided
            "avg_token_len_x100": F.expr(
                f"aggregate({TOKENS_SQL.format(c=col)}, CAST(0 AS BIGINT), "
                f"(acc, x) -> acc + length(x)) * 100 "
                f"DIV size({TOKENS_SQL.format(c=col)})"
            ),
            "stop_hits": stopword_hits(col, "en"),
        }
    )
