"""Cross-engine text expression builders (tokenize, shingle, score).

Each builder emits the same logical expression in two dialects —
``spark`` (Spark SQL, used via ``F.expr`` so everything stays inside
whole-stage codegen; no Python UDFs in the hot path) and ``duckdb``
(the oracle).  Escaping differs: Spark SQL string literals process
backslashes, DuckDB's don't, so the regex ``\\s+`` is spelled per
dialect.
"""

from __future__ import annotations

from twitter_followers_patterns_mapreduce_spark.functions.hashing import h64_sql

#: Stopword lists for the language-ID heuristic (tiny, deterministic;
#: real corpora would use fastText — out of scope for this container).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is", "in", "it"),
    "es": ("el", "la", "los", "de", "y", "que", "un", "es"),
    "de": ("der", "die", "und", "das", "ein", "ist", "nicht", "zu"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est"),
    "zh": ("de5", "shi4", "le5", "zai4", "you3", "he2", "wo3", "ta1"),
}
#: Deterministic argmax priority when scores tie.
LANG_PRIORITY = ("en", "es", "de", "fr", "zh")


def tokens_sql(text: str, dialect: str) -> str:
    """Whitespace tokenization → array of non-empty tokens."""
    if dialect == "spark":
        return f"filter(split({text}, '\\\\s+'), t -> t <> '')"
    return f"list_filter(string_split_regex({text}, '\\s+'), t -> t <> '')"


def bpe_ish_tokens_sql(text: str, dialect: str) -> str:
    """BPE-ish subword segmentation: runs of letters, runs of digits, or
    single non-space symbols — the classic pre-tokenizer regex."""
    pat_spark = "'[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]'"
    pat_duck = "'[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'"
    if dialect == "spark":
        return f"regexp_extract_all({text}, {pat_spark}, 0)"
    return f"regexp_extract_all({text}, {pat_duck})"


def size_sql(arr: str, dialect: str) -> str:
    return f"size({arr})" if dialect == "spark" else f"len({arr})"


def shingles_sql(toks: str, n: int, dialect: str) -> str:
    """Distinct n-word shingles (space-joined) from a token array.
    Empty array when the doc has fewer than n tokens."""
    if dialect == "spark":
        parts = ", ' ', ".join(f"element_at({toks}, i+{j})" for j in range(n))
        return (
            f"CASE WHEN size({toks}) >= {n} THEN "
            f"array_distinct(transform(sequence(1, size({toks})-{n - 1}), i -> concat({parts}))) "
            f"ELSE array() END"
        )
    parts = " || ' ' || ".join(f"{toks}[i+{j}]" for j in range(n))
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({toks})-{n - 2}, 1)), i -> {parts}))"
    )


def transform_sql(arr: str, lam: str, dialect: str) -> str:
    fn = "transform" if dialect == "spark" else "list_transform"
    return f"{fn}({arr}, {lam})"


def array_min_sql(arr: str, dialect: str) -> str:
    fn = "array_min" if dialect == "spark" else "list_min"
    return f"{fn}({arr})"


def count_in_set_sql(toks: str, words: tuple[str, ...], dialect: str) -> str:
    """#tokens belonging to a fixed word set (stopword-ratio building block)."""
    lst = ", ".join(f"'{w}'" for w in words)
    if dialect == "spark":
        return f"size(filter({toks}, t -> t IN ({lst})))"
    return f"len(list_filter({toks}, t -> t IN ({lst})))"


def lang_id_sql(toks: str, dialect: str) -> str:
    """Deterministic language-ID heuristic: argmax of per-language stopword
    hits with a fixed tie-break priority; 'und' when no hits at all."""
    scores = {
        lang: count_in_set_sql(toks, words, dialect) for lang, words in LANG_STOPWORDS.items()
    }
    others = {
        lang: ", ".join(scores[o] for o in LANG_PRIORITY if o != lang) for lang in LANG_PRIORITY
    }
    whens = " ".join(
        f"WHEN {scores[lang]} >= greatest({others[lang]}) THEN '{lang}'"
        for lang in LANG_PRIORITY
    )
    total = " + ".join(scores.values())
    return f"CASE WHEN ({total}) = 0 THEN 'und' {whens} ELSE 'und' END"


def doc_fingerprint_sql(text: str, dialect: str) -> str:
    """Document fingerprint: min of h64 over distinct 3-word shingles
    (a 1-permutation minhash / content-defined rolling fingerprint);
    falls back to h64 of the whole text for tiny docs."""
    toks = tokens_sql(text, dialect)
    sh = shingles_sql(toks, 3, dialect)
    hashed = transform_sql(sh, f"s -> {h64_sql('s', dialect)}", dialect)
    return f"coalesce({array_min_sql(hashed, dialect)}, {h64_sql(text, dialect)})"
