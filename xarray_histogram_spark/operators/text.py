"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting — row-level Column arithmetic (fully codegen'd, no
shuffle except where aggregation is inherent) with exact DuckDB mirrors."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..binspec import flit, slit
from ..functions import hashing as H

# small built-in stopword sets (top function words) per language
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "den", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "no", "por"),
    "fr": ("le", "la", "de", "et", "un", "est", "pas", "pour", "que", "dans"),
}
LANGS = tuple(STOPWORDS)


def _tok(text: Column) -> Column:
    return H.tokens(text)


# GPT-2-style pre-tokenization pieces: letter runs / digit runs / punctuation
# runs (whitespace separates, never counted).  Restricted to syntax Java
# regex (Spark) and RE2 (DuckDB) interpret identically: explicit character
# classes only — no lookahead, no \s (whose class differs by one codepoint
# between the engines).
BPE_PIECE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]+"


def token_count(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Whitespace tokens, BPE-ish pre-tokenizer pieces (regex runs — the
    GPT-2 pre-tokenization shape), a ceil(chars/4) subword-count proxy, and
    raw characters."""
    toks = _tok(F.col(text_col))
    n_tok = F.size(toks)
    n_pieces = F.regexp_count(F.col(text_col), F.lit(BPE_PIECE_RE))
    n_sub = F.ceil(F.length(F.col(text_col)).cast("double") / F.lit(4.0)).cast(
        "bigint"
    )
    return df.select(
        F.col(id_col),
        n_tok.cast("bigint").alias("n_tokens"),
        n_pieces.cast("bigint").alias("n_pieces"),
        n_sub.alias("n_subwords"),
        F.length(F.col(text_col)).cast("bigint").alias("n_chars"),
    )


def token_count_sql(table: str, text_col: str, id_col: str) -> str:
    toks = H.tokens_sql(text_col)
    return (
        f"SELECT {id_col}, CAST(len({toks}) AS BIGINT) AS n_tokens, "
        f"CAST(len(regexp_extract_all({text_col}, '{BPE_PIECE_RE}')) AS BIGINT) "
        f"AS n_pieces, "
        f"CAST(ceil(CAST(length({text_col}) AS DOUBLE) / {flit(4.0)}) AS BIGINT) "
        f"AS n_subwords, "
        f"CAST(length({text_col}) AS BIGINT) AS n_chars FROM {table}"
    )


def _stop_hits(toks: Column, words) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def _stop_hits_sql(toks: str, words) -> str:
    lst = ", ".join(slit(w) for w in words)
    return f"len(list_filter({toks}, t -> t IN ({lst})))"


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic quality features + combined score:
    mean token length, alpha ratio, stopword ratio, score = their product
    blend.  Pure row-level double arithmetic (deterministic)."""
    text = F.col(text_col)
    toks = _tok(text)
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(text).cast("double")
    alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    stop = _stop_hits(toks, STOPWORDS["en"]).cast("double")
    mean_tok_len = n_chars / F.nullif(n_tok, F.lit(0.0))
    alpha_ratio = alpha / F.nullif(n_chars, F.lit(0.0))
    stop_ratio = stop / F.nullif(n_tok, F.lit(0.0))
    score = alpha_ratio * F.lit(0.5) + stop_ratio * F.lit(0.3) + F.when(
        (mean_tok_len >= F.lit(3.0)) & (mean_tok_len <= F.lit(10.0)), F.lit(0.2)
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        mean_tok_len.alias("mean_tok_len"),
        alpha_ratio.alias("alpha_ratio"),
        stop_ratio.alias("stop_ratio"),
        score.alias("quality"),
    )


def quality_score_sql(table: str, text_col: str, id_col: str) -> str:
    toks = H.tokens_sql(text_col)
    n_tok = f"CAST(len({toks}) AS DOUBLE)"
    n_chars = f"CAST(length({text_col}) AS DOUBLE)"
    alpha = f"CAST(length(regexp_replace({text_col}, '[^A-Za-z]', '', 'g')) AS DOUBLE)"
    stop = f"CAST({_stop_hits_sql(toks, STOPWORDS['en'])} AS DOUBLE)"
    mtl = f"({n_chars} / NULLIF({n_tok}, {flit(0.0)}))"
    ar = f"({alpha} / NULLIF({n_chars}, {flit(0.0)}))"
    sr = f"({stop} / NULLIF({n_tok}, {flit(0.0)}))"
    score = (
        f"{ar} * {flit(0.5)} + {sr} * {flit(0.3)} + "
        f"CASE WHEN {mtl} >= {flit(3.0)} AND {mtl} <= {flit(10.0)} "
        f"THEN {flit(0.2)} ELSE {flit(0.0)} END"
    )
    return (
        f"SELECT {id_col}, {mtl} AS mean_tok_len, {ar} AS alpha_ratio, "
        f"{sr} AS stop_ratio, {score} AS quality FROM {table}"
    )


def lang_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """n-gram/stopword-heuristic language ID: argmax of per-language stopword
    hit counts (ties broken by LANGS order), 'und' when no hits."""
    toks = _tok(F.col(text_col))
    hits = {lang: _stop_hits(toks, ws) for lang, ws in STOPWORDS.items()}
    # deterministic argmax: fold in declared order, strict > keeps earlier lang
    best: Column = F.lit("und")
    best_n: Column = F.lit(0)
    for lang in LANGS:
        best = F.when(hits[lang] > best_n, F.lit(lang)).otherwise(best)
        best_n = F.when(hits[lang] > best_n, hits[lang]).otherwise(best_n)
    return df.select(F.col(id_col), best.alias("lang_pred"))


def lang_id_sql(table: str, text_col: str, id_col: str) -> str:
    toks = H.tokens_sql(text_col)
    hits = {l: _stop_hits_sql(toks, ws) for l, ws in STOPWORDS.items()}
    best, best_n = "'und'", "0"
    for lang in LANGS:
        h = hits[lang]
        best = f"CASE WHEN {h} > {best_n} THEN {slit(lang)} ELSE {best} END"
        best_n = f"CASE WHEN {h} > {best_n} THEN {h} ELSE {best_n} END"
    return f"SELECT {id_col}, {best} AS lang_pred FROM {table}"


def fingerprint(df: DataFrame, text_col: str, id_col: str, k: int = 8) -> DataFrame:
    """Document fingerprints: md5 of whitespace-normalised lowercase text +
    min-shingle rolling fingerprint (winnowing-style representative hash)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    fp_doc = F.md5(norm.cast("binary"))
    mins = F.array_min(
        F.transform(H.shingles(norm, k), lambda s: F.md5(s.cast("binary")))
    )
    return df.select(
        F.col(id_col), fp_doc.alias("fp_doc"), mins.alias("fp_shingle")
    )


def fingerprint_sql(table: str, text_col: str, id_col: str, k: int = 8) -> str:
    norm = f"trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g'))"
    sh = H.shingles_sql(norm, k)
    return (
        f"SELECT {id_col}, md5({norm}) AS fp_doc, "
        f"list_min(list_transform({sh}, s -> md5(s))) AS fp_shingle "
        f"FROM {table}"
    )
