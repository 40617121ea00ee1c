"""Adversarial-corpus oracle parity: every text/dedup/sampling/curation
mirror driven with a CRAFTED documents table through BOTH engines.

The driver's hash gate only ever sees the clean synthetic fixtures; these
tests replay the same Spark-vs-DuckDB comparison over inputs the fixtures
never contain — NULL and empty text, whitespace-only documents, the
U+000B vertical tab (the one Java-\\s vs RE2 discrepancy the tokenizer
explicitly pins), multibyte unicode, embedded quotes, repeated lines and
exact duplicates.  The pattern (write crafted rows to parquet, run the
operator's own *_sql builder in DuckDB, exact-compare) is what exposed
the quantization NULL-element and NaN-cosine divergences — kept here as
a standing regression net for the older mirrors.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from xarray_histogram_spark.operators import dedup as dd
from xarray_histogram_spark.operators import sampling as sp
from xarray_histogram_spark.operators import text as tx

from .util import assert_matches_sql

ROWS = [
    (1, "the quick brown fox jumps over the lazy dog", "en", "s0"),
    (2, "the quick brown fox jumps over the lazy dog", "en", "s1"),  # dup of 1
    (3, None, "en", "s0"),                       # NULL text
    (4, "", "de", "s1"),                         # empty text
    (5, "   \t  \n ", "de", "s0"),               # whitespace only
    (6, "tab\x0bseparated tokens here", "fr", "s1"),   # U+000B edge
    (7, "naïve café déjà-vu 文字化け ☃ emoji", "fr", "s0"),  # multibyte
    (8, "it's a \"quoted\" 'string' -- with; commas,", "en", "s1"),
    (9, "line one\nline two\nline one\nline two\nline three", "en", "s0"),
    (10, "a a a a a a a a a a", "und", "s1"),    # degenerate repetition
    (11, "x", "und", "s0"),                      # single char
    (12, "the quick brown fox jumps over the lazy cat", "en", "s1"),  # near-dup
]


@pytest.fixture(scope="module")
def adv(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("adv") / "docs.parquet")
    df = spark.createDataFrame(
        ROWS, "doc_id long, text string, lang string, source string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW adocs AS SELECT * FROM read_parquet('{p}/*.parquet')")
    return df, con


def _check(sdf, sql, con):
    assert_matches_sql(sdf, sql, con)


def test_adv_token_count(spark, adv):
    df, con = adv
    _check(tx.token_count(df, "text", "doc_id"),
           tx.token_count_sql("adocs", "text", "doc_id"), con)


def test_adv_quality_score(spark, adv):
    df, con = adv
    _check(tx.quality_score(df, "text", "doc_id"),
           tx.quality_score_sql("adocs", "text", "doc_id"), con)


def test_adv_lang_id(spark, adv):
    df, con = adv
    _check(tx.lang_id(df, "text", "doc_id"),
           tx.lang_id_sql("adocs", "text", "doc_id"), con)


def test_adv_fingerprint(spark, adv):
    df, con = adv
    _check(tx.fingerprint(df, "text", "doc_id"),
           tx.fingerprint_sql("adocs", "text", "doc_id"), con)


def test_adv_repetition(spark, adv):
    df, con = adv
    _check(tx.repetition_stats(df, "text", "doc_id"),
           tx.repetition_stats_sql("adocs", "text", "doc_id"), con)


def test_adv_top_terms(spark, adv):
    df, con = adv
    _check(tx.top_terms(df, "text", "doc_id", k=3, min_df=2),
           tx.top_terms_sql("adocs", "text", "doc_id", k=3, min_df=2), con)


def test_adv_vocabulary(spark, adv):
    df, con = adv
    _check(tx.vocabulary(df, "text", "doc_id", k=10),
           tx.vocabulary_sql("adocs", "text", "doc_id", k=10), con)


def test_adv_line_dedup(spark, adv):
    df, con = adv
    _check(
        tx.remove_repeated_lines(df, "text", "doc_id", max_occurrences=1),
        tx.remove_repeated_lines_sql("adocs", "text", "doc_id",
                                     max_occurrences=1),
        con,
    )


def test_adv_dup_ngrams(spark, adv):
    df, con = adv
    _check(tx.dup_ngram_stats(df, "text", "doc_id", n=2),
           tx.dup_ngram_stats_sql("adocs", "text", "doc_id", n=2), con)


def test_adv_exact_dedup(spark, adv):
    df, con = adv
    _check(dd.exact_dedup(df, "text", "doc_id"),
           dd.exact_dedup_sql("adocs", "text", "doc_id"), con)


def test_adv_minhash_signatures(spark, adv):
    df, con = adv
    _check(dd.minhash_signatures(df, "text", "doc_id"),
           dd.minhash_signatures_sql("adocs", "text", "doc_id"), con)


def test_adv_jaccard_pairs(spark, adv):
    df, con = adv
    _check(dd.jaccard_pairs(df, "text", "doc_id"),
           dd.jaccard_pairs_sql("adocs", "text", "doc_id"), con)


def test_adv_simhash(spark, adv):
    df, con = adv
    _check(dd.simhash(df, "text", "doc_id"),
           dd.simhash_sql("adocs", "text", "doc_id"), con)


def test_adv_simhash64_pairs(spark, adv):
    df, con = adv
    _check(dd.simhash_pairs(df, "text", "doc_id", max_hamming=3),
           dd.simhash_pairs_sql("adocs", "text", "doc_id", max_hamming=3),
           con)


def test_adv_contamination(spark, adv):
    df, con = adv
    bench = df.where(F.col("doc_id") == 12).select(
        F.col("doc_id").alias("bench_id"), F.col("text")
    )
    _check(
        dd.ngram_contamination(df, bench, "text", "doc_id"),
        dd.ngram_contamination_sql(
            "adocs",
            "(SELECT doc_id AS bench_id, text FROM adocs WHERE doc_id = 12)",
            "text", "doc_id",
        ),
        con,
    )


def test_adv_sampling(spark, adv):
    df, con = adv
    _check(
        sp.deterministic_sample(df, "doc_id", 0.5, salt="adv'x"),
        f"SELECT * FROM adocs WHERE "
        + sp.deterministic_sample_sql("doc_id", 0.5, salt="adv'x"),
        con,
    )
    fr = [("train", 0.6), ("val", 0.2), ("test", 0.2)]
    _check(
        sp.assign_splits(df, "doc_id", fr),
        f"SELECT *, {sp.assign_splits_sql('doc_id', fr)} AS split FROM adocs",
        con,
    )
    _check(
        sp.topk_per_group(df, ["lang"], "doc_id", 2),
        sp.topk_per_group_sql(
            "adocs", ["doc_id", "text", "lang", "source"], ["lang"],
            "doc_id", 2,
        ),
        con,
    )


def test_adv_stratified_take_chunks(spark, adv):
    df, con = adv
    rates = {"en": 0.8, "it's": 0.5}      # stratum name with a quote
    _check(
        sp.stratified_sample(df, "lang", "doc_id", rates, default_rate=0.3,
                             salt="s'1"),
        "SELECT * FROM adocs WHERE "
        + sp.stratified_sample_sql("lang", "doc_id", rates,
                                   default_rate=0.3, salt="s'1"),
        con,
    )
    _check(
        sp.deterministic_take(df, "doc_id", 5, salt="t'2"),
        sp.deterministic_take_sql(
            "adocs", ["doc_id", "text", "lang", "source"], "doc_id", 5,
            salt="t'2",
        ),
        con,
    )
    toks = df.select("doc_id", "source", tx.token_count_cols("text")[0])
    _check(
        sp.chunk_assignments(toks, "doc_id", "n_tokens", 7, "source"),
        sp.chunk_assignments_sql(
            f"(SELECT doc_id, source, "
            f"{tx.token_count_sql('adocs', 'text', 'doc_id').split('SELECT ')[0] or ''}"
            f"CAST(len(list_filter(regexp_split_to_array(lower(text), "
            f"'[ \\t\\n\\r\\f\\x0B]+'), t -> t != '')) AS BIGINT) AS n_tokens "
            f"FROM adocs)",
            "doc_id", "n_tokens", 7, "source",
        ),
        con,
    )


def test_adv_curate(spark, adv):
    from xarray_histogram_spark.operators.curate import (
        curate_documents, curate_documents_sql,
    )

    df, con = adv
    for wide in (True, False):
        _check(
            curate_documents(
                df, "text", "doc_id", quality_min=0.1, langs=("en", "und"),
                salt="c'3", wide_rows=wide,
            ),
            curate_documents_sql(
                "adocs", "text", "doc_id", quality_min=0.1,
                langs=("en", "und"), salt="c'3",
            ),
            con,
        )


@pytest.mark.slow  # heavy battery; full-profile only
def test_adv_events_mirrors(spark, tmp_path):
    """Every batch events mirror against a crafted events table with NULL
    ts / value / event_type / user_id rows: event-time operators drop
    NULL-ts rows on both engines, NULL event_type is a REAL group (the
    session mirror needs NULL-safe join equality), and the temporal joins
    keep their NULL-key/ts semantics."""
    import datetime as dt

    import duckdb

    import xarray_histogram_spark.entry_queries as eq

    base = dt.datetime(2024, 1, 1)
    types = ["click", "error", "purchase", "signup", "view", None]
    rows = []
    for i in range(200):
        ts = None if i % 37 == 0 else base + dt.timedelta(minutes=13 * i)
        rows.append((
            i, ts, None if i % 29 == 0 else i % 7, types[i % 6],
            None if i % 31 == 0 else float(i % 50) * 9.7,
            '{"k": %d}' % (i % 120) if i % 11 else None,
        ))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    d = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS "
        f"SELECT * FROM read_parquet('{d}/events.parquet/*.parquet')"
    )
    # streaming_window_hist included: a REAL streaming execution over the
    # crafted corpus — its oracle needs the same NULL-ts drop
    for name in (
        "events_hourly_hist", "events_type_value_hist",
        "events_session_hist", "events_sliding_hist",
        "events_props_json_hist", "streaming_window_hist",
        "events_asof_join", "events_range_join", "events_funnel",
    ):
        fn, sql = eq._REGISTRY[name]
        assert_matches_sql(fn(spark, d), sql, con)


@pytest.mark.slow  # heavy battery; full-profile only
def test_adv_streaming_mirrors(spark, tmp_path):
    """REAL streaming executions (stateful cumulative histogram, dedup
    state, stream-stream range join) over crafted NULL-laden corpora:
    NULL text fingerprints (md5(NULL)=NULL) group consistently, NULL
    values take the flow path, NULL ts rows are dropped by watermarked
    event-time operators on both engines."""
    import datetime as dt

    import duckdb

    import xarray_histogram_spark.entry_queries as eq

    d = str(tmp_path)
    base = dt.datetime(2024, 1, 1)
    types = ["click", "error", "purchase", "signup", "view", None]
    rows = []
    for i in range(200):
        ts = None if i % 37 == 0 else base + dt.timedelta(minutes=13 * i)
        rows.append((
            i, ts, None if i % 29 == 0 else i % 7, types[i % 6],
            None if i % 31 == 0 else float(i % 50) * 9.7, None,
        ))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    docs = [
        (1, "same text", "en", "s0", 9), (2, "same text", "en", "s1", 9),
        (3, None, "en", "s0", 0), (4, "", "de", "s1", 0),
        (5, "other", "fr", "s0", 5), (10, None, "de", "s1", 0),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    con = duckdb.connect()
    for t_ in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {t_} AS "
            f"SELECT * FROM read_parquet('{d}/{t_}.parquet/*.parquet')"
        )
    for name in (
        "streaming_stateful_hist", "streaming_dedup_state",
        "streaming_range_join",
    ):
        fn, sql = eq._REGISTRY[name]
        assert_matches_sql(fn(spark, d), sql, con)


def test_adv_decode_meta(spark, adv):
    """Multimodal metadata mirror over the crafted corpus: NULL text,
    empty payloads, multibyte unicode, embedded quotes — octet_length and
    md5-prefix must agree byte-for-byte across engines."""
    from xarray_histogram_spark.operators import multimodal as mm

    df, con = adv
    media = mm.as_media(df, "doc_id", "text", "text/plain")
    _check(mm.decode_meta(media),
           mm.decode_meta_sql("adocs", "doc_id", "text"), con)


def test_adv_codec_extreme_ids(spark):
    """Synth→decode round-trips hold for negative, zero, and huge media
    ids (Python %256 is floor-mod, so payload bytes stay valid for any
    id; the decoders recover the exact generated rasters/samples)."""
    from xarray_histogram_spark.operators import multimodal as mm

    ids = [-7, -1, 0, 3, 2**31 - 1, 2**40]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    img = {r["media_id"]: r for r in mm.decode_image(
        mm.synth_bmp_media(docs, "doc_id")).collect()}
    assert set(img) == set(ids)
    for i in ids:
        want = sum((i * 31 + k) % 256 for k in range(45))
        assert img[i]["px_sum"] == want and img[i]["width"] == 5
        assert img[i]["topleft_r"] == (i * 31) % 256
    frames = mm.sample_frames(
        mm.synth_video_media(docs, "doc_id", n_frames=4, width=4, height=3),
        every_n=2,
    ).collect()
    assert {r["media_id"] for r in frames} == set(ids)
    for r in frames:
        i, f = r["media_id"], r["frame_idx"]
        assert r["px_sum"] == sum((i * 31 + f * 7 + k) % 256 for k in range(36))
    aud = {r["media_id"]: r for r in mm.decode_audio(
        mm.synth_wav_media(docs, "doc_id")).collect()}
    for i in ids:
        assert aud[i]["format"] == "wav" and aud[i]["n_samples"] > 0


@pytest.mark.slow  # heavy battery; full-profile only
def test_adv_similarity_mirrors(spark, tmp_path):
    """Similarity mirrors over crafted embeddings: exact duplicate of the
    query, NaN element, zero-norm, NULL vector, NULL id — rankings and
    pair sets must match DuckDB exactly (total cosine: zero-norm →
    try_divide NULL, non-finite sims → NULL, NULLs sort last)."""
    import math

    import duckdb

    from xarray_histogram_spark.operators import similarity as sim

    DIM = 64

    def vec(seed, bad=None):
        v = [math.sin(seed * 13.7 + k) for k in range(DIM)]
        if bad == "nan":
            v[3] = float("nan")
        if bad == "zero":
            v = [0.0] * DIM
        return v

    rows = [
        (0, vec(0), 1), (1, vec(0), 1),           # query + exact dup
        (2, vec(5), 2), (3, vec(0, "nan"), 2),    # NaN element
        (4, vec(0, "zero"), 3), (5, None, 3),     # zero norm, NULL vec
        (None, vec(9), 1),                        # NULL id
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    p = str(tmp_path / "emb.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    src = spark.read.parquet(p)
    _check(sim.cosine_topk(src, query_id=0, k=5),
           sim.cosine_topk_sql("embeddings", query_id=0, k=5), con)
    _check(sim.embed_dup_pairs(src, threshold=0.3),
           sim.embed_dup_pairs_sql("embeddings", threshold=0.3), con)
    _check(sim.ann_topk(src, query_id=0, k=5),
           sim.ann_topk_sql("embeddings", query_id=0, k=5), con)
    _check(sim.ivf_topk(src, query_id=0, k=5),
           sim.ivf_topk_sql("embeddings", query_id=0, k=5), con)
    # dimension-mismatch contract: one corrupt (short/empty) vector must
    # RAISE the explicit guard, not silently degrade rankings
    bad = df.unionByName(
        spark.createDataFrame([(7, [1.0, 2.0], 2)],
                              "vec_id long, embedding array<float>, label int")
    )
    with pytest.raises(Exception, match="dimension mismatch"):
        sim.cosine_topk(bad, query_id=0, k=5).collect()


PII_ROWS = [
    (1, "a@b.co", "en", "s0"),                        # whole text IS the email
    (2, "x 12.3.4.5@host999-123-4567.example.com y", "en", "s1"),  # chain order
    (3, "почта: юзер@пример.рф and real@ex.com", "fr", "s0"),  # non-ASCII local
    (4, "tel +123456 too short, +1234567 ok", "de", "s1"),  # 6 vs 7 digits
    (5, "999.999.999.999 and 1.2.3.4.5 runs", "de", "s0"),  # degenerate IPs
    (6, "regex meta []()*+?{}| \\d $1 literals", "en", "s1"),
    (7, None, "en", "s0"),
    (8, "", "und", "s1"),
    (9, "123-45-678 no, 123-45-6789 yes, 1234-56-7890?", "en", "s0"),
    (10, "a@b.co.a@b.co chained emails", "en", "s1"),
    (11, "see https://ex.org/a?b=c#d, http://EX.org and https://", "en", "s0"),
    (12, "url in quotes 'https://q.net/x' and (http://p.io/y)", "de", "s1"),
    (13, "ftp://not.matched and https//broken.org", "fr", "s0"),
    (14, "multi https://a.io/1 https://a.io/1 same url twice", "en", "s1"),
    (15, "cards 4111-1111-1111-1111, 4111 1111 1111 11, 4111-1111-1111-1 no",
     "en", "s0"),
    (16, "amex 3782 822463 10005 diners 3056-930902-5904 years 1914 1918 1939 1945",
     "en", "s1"),
    # unseparated PANs: valid Luhn, invalid check digit, valid-but-inside
    # a longer digit run (boundary), 15-digit Amex, 12-digit too-short,
    # underscore-adjacent (underscore IS a word char in both engines)
    (17, "raw 4111111111111111 bad 4111111111111112 run 94111111111111111",
     "en", "s0"),
    (18, "amex 378282246310005 short 411111111111 tied_4111111111111111",
     "en", "s1"),
    (19, "dup 5500005555555559 and 5500005555555559 twice", "en", "s0"),
]


@pytest.fixture(scope="module")
def advp(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("advp") / "docs.parquet")
    df = spark.createDataFrame(
        PII_ROWS, "doc_id long, text string, lang string, source string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW pdocs AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    return spark.read.parquet(p), con


def test_adv_pii_scrub(spark, advp):
    """PII mirror over edge inputs: emails at string boundaries, the
    redaction-chain-order trap, almost-matches (6-digit phone, 5-octet
    'IP'), regex metacharacters IN the text, NULL/empty text."""
    df, con = advp
    _check(tx.pii_scrub(df, "text", "doc_id"),
           tx.pii_scrub_sql("pdocs", "text", "doc_id"), con)


def test_adv_extract_urls(spark, advp):
    """URL mirror: scheme-only tail, uppercase host, quoted/parenthesised
    URLs (class excludes quotes/parens), duplicate URLs keep distinct
    1-based positions, non-matching schemes yield no rows."""
    df, con = advp
    _check(tx.extract_urls(df, "text", "doc_id"),
           tx.extract_urls_sql("pdocs", "text", "doc_id"), con)


def test_adv_balanced_sample(spark, advp):
    """Balanced-mixture mirror: NULL group key forms its own group; the
    HUGEINT-division thresholds must reproduce the Python integers."""
    df, con = advp
    withnull = df.withColumn(
        "lang", F.when(F.col("doc_id") % 3 == 0, None).otherwise(F.col("lang"))
    )
    con.execute(
        "CREATE OR REPLACE VIEW ndocs AS SELECT doc_id, text, "
        "CASE WHEN doc_id % 3 = 0 THEN NULL ELSE lang END AS lang, source "
        "FROM pdocs"
    )
    _check(
        sp.balanced_sample(withnull, "lang", "doc_id", 2).select(
            "doc_id", "lang"
        ),
        sp.balanced_sample_sql("ndocs", ["doc_id", "lang"], "lang",
                               "doc_id", 2),
        con,
    )
    # NULL *sampling key* inside a kept-whole group: must drop on BOTH
    # engines (review-found: a bare `n <= target OR draw < thr` oracle
    # short-circuits TRUE and keeps it while Spark's NULL draw drops it)
    kdf = spark.createDataFrame(
        [(1, "a"), (2, "a"), (None, "a"), (10, "b"), (11, "b")],
        "id LONG, grp STRING",
    )
    con.execute(
        "CREATE OR REPLACE VIEW kdocs AS "
        "SELECT CAST(id AS BIGINT) AS id, grp FROM (VALUES "
        "(1, 'a'), (2, 'a'), (NULL, 'a'), (10, 'b'), (11, 'b')"
        ") v(id, grp)"
    )
    out = sp.balanced_sample(kdf, "grp", "id", 5)
    assert out.where(F.col("id").isNull()).count() == 0
    _check(
        out.select("id", "grp"),
        sp.balanced_sample_sql("kdocs", ["id", "grp"], "grp", "id", 5),
        con,
    )


def test_adv_ann_batch(spark, tmp_path):
    """Batch-ANN mirror over the crafted embeddings (NaN element,
    zero-norm, NULL vector, NULL id): per-query rankings must match."""
    import math

    import duckdb as _d

    from xarray_histogram_spark.operators import similarity as sim

    DIM = 64

    def vec(seed, bad=None):
        v = [math.sin(seed * 13.7 + k) for k in range(DIM)]
        if bad == "nan":
            v[3] = float("nan")
        if bad == "zero":
            v = [0.0] * DIM
        return v

    rows = [
        (0, vec(0), 1), (1, vec(0), 1),
        (2, vec(5), 2), (3, vec(0, "nan"), 2),
        (4, vec(0, "zero"), 3), (5, None, 3),
        (None, vec(9), 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    p = str(tmp_path / "emb.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    con = _d.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    src = spark.read.parquet(p)
    # query 4 is the zero-norm vector: every cosine NULL, ranks by id only
    _check(sim.ann_topk_batch(src, [0, 2, 4], k=5),
           sim.ann_topk_batch_sql("embeddings", [0, 2, 4], k=5), con)


def test_adv_retention_mirror(spark, tmp_path):
    """Retention mirror over crafted events: NULL timestamps AND NULL
    user ids drop on both engines (anonymous activity must not fuse into
    a pseudo-user), period boundaries (exactly-midnight epochs) land
    identically."""
    from datetime import datetime as d

    import duckdb as _d

    from xarray_histogram_spark.operators.joins import (
        retention_cohorts, retention_cohorts_sql,
    )

    rows = [
        (1, d(2024, 1, 1, 0, 0, 0)),       # exactly at a day boundary
        (1, d(2024, 1, 7, 23, 59, 59, 999999)),
        (2, d(2024, 1, 3, 12)),
        (None, d(2024, 1, 2)),             # NULL user
        (None, d(2024, 1, 5)),
        (3, None),                          # NULL ts
    ]
    df = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP")
    p = str(tmp_path / "ev.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    con = _d.connect()
    con.execute(
        f"CREATE VIEW revents AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    src = spark.read.parquet(p)
    for period in ("day", "week"):
        _check(
            retention_cohorts(src, "user_id", "ts", period),
            retention_cohorts_sql("revents", "user_id", "ts", period),
            con,
        )


def test_adv_ann_indexed_degenerate_vectors(spark, tmp_path):
    """The persisted partitionBy(bucket) index over crafted embeddings
    (NaN element, zero-norm, NULL vector, NULL id): the partition-pruned
    read must return the SAME ranking as the in-memory multiprobe AND
    hash-match the shared oracle — NULL-bucket rows (NULL embeddings) go
    to the null partition and must not break either path."""
    import math

    import duckdb as _d

    from xarray_histogram_spark.operators import similarity as sim

    DIM = 64

    def vec(seed, bad=None):
        v = [math.sin(seed * 13.7 + k) for k in range(DIM)]
        if bad == "nan":
            v[3] = float("nan")
        if bad == "zero":
            v = [0.0] * DIM
        return v

    rows = [
        (0, vec(0), 1), (1, vec(0), 1),
        (2, vec(5), 2), (3, vec(0, "nan"), 2),
        (4, vec(0, "zero"), 3), (5, None, 3),
        (None, vec(9), 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    raw = str(tmp_path / "emb.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(raw)
    src = spark.read.parquet(raw)
    idx = str(tmp_path / "ann_index")
    sim.write_ann_index(src, idx)
    con = _d.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{raw}/*.parquet')"
    )
    got = sim.ann_topk_indexed(spark, idx, query_id=0, k=5)
    _check(got, sim.ann_topk_sql("embeddings", query_id=0, k=5), con)
    # and identical to the in-memory plan's ranking
    mem = sim.ann_topk(src, query_id=0, k=5).collect()
    assert [(r.vec_id, r.cos) for r in got.collect()] == [
        (r.vec_id, r.cos) for r in mem
    ]


def test_adv_chunk_windows(spark, adv):
    df, con = adv
    for chunk, stride in ((4, 2), (2, 5), (3, 3)):
        _check(tx.chunk_windows(df, "text", "doc_id", chunk, stride),
               tx.chunk_windows_sql("adocs", "text", "doc_id",
                                    chunk, stride), con)


def test_adv_chunk_dedup(spark, adv):
    df, con = adv
    _check(dd.chunk_dedup(df, "text", "doc_id", 4, 2),
           dd.chunk_dedup_sql("adocs", "text", "doc_id", 4, 2), con)
    _check(dd.chunk_near_pairs(df, "text", "doc_id", 4, 2, k=4),
           dd.chunk_near_pairs_sql("adocs", "text", "doc_id", 4, 2, k=4),
           con)


@pytest.mark.slow  # heavy battery; full-profile only
def test_adv_chunk_near_keep(spark, adv):
    df, con = adv
    for thr in (0.5, 0.8):
        _check(
            dd.chunk_near_keep(df, "text", "doc_id", 4, 2, k=4,
                               threshold=thr),
            dd.chunk_near_keep_sql("adocs", "text", "doc_id", 4, 2, k=4,
                                   threshold=thr),
            con,
        )


@pytest.mark.slow  # heavy battery; full-profile only
def test_adv_extend_loop_composition(spark, adv, tmp_path):
    """The dedup_extend_loop entry's shape on the CRAFTED corpus: seed
    index from odd ids, dedup even ids against it, extend with their
    keepers, verify a second shard against the extended state — vs the
    same double-composition of incremental_dedup_sql (nested WITH
    shadowing) in DuckDB.  Exercises NULL/empty/whitespace text through
    band_rows, extend_band_index and the index-probed verify path."""
    df, con = adv
    docs = df.select("doc_id", "text")
    kept0 = docs.where(F.col("doc_id") % 3 == 0)
    shard1 = docs.where(F.col("doc_id") % 3 == 1)
    shard2 = docs.where(F.col("doc_id") % 3 == 2)
    path = str(tmp_path / "advloop")
    dd.band_rows(kept0, "text", "doc_id").write.parquet(path)
    v1 = dd.incremental_dedup(
        shard1, kept0, "text", "doc_id",
        kept_bands=spark.read.parquet(path),
    )
    dd.extend_band_index(shard1, v1, path, "text", "doc_id")
    kept_union = kept0.unionAll(
        shard1.join(v1.where(F.col("keep")).select("doc_id"), "doc_id")
    )
    got = dd.incremental_dedup(
        shard2, kept_union, "text", "doc_id",
        kept_bands=spark.read.parquet(path),
    )
    k0 = "SELECT doc_id, text FROM adocs WHERE doc_id % 3 = 0"
    s1 = "SELECT doc_id, text FROM adocs WHERE doc_id % 3 = 1"
    s2 = "SELECT doc_id, text FROM adocs WHERE doc_id % 3 = 2"
    v1_sql = dd.incremental_dedup_sql(s1, k0, "text", "doc_id")
    ku = (
        f"{k0} UNION ALL SELECT s.doc_id, s.text FROM ({s1}) s "
        f"JOIN ({v1_sql}) v ON s.doc_id = v.doc_id WHERE v.keep"
    )
    _check(got, dd.incremental_dedup_sql(s2, ku, "text", "doc_id"), con)


def test_adv_linear_quality_score(spark, adv):
    """Hashed-linear-model scoring vs its mirror on the crafted corpus:
    NULL / empty / whitespace-only / U+000B / multibyte texts must agree
    bit-for-bit (same bucket per token, same left-to-right double fold),
    under two weight-table sizes and a non-zero bias."""
    df, con = adv
    for n, bias in ((256, 0.25), (64, -1.5)):
        w = tx.demo_quality_weights(n, seed=n)
        _check(
            tx.linear_quality_score(df, "text", "doc_id", w, bias=bias),
            tx.linear_quality_score_sql("adocs", "text", "doc_id", w,
                                        bias=bias),
            con,
        )
    # keep_cols carries pass-through columns (incl. NULL group keys)
    # identically in both engines — the curation-composition channel
    w = tx.demo_quality_weights(128, seed=3)
    _check(
        tx.linear_quality_score(df, "text", "doc_id", w,
                                keep_cols=("lang", "source")),
        tx.linear_quality_score_sql("adocs", "text", "doc_id", w,
                                    keep_cols=("lang", "source")),
        con,
    )


def test_adv_mixture_weights(spark, adv):
    """Mixture rebalancing weights vs the mirror: a target naming an
    UNOBSERVED group, observed groups ABSENT from the target (weight
    0.0), doc-count and token-mass modes, and an un-normalized target
    (normalized identically in Python for both engines)."""
    df, con = adv
    target = {"s0": 3.0, "s1": 1.0, "never_seen": 2.0}
    _check(
        sp.mixture_weights(df, "source", target),
        sp.mixture_weights_sql("adocs", "source", target),
        con,
    )
    tokd = df.withColumn("ntok", F.size(F.split(F.coalesce(
        F.col("text"), F.lit("")), " ")).cast("bigint"))
    con.execute(
        "CREATE OR REPLACE VIEW adocs_tok AS SELECT *, CAST(len("
        "str_split(COALESCE(text, ''), ' ')) AS BIGINT) AS ntok FROM adocs"
    )
    _check(
        sp.mixture_weights(tokd, "lang", {"en": 1.0, "de": 1.0},
                           weight_col="ntok"),
        sp.mixture_weights_sql("adocs_tok", "lang", {"en": 1.0, "de": 1.0},
                               weight_col="ntok"),
        con,
    )


def test_mixture_weights_semantics(spark):
    """Hand-checked weights: shares normalize, over-represented sources
    cap at keep_rate 1.0 only when UNDER target, absent-from-target
    groups get 0.0, zero-mass groups get NULL."""
    df = spark.createDataFrame(
        [(1, "a", 30), (2, "a", 30), (3, "b", 20), (4, "c", 20),
         (5, "z", 0)],
        "doc_id long, source string, ntok long",
    )
    got = {r["source"]: r for r in sp.mixture_weights(
        df, "source", {"a": 1.0, "b": 1.0}, weight_col="ntok"
    ).collect()}
    assert got["a"]["mass"] == 60 and got["a"]["share"] == 0.6
    assert got["a"]["target_share"] == 0.5
    assert got["a"]["mix_weight"] == 0.5 / 0.6
    assert got["a"]["keep_rate"] == 0.5 / 0.6          # downsample
    assert got["b"]["mix_weight"] == 0.5 / 0.2
    assert got["b"]["keep_rate"] == 1.0                # capped
    assert got["c"]["target_share"] == 0.0 and got["c"]["mix_weight"] == 0.0
    assert got["z"]["mix_weight"] is None and got["z"]["keep_rate"] is None
    with pytest.raises(ValueError, match="non-empty"):
        sp.mixture_weights(df, "source", {})
    with pytest.raises(ValueError, match="non-negative"):
        sp.mixture_weights(df, "source", {"a": -1.0})
    # review-found divergence guards: a non-integral weight column is
    # REFUSED (bigint casts truncate in Spark but round in DuckDB)...
    dbl = df.withColumn("w", F.col("ntok") + F.lit(0.7))
    with pytest.raises(ValueError, match="integral"):
        sp.mixture_weights(dbl, "source", {"a": 1.0}, weight_col="w")
    # ...and an ALL-zero total mass yields NULL share/weight rows in
    # both engines instead of erroring under ANSI Spark
    import duckdb
    import pandas as pd

    zpdf = pd.DataFrame(
        {"doc_id": [1, 2], "source": ["a", "b"], "ntok": [0, 0]}
    ).astype({"doc_id": "int64", "ntok": "int64"})
    zdf = spark.createDataFrame(zpdf)
    zcon = duckdb.connect()
    zcon.register("zcorp", zpdf)
    assert_matches_sql(
        sp.mixture_weights(zdf, "source", {"a": 1.0}, weight_col="ntok"),
        sp.mixture_weights_sql("zcorp", "source", {"a": 1.0},
                               weight_col="ntok"),
        zcon,
    )
    zrows = {r["source"]: r for r in sp.mixture_weights(
        zdf, "source", {"a": 1.0}, weight_col="ntok"
    ).collect()}
    assert zrows["a"]["share"] is None and zrows["a"]["keep_rate"] is None
    # a NEGATIVE weight raises in BOTH engines, checked per ROW
    # (advice-found: unchecked it was silently conflated with the
    # zero-mass NULL arm and a negative grand total NULLed every share;
    # review-found: an aggregate-level check let MIXED-SIGN rows that
    # net non-negative through — the [-3, +5] → mass 2 case — so the
    # second frame pins exactly that)
    for sources, ntoks in (
        (["a", "b"], [5, -3]),   # pure-negative group
        (["a", "a"], [-3, 5]),   # mixed-sign, nets non-negative
    ):
        npdf = pd.DataFrame(
            {"doc_id": [1, 2], "source": sources, "ntok": ntoks}
        ).astype({"doc_id": "int64", "ntok": "int64"})
        with pytest.raises(Exception, match="negative weight"):
            sp.mixture_weights(
                spark.createDataFrame(npdf), "source", {"a": 1.0},
                weight_col="ntok",
            ).collect()
        ncon = duckdb.connect()
        ncon.register("ncorp", npdf)
        with pytest.raises(Exception, match="negative weight"):
            ncon.execute(sp.mixture_weights_sql(
                "ncorp", "source", {"a": 1.0}, weight_col="ntok"
            )).fetchall()


def test_adv_temperature_weights(spark, adv):
    """Temperature rebalancing vs its mirror on the crafted corpus
    (NULL group keys from the und/empty rows, doc-count and token-mass
    modes, all four supported temperatures)."""
    df, con = adv
    tokd = df.withColumn("ntok", F.size(F.split(F.coalesce(
        F.col("text"), F.lit("")), " ")).cast("bigint"))
    con.execute(
        "CREATE OR REPLACE VIEW adocs_ttok AS SELECT *, CAST(len("
        "str_split(COALESCE(text, ''), ' ')) AS BIGINT) AS ntok FROM adocs"
    )
    for steps in (1, 4):
        _check(
            sp.temperature_weights(df, "source", sqrt_steps=steps),
            sp.temperature_weights_sql("adocs", "source",
                                       sqrt_steps=steps),
            con,
        )
        _check(
            sp.temperature_weights(tokd, "lang", weight_col="ntok",
                                   sqrt_steps=steps),
            sp.temperature_weights_sql("adocs_ttok", "lang",
                                       weight_col="ntok",
                                       sqrt_steps=steps),
            con,
        )


def test_temperature_weights_semantics(spark):
    """Hand-checked τ=2 flattening: tempered masses are exact isqrts,
    the dominant group's keep_rate drops below 1, the tail clamps at 1,
    a zero-mass group gets the NULL arms, and the guards refuse bad
    sqrt_steps / non-integral / negative weights."""
    import duckdb
    import pandas as pd

    df = spark.createDataFrame(
        [(1, "a", 100), (2, "b", 9), (3, "c", 4), (4, "z", 0)],
        "doc_id long, source string, ntok long",
    )
    got = {r["source"]: r for r in sp.temperature_weights(
        df, "source", weight_col="ntok"
    ).collect()}
    # isqrt: 100→10, 9→3, 4→2, 0→0; tempered total 15, mass total 113
    assert {k: v["tempered_mass"] for k, v in got.items()} == {
        "a": 10, "b": 3, "c": 2, "z": 0}
    assert got["a"]["share"] == 100 / 113
    assert got["a"]["target_share"] == 10 / 15
    # dominant a: target 0.667 < share 0.885 → fractional keep_rate
    assert got["a"]["keep_rate"] == (10 / 15) / (100 / 113)
    assert 0 < got["a"]["keep_rate"] < 1
    # tail c: target 2/15 > share 4/113 → clamps at 1.0
    assert got["c"]["mix_weight"] == (2 / 15) / (4 / 113)
    assert got["c"]["keep_rate"] == 1.0
    # zero-mass z: tempered 0, target 0.0, NULL mix/keep
    assert got["z"]["target_share"] == 0.0
    assert got["z"]["mix_weight"] is None and got["z"]["keep_rate"] is None
    with pytest.raises(ValueError, match="sqrt_steps"):
        sp.temperature_weights(df, "source", sqrt_steps=0)
    with pytest.raises(ValueError, match="sqrt_steps"):
        sp.temperature_weights_sql("t", "source", sqrt_steps=5)
    with pytest.raises(ValueError, match="integral"):
        sp.temperature_weights(df.withColumn("w", F.col("ntok") + F.lit(0.5)),
                               "source", weight_col="w")
    npdf = pd.DataFrame(
        {"doc_id": [1, 2], "source": ["a", "a"], "ntok": [-3, 5]}
    ).astype({"doc_id": "int64", "ntok": "int64"})
    with pytest.raises(Exception, match="negative weight"):
        sp.temperature_weights(
            spark.createDataFrame(npdf), "source", weight_col="ntok"
        ).collect()
    ncon = duckdb.connect()
    ncon.register("ntcorp", npdf)
    with pytest.raises(Exception, match="negative weight"):
        ncon.execute(sp.temperature_weights_sql(
            "ntcorp", "source", weight_col="ntok"
        )).fetchall()
    # fractional sqrt_steps refuses instead of silently truncating
    # (review-found: int(2.5) quietly ran tau=4)
    with pytest.raises(ValueError, match="sqrt_steps"):
        sp.temperature_weights(df, "source", sqrt_steps=2.5)
    with pytest.raises(ValueError, match="sqrt_steps"):
        sp.temperature_weights_sql("t", "source", sqrt_steps=True)
    # all-zero total: every arm NULLs identically in both engines
    zpdf = pd.DataFrame(
        {"doc_id": [1], "source": ["a"], "ntok": [0]}
    ).astype({"doc_id": "int64", "ntok": "int64"})
    zcon = duckdb.connect()
    zcon.register("ztcorp", zpdf)
    assert_matches_sql(
        sp.temperature_weights(spark.createDataFrame(zpdf), "source",
                               weight_col="ntok"),
        sp.temperature_weights_sql("ztcorp", "source", weight_col="ntok"),
        zcon,
    )
    # the int64 TOTAL-mass boundary is where the engines legitimately
    # part ways, and the contract is explicit-never-silent on the
    # Spark side: three groups of 2^62 overflow the bigint window sum
    # (ARITHMETIC_OVERFLOW under ANSI) while DuckDB promotes the sum
    # to HUGEINT and answers — pinned so a behavior change at the
    # boundary cannot slip by while the docs claim it is covered
    bpdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "source": ["a", "b", "c"],
         "ntok": [1 << 62] * 3}
    ).astype({"doc_id": "int64", "ntok": "int64"})
    # the raise depends on ANSI mode (Spark 4's default, but a cluster
    # could override it; non-ANSI would silently WRAP to a negative
    # total) — pin it for the duration of the assertion so the
    # explicit-never-silent contract holds by construction
    prev_ansi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        with pytest.raises(Exception,
                           match="ARITHMETIC_OVERFLOW|overflow"):
            sp.temperature_weights(
                spark.createDataFrame(bpdf), "source", weight_col="ntok"
            ).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev_ansi)
    bcon = duckdb.connect()
    bcon.register("btcorp", bpdf)
    brows = bcon.execute(sp.temperature_weights_sql(
        "btcorp", "source", weight_col="ntok")).fetchall()
    assert len(brows) == 3 and all(r[7] is not None for r in brows)


def test_adv_ngram_familiarity(spark, adv):
    """ngram_familiarity vs its mirror on a crafted corpus with every
    arm forced and the exact integer sums hand-computed: shared grams
    across docs (familiarity > 1), an all-unique doc (exactly 1.0), a
    repeated gram WITHIN one doc (occurrences are a multiset — NOT
    distinct: frequency weighting is the operator's point), short/NULL
    docs absent, case-folding shared with H.tokens."""
    df, con = adv
    _check(tx.ngram_familiarity(df, "text", "doc_id"),
           tx.ngram_familiarity_sql("adocs", "text", "doc_id"), con)
    _check(tx.ngram_familiarity(df, "text", "doc_id", n=3),
           tx.ngram_familiarity_sql("adocs", "text", "doc_id", n=3), con)
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                "the cat sat",          # grams: "the cat", "cat sat"
                "the cat ran",          # shares "the cat" with 1 and 6
                "zq xw",                # unique gram → familiarity 1.0
                "one",                  # 1 token, n=2 → absent
                None,                   # NULL → absent
                "a b a b",              # "a b"×2 + "b a" within ONE doc
            ],
        }
    ).astype({"doc_id": "int64"})
    sdf = spark.createDataFrame(pdf, "doc_id long, text string")
    ncon = duckdb.connect()
    ncon.register("ndocs", pdf)
    _check(tx.ngram_familiarity(sdf, "text", "doc_id"),
           tx.ngram_familiarity_sql("ndocs", "text", "doc_id"), ncon)
    got = {r["doc_id"]: r for r in
           tx.ngram_familiarity(sdf, "text", "doc_id").collect()}
    # corpus counts: "the cat"=2, "cat sat"=1, "cat ran"=1, "zq xw"=1,
    # "a b"=2 (both in doc 6), "b a"=1
    assert (got[1]["n_grams"], got[1]["fam_sum"]) == (2, 3)   # 2+1
    assert got[1]["familiarity"] == 1.5
    assert (got[2]["n_grams"], got[2]["fam_sum"]) == (2, 3)
    assert (got[3]["n_grams"], got[3]["fam_sum"]) == (1, 1)
    assert got[3]["familiarity"] == 1.0                       # unique arm
    assert (got[6]["n_grams"], got[6]["fam_sum"]) == (3, 5)   # 2+1+2
    assert 4 not in got and 5 not in got                      # absent arms
    # refuse-don't-approximate: bool / fractional / < 1 n, in BOTH gram
    # operators' builders (review-found: the guard initially stopped one
    # function short — dup_ngram_stats_sql would have interpolated
    # 'i + 1.5' into the oracle SQL); np.int64 stays ACCEPTED via the
    # ONE shared validator (the strict-isinstance regression it kills)
    for bad in (0, 2.5, True):
        for fn in (
            lambda b: tx.ngram_familiarity(sdf, "text", "doc_id", n=b),
            lambda b: tx.ngram_familiarity_sql("ndocs", "text", "doc_id", n=b),
            lambda b: tx.dup_ngram_stats(sdf, "text", "doc_id", n=b),
            lambda b: tx.dup_ngram_stats_sql("ndocs", "text", "doc_id", n=b),
        ):
            with pytest.raises(ValueError, match="must be an integer"):
                fn(bad)
    import numpy as np

    assert (tx.ngram_familiarity_sql("ndocs", "text", "doc_id", n=np.int64(2))
            == tx.ngram_familiarity_sql("ndocs", "text", "doc_id", n=2))
    # the shared-kernel refactor left the gated dup_ngram oracle SQL
    # byte-identical (the hex4_val_sql byte-identity precedent): the
    # pre-refactor builder's exact f-string shape is reconstructed here
    # independently and compared whole
    from xarray_histogram_spark.functions import hashing as H

    toks = H.tokens_sql("text")
    pre_refactor_grams = (
        f"list_distinct(list_transform("
        f"generate_series(1, len({toks}) - 2), "
        f"i -> array_to_string(list_slice({toks}, i, i + 2), ' ')))"
    )
    assert tx.dup_ngram_stats_sql("documents", "text", "doc_id", n=3) == (
        f"WITH g AS (SELECT doc_id, unnest({pre_refactor_grams}) AS g "
        f"FROM documents), "
        f"d AS (SELECT doc_id, "
        f"COUNT(*) OVER (PARTITION BY g) AS dfreq FROM g), "
        f"p AS (SELECT doc_id, COUNT(*) AS n_grams, "
        f"CAST(SUM(CASE WHEN dfreq >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup "
        f"FROM d GROUP BY doc_id) "
        f"SELECT doc_id, n_grams, n_dup, "
        f"CAST(n_dup AS DOUBLE) / CAST(n_grams AS DOUBLE) AS dup_frac FROM p"
    )
    # n=1 degenerates to token familiarity (mean corpus token count)
    got1 = {r["doc_id"]: r for r in
            tx.ngram_familiarity(sdf, "text", "doc_id", n=1).collect()}
    # token counts: the=2, cat=2, sat=1, ran=1, zq=1, xw=1, one=1,
    # a=2, b=2 → doc 1: 2+2+1=5 over 3
    assert (got1[1]["n_grams"], got1[1]["fam_sum"]) == (3, 5)
    assert (got1[4]["n_grams"], got1[4]["fam_sum"]) == (1, 1)  # present at n=1
    _check(tx.ngram_familiarity(sdf, "text", "doc_id", n=1),
           tx.ngram_familiarity_sql("ndocs", "text", "doc_id", n=1), ncon)


@pytest.mark.slow  # heavy battery; full-profile only
def test_adv_epoch_upsample(spark, adv):
    """epoch_plan + upsample_corpus vs their mirrors on the crafted
    corpus, with every arm forced: a multi-epoch group (de needs 3
    full epochs + a .75 fractional), a thin-only group (en, floor 0),
    an absent-from-target group (fr → 0 epochs, dropped) and the
    forced-zero-mass NULL arm (und → NULL plan, dropped)."""
    df, con = adv
    w = (F.when(F.col("lang") == "und", F.lit(0)).otherwise(F.lit(1))
         .cast("bigint"))
    corpus = df.select("doc_id", "text", "lang", w.alias("w"))
    target = {"en": 0.2, "de": 0.6}
    mix = sp.mixture_weights(corpus, "lang", target, weight_col="w")
    plan = sp.epoch_plan(mix)
    mix_sql = sp.mixture_weights_sql(
        "(SELECT doc_id, text, lang, CASE WHEN lang = 'und' THEN "
        "CAST(0 AS BIGINT) ELSE CAST(1 AS BIGINT) END AS w FROM adocs)",
        "lang", target, weight_col="w",
    )
    plan_sql = sp.epoch_plan_sql(mix_sql)
    _check(plan, plan_sql, con)
    got = {r["lang"]: r for r in plan.collect()}
    # masses en 6 / de 2 / fr 2 / und 0, total 10; targets en .25 de .75
    # — expected values replicate the engines' exact IEEE op chain
    # (0.6/0.8 and 2/10 are correctly-rounded doubles, not the decimals)
    import math

    mw_de = (0.6 / float(0.2 + 0.6)) / (2.0 / 10.0)
    assert got["de"]["n_epochs"] == 3 == math.floor(mw_de)
    assert got["de"]["epoch_frac"] == mw_de - math.floor(mw_de)
    assert 0.74 < got["de"]["epoch_frac"] < 0.76
    assert got["en"]["n_epochs"] == 0 and 0 < got["en"]["epoch_frac"] < 1
    assert got["fr"]["n_epochs"] == 0 and got["fr"]["epoch_frac"] == 0.0
    assert got["und"]["n_epochs"] is None and got["und"]["epoch_frac"] is None
    up = sp.upsample_corpus(corpus, "lang", plan, "doc_id", salt="ep")
    up_sql = sp.upsample_corpus_sql(
        "(SELECT doc_id, text, lang, CASE WHEN lang = 'und' THEN "
        "CAST(0 AS BIGINT) ELSE CAST(1 AS BIGINT) END AS w FROM adocs)",
        "lang", plan_sql, "doc_id",
        ["doc_id", "text", "lang", "w"], salt="ep",
    )
    _check(up, up_sql, con)
    rows = up.collect()
    langs = {r["lang"] for r in rows}
    assert langs <= {"en", "de"}          # fr (0.0) and und (NULL) dropped
    import hashlib
    from collections import Counter

    reps = Counter((r["lang"], r["doc_id"]) for r in rows)
    # the draws are deterministic md5 values, so the EXACT per-doc
    # repeat counts are computable (review-found: an `or True` draft
    # left the fractional-extra arm unpinned — a dead assert)
    frac_de = got["de"]["epoch_frac"]
    thr_de = math.floor(frac_de * float(1 << 32))

    def _extra(doc_id, frac):
        d8 = hashlib.md5(f"ep{doc_id}".encode()).hexdigest()[:8]
        return 1 if int(d8, 16) < math.floor(frac * float(1 << 32)) else 0

    de_docs = [r["doc_id"] for r in corpus.where("lang = 'de'").collect()]
    for d in de_docs:                      # 3 epochs + Bernoulli(0.75)
        assert reps[("de", d)] == 3 + _extra(d, frac_de), (d, thr_de)
    en_docs = [r["doc_id"] for r in corpus.where("lang = 'en'").collect()]
    for d in en_docs:                      # floor 0 + kept draws only
        assert reps.get(("en", d), 0) == _extra(d, got["en"]["epoch_frac"])
    for (lg, d), n in reps.items():
        idxs = sorted(r["repeat_idx"] for r in rows
                      if r["lang"] == lg and r["doc_id"] == d)
        assert idxs == list(range(1, n + 1))   # contiguous 1..n
    en_total = sum(n for (lg, _), n in reps.items() if lg == "en")
    assert 0 < en_total < 6                # thinning actually fired
    # determinism: the materialization is a pure function of the key
    assert sorted(map(tuple, rows)) == sorted(map(tuple, up.collect()))
    # max_repeats bounds the TOTAL repeats (n_epochs + the fractional
    # extra), so de's 3.7499 raises at max_repeats=3 (review-found
    # off-by-one: a floor-only guard let mix_weight 1024.9 materialize
    # 1025 repeats) and passes at 4, in BOTH engines
    with pytest.raises(Exception, match="max_repeats"):
        sp.epoch_plan(mix, max_repeats=3).collect()
    with pytest.raises(Exception, match="max_repeats"):
        con.execute(
            sp.epoch_plan_sql(mix_sql, max_repeats=3)
        ).fetchall()
    # a NULL mix_weight passes the guard untouched (NULL comparison →
    # otherwise branch), keeping the zero-mass contract
    tight = {r["lang"]: r for r in sp.epoch_plan(
        mix, max_repeats=4).collect()}
    assert tight["und"]["n_epochs"] is None
    assert tight["de"]["n_epochs"] == 3
    # refuse-don't-approximate: fractional / bool / <1 max_repeats
    for bad in (0, 2.5, True):
        with pytest.raises(ValueError, match="max_repeats"):
            sp.epoch_plan(mix, max_repeats=bad)
        with pytest.raises(ValueError, match="max_repeats"):
            sp.epoch_plan_sql(mix_sql, max_repeats=bad)
    # coverage raise: a plan computed on a FILTERED snapshot (no 'de')
    # must RAISE on the full corpus, not silently drop de's rows
    part_mix = sp.mixture_weights(
        corpus.where(F.col("lang") != "de"), "lang", target,
        weight_col="w",
    )
    with pytest.raises(Exception, match="no plan row"):
        sp.upsample_corpus(
            corpus, "lang", sp.epoch_plan(part_mix), "doc_id", salt="ep"
        ).collect()
    part_sql = sp.epoch_plan_sql(sp.mixture_weights_sql(
        "(SELECT doc_id, text, lang, CAST(1 AS BIGINT) AS w FROM adocs "
        "WHERE lang <> 'de')", "lang", target, weight_col="w"))
    with pytest.raises(Exception, match="no plan row"):
        con.execute(sp.upsample_corpus_sql(
            "(SELECT doc_id, text, lang, CAST(1 AS BIGINT) AS w "
            "FROM adocs)", "lang", part_sql, "doc_id",
            ["doc_id", "text", "lang", "w"], salt="ep",
        )).fetchall()
    # cols subsets that OMIT the group column still mirror (review-found:
    # the draw-binding CTE regressed this — the ON clause reads d.lang)
    _check(
        sp.upsample_corpus(
            corpus.select("doc_id", "lang"), "lang", plan, "doc_id",
            salt="ep",
        ).select("doc_id", "repeat_idx"),
        sp.upsample_corpus_sql(
            "adocs", "lang", plan_sql, "doc_id", ["doc_id"], salt="ep",
        ),
        con,
    )
    # duplicate plan keys RAISE instead of silently multiplying the
    # fan-out (review-found: a plan unioned with itself doubled every
    # repeat count with duplicate repeat_idx values — and the tagged
    # multi-sqrt_steps UNION entry shape makes the mistake easy)
    with pytest.raises(Exception, match="duplicate plan row"):
        sp.upsample_corpus(
            corpus, "lang", plan.unionAll(plan), "doc_id", salt="ep"
        ).collect()
    with pytest.raises(Exception, match="duplicate plan row"):
        con.execute(sp.upsample_corpus_sql(
            "(SELECT doc_id, text, lang, CAST(1 AS BIGINT) AS w "
            "FROM adocs)", "lang",
            f"{plan_sql} UNION ALL {plan_sql}", "doc_id",
            ["doc_id", "text", "lang", "w"], salt="ep",
        )).fetchall()
    # a NaN mix_weight RAISES in both engines instead of silently
    # diverging (advice-found: Spark's floor swallows NaN→0 inside the
    # Floor expression while DuckDB's CAST raises — the engines would
    # part ways on a hand-computed frame; the mixture operators encode
    # zero mass as NULL, never NaN, and NULL still passes untouched)
    nan_mix = mix.withColumn(
        "mix_weight",
        F.when(F.col("lang") == "en", F.lit(float("nan")))
        .otherwise(F.col("mix_weight")),
    )
    with pytest.raises(Exception, match="NaN"):
        sp.epoch_plan(nan_mix).collect()
    with pytest.raises(Exception, match="NaN"):
        con.execute(sp.epoch_plan_sql(
            f"SELECT * REPLACE (CASE WHEN lang = 'en' THEN 'nan'::DOUBLE "
            f"ELSE mix_weight END AS mix_weight) FROM ({mix_sql})"
        )).fetchall()
    # +Infinity falls to the max_repeats raise (inf > mr) — every
    # non-finite input stays explicit-never-silent
    inf_mix = mix.withColumn(
        "mix_weight",
        F.when(F.col("lang") == "en", F.lit(float("inf")))
        .otherwise(F.col("mix_weight")),
    )
    with pytest.raises(Exception, match="max_repeats"):
        sp.epoch_plan(inf_mix).collect()
    # -Infinity RAISES its own arm in BOTH engines (review-found: it
    # would otherwise reach floor(), where DuckDB's cast errors but
    # legacy-mode Spark silently yields Long.MIN_VALUE — the same
    # silent divergence class as the NaN arm, ANSI-independent here)
    ninf_mix = mix.withColumn(
        "mix_weight",
        F.when(F.col("lang") == "en", F.lit(float("-inf")))
        .otherwise(F.col("mix_weight")),
    )
    with pytest.raises(Exception, match="-Infinity"):
        sp.epoch_plan(ninf_mix).collect()
    with pytest.raises(Exception, match="-Infinity"):
        con.execute(sp.epoch_plan_sql(
            f"SELECT * REPLACE (CASE WHEN lang = 'en' THEN "
            f"CAST('-infinity' AS DOUBLE) ELSE mix_weight END "
            f"AS mix_weight) FROM ({mix_sql})"
        )).fetchall()
    # reserved-name contract (advice-found: unqualified helper columns
    # made a re-upsampled frame fail with an opaque ambiguous-reference
    # error): a corpus carrying repeat_idx or a __u helper RAISES with
    # the full reserved list, in BOTH builders…
    with pytest.raises(ValueError, match="repeat_idx"):
        sp.upsample_corpus(
            up, "lang", plan, "doc_id", salt="ep"
        )
    with pytest.raises(ValueError, match="__un"):
        sp.upsample_corpus_sql(
            "adocs", "lang", plan_sql, "doc_id",
            ["doc_id", "__un"], salt="ep",
        )
    # …while a corpus carrying epoch_plan's OWN output columns
    # (n_epochs/epoch_frac — the realistic annotated-frame case the
    # advice named) now upsamples cleanly: the helpers are __u-prefixed
    annotated = corpus.withColumn(
        "n_epochs", F.lit(7).cast("bigint")
    ).withColumn("epoch_frac", F.lit(0.25))
    ann = sp.upsample_corpus(annotated, "lang", plan, "doc_id", salt="ep")
    assert ann.columns == [
        "doc_id", "text", "lang", "w", "n_epochs", "epoch_frac",
        "repeat_idx",
    ]
    # the corpus's own n_epochs rides through UNTOUCHED; the repeat
    # fan-out still follows the PLAN's n_epochs (de: 3+frac, en: 0+frac)
    ann_rows = ann.collect()
    assert all(r["n_epochs"] == 7 for r in ann_rows)
    assert sorted(
        (r["lang"], r["doc_id"], r["repeat_idx"]) for r in ann_rows
    ) == sorted((r["lang"], r["doc_id"], r["repeat_idx"]) for r in rows)


def test_mass_agg_sql_byte_identity_and_escaping():
    """The round-12 quote-escaping fix to _mass_agg_sql's error-message
    literal (advice-found: a weight_col containing a single quote
    produced broken SQL) leaves the generated SQL BYTE-IDENTICAL for
    every quote-free name — pinned literally for the gated entries'
    builders (the hex4_val_sql byte-identity precedent), so no r11
    mixture green is re-gated by the fix."""
    assert sp._mass_agg_sql(None, "mixture_weights") == "COUNT(*)"
    assert sp._mass_agg_sql("w", "mixture_weights") == (
        "COALESCE(SUM(CASE WHEN CAST(w AS BIGINT) < 0 THEN "
        "CAST(error('mixture_weights: negative weight ' || "
        "CAST(w AS BIGINT) || ' in w — weight_col must be "
        "non-negative') AS BIGINT) ELSE CAST(w AS BIGINT) END), 0)"
    )
    assert sp._mass_agg_sql("n_tokens", "temperature_weights") == (
        "COALESCE(SUM(CASE WHEN CAST(n_tokens AS BIGINT) < 0 THEN "
        "CAST(error('temperature_weights: negative weight ' || "
        "CAST(n_tokens AS BIGINT) || ' in n_tokens — weight_col must be "
        "non-negative') AS BIGINT) ELSE CAST(n_tokens AS BIGINT) "
        "END), 0)"
    )
    # a quoted name doubles its quotes INSIDE the message literal (the
    # column reference itself is the caller's expression, untouched);
    # the message literal parses — DuckDB evaluates the non-error arm
    import duckdb

    quoted = sp._mass_agg_sql('"a\'b"', "op'x")
    assert "' in \"a''b\" — " in quoted
    assert "error('op''x: negative weight '" in quoted
    qcon = duckdb.connect()
    got = qcon.execute(
        f"SELECT {quoted} FROM (SELECT 3 AS \"a'b\" "
        f"UNION ALL SELECT 4 AS \"a'b\")"
    ).fetchone()[0]
    assert got == 7


def test_temperature_entry_arms_non_vacuous(spark, sf_dir):
    """The driver-gated temperature fixtures exercise EVERY arm at the
    gated SF (the vacuity lesson): fractional keep_rate for the
    dominant lang, clamp-to-1 for the tail, the forced-zero de group's
    NULL arm, DISTINCT tempered masses across the two tagged
    sqrt_steps, and — in the composed entry — REAL Bernoulli thinning
    (en strictly thinned, clamped strata kept whole, de absent)."""
    import xarray_histogram_spark.entry_queries as eq

    reg = eq.registry()
    rows = reg["sample_temperature_weights"][0](spark, sf_dir).collect()
    for steps in (1, 3):
        sub = {r["lang"]: r for r in rows if r["sqrt_steps"] == steps}
        assert sub["de"]["mass"] == 0 and sub["de"]["tempered_mass"] == 0
        assert sub["de"]["keep_rate"] is None          # zero-mass NULL arm
        assert 0 < sub["en"]["keep_rate"] < 1          # fractional arm
        assert any(v["keep_rate"] == 1.0 for v in sub.values())  # clamp
    t1 = {r["lang"]: r["tempered_mass"] for r in rows
          if r["sqrt_steps"] == 1}
    t3 = {r["lang"]: r["tempered_mass"] for r in rows
          if r["sqrt_steps"] == 3}
    assert t1 != t3, "the sqrt_steps tag is vacuous"
    kept = reg["pipeline_curate_temperature"][0](spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_in = {r["lang"]: r["n"] for r in docs.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    n_out = {r["lang"]: r["n"] for r in kept.groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert "de" not in n_out                      # NULL rate drops the group
    assert 0 < n_out["en"] < n_in["en"]           # thinning actually fired
    for lang in ("fr", "es", "zh"):
        assert n_out[lang] == n_in[lang]          # clamped strata kept whole


def test_epoch_upsample_entry_arms_non_vacuous(spark, sf_dir):
    """The driver-gated epoch-upsample fixture exercises EVERY arm at
    the gated SF (the vacuity lesson): de's forced-zero mass → NULL
    plan → dropped; en mix_weight<1 → the thinning-degeneration arm;
    fr/es → one epoch + fractional extra; zh (mass ÷16) → the
    n_epochs≥2 deep-upsample arm — and the EXACT per-doc repeat totals
    match an independent pure-Python replication of the md5 draw (the
    pin-exact-counts precedent)."""
    import hashlib
    import math
    from collections import Counter

    import xarray_histogram_spark.entry_queries as eq

    corpus = eq._eu_corpus(spark, sf_dir)
    plan_rows = {r["lang"]: r for r in sp.epoch_plan(
        sp.temperature_weights(
            corpus, "lang", weight_col="w", sqrt_steps=eq._EU_SQRT_STEPS
        ),
        max_repeats=16,
    ).collect()}
    assert plan_rows["de"]["n_epochs"] is None       # NULL-plan drop arm
    assert plan_rows["en"]["n_epochs"] == 0          # thinning arm
    assert 0 < plan_rows["en"]["epoch_frac"] < 1
    for lang in ("fr", "es"):                        # one-epoch + frac arm
        assert plan_rows[lang]["n_epochs"] == 1
        assert 0 < plan_rows[lang]["epoch_frac"] < 1
    assert plan_rows["zh"]["n_epochs"] >= 2          # deep-upsample arm

    rows = eq.registry()["sample_epoch_upsample"][0](
        spark, sf_dir
    ).collect()
    reps = Counter((r["lang"], r["doc_id"]) for r in rows)
    assert {lg for lg, _ in reps} == {"en", "fr", "es", "zh"}

    def extra(doc_id, frac):
        d8 = hashlib.md5(f"ep13{doc_id}".encode()).hexdigest()[:8]
        return 1 if int(d8, 16) < math.floor(frac * float(1 << 32)) else 0

    expected = Counter()
    outcomes: dict = {}
    for r in corpus.collect():
        p = plan_rows[r["lang"]]
        if p["n_epochs"] is None:
            continue
        e = extra(r["doc_id"], p["epoch_frac"])
        outcomes.setdefault(r["lang"], set()).add(e)
        n = p["n_epochs"] + e
        if n >= 1:
            expected[(r["lang"], r["doc_id"])] = n
    assert reps == expected                          # exact repeat counts
    for lang in ("en", "fr", "es", "zh"):            # both draw outcomes
        assert outcomes[lang] == {0, 1}, f"{lang} draw outcomes vacuous"


def test_pretrain_mix_entry_arms_non_vacuous(spark, sf_dir):
    """Every stage of the composed pretraining-mix entry does real work
    at the gated SF: the dedup+quality curate stage drops rows in EVERY
    lang but keeps most; the boilerplate collapse leaves at most the
    two PII-variants per lang; the scrub redacts the appended contact
    blocks (no raw e-mail survives); the data-derived plan thins en and
    upsamples every tail lang; and the packed output is exactly
    context-token sequences with contiguous chunk ids whose per-shard
    token totals sit BELOW the curated mass for en (thinned) and ABOVE
    it for the tails (materialized repeats)."""
    import xarray_histogram_spark.entry_queries as eq
    from xarray_histogram_spark.functions.hashing import tokens_raw

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    root = eq._pretrain_curated(spark, sf_dir)
    cur = spark.read.parquet(root + "/curated")
    n_in = {r["lang"]: r["n"] for r in docs.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    n_cur = {r["lang"]: r["n"] for r in cur.groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang in n_in:
        assert 0 < n_cur[lang] < n_in[lang], lang
    boiler_prefix = "the shared boilerplate passage kept for "
    n_boiler_in = docs.where(F.col("doc_id") % 11 == 5).count()
    boiler_cur = {r["lang"]: r["n"] for r in
                  cur.where(F.col("text").startswith(boiler_prefix))
                  .groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
                  .collect()}
    assert sum(boiler_cur.values()) < n_boiler_in    # dedup collapsed
    for lang, n in boiler_cur.items():
        assert 1 <= n <= 2, lang                     # ≤ one per PII-variant
    assert cur.where(F.col("text").contains("<EMAIL>")).count() > 0
    assert cur.where(
        F.col("text").contains("staff@corp.example.com")
    ).count() == 0                                   # scrub really scrubbed
    plan = {r["lang"]: r for r in sp.epoch_plan(sp.temperature_weights(
        cur, "lang", weight_col="n_tokens", sqrt_steps=eq._PM_SQRT_STEPS
    )).collect()}
    assert plan["en"]["n_epochs"] == 0               # en thinned
    assert 0 < plan["en"]["epoch_frac"] < 1
    for lang in ("de", "fr", "es", "zh"):            # tails upsampled
        assert plan[lang]["n_epochs"] >= 1
        assert plan[lang]["epoch_frac"] > 0
    packed = eq.registry()["pipeline_pretrain_mix"][0](
        spark, sf_dir
    ).collect()
    by_shard: dict = {}
    for r in packed:
        by_shard.setdefault(r["lang"], []).append(r)
    assert set(by_shard) == {"en", "de", "fr", "es", "zh"}
    for lang, rs in by_shard.items():
        ids = sorted(r["chunk_id"] for r in rs)
        assert ids == list(range(len(ids))), lang    # contiguous chunks
        last = max(ids)
        for r in rs:
            assert len(r["seq_text"].split(" ")) == r["n_seq_tokens"]
            if r["chunk_id"] != last:
                assert r["n_seq_tokens"] == eq._PM_CONTEXT
            else:
                assert 1 <= r["n_seq_tokens"] <= eq._PM_CONTEXT
    ctok = {r["lang"]: r["s"] for r in cur.select(
        "lang", F.size(tokens_raw(F.col("text"))).alias("nt")
    ).groupBy("lang").agg(F.sum("nt").alias("s")).collect()}
    ptok = {lang: sum(r["n_seq_tokens"] for r in rs)
            for lang, rs in by_shard.items()}
    assert ptok["en"] < ctok["en"]                   # thinning materialized
    for lang in ("de", "fr", "es", "zh"):
        assert ptok[lang] > ctok[lang], lang         # repeats materialized


@pytest.mark.slow  # heavy battery; full-profile only
def test_adv_embed_extend_loop(spark, tmp_path):
    """The EMBEDDING twin of the band-loop composition: seed a persisted
    embed index, verdict shard 1 against it, extend_embed_index with
    shard 1's admitted keepers, verdict shard 2 against the EXTENDED
    index — vs the same double-composition of embed_incremental_sql in
    DuckDB.  Crafted vectors force every verdict arm: a cross-shard
    exact copy AND a near-copy of a SHARD-1 keeper (dup_of_kept only
    via the extension), a dup of an ORIGINAL keeper, a within-shard
    dup, and a zero-norm vector (NULL cosine → keeps)."""
    import math

    import duckdb

    DIM = 64

    def vec(seed, eps=0.0):
        return [math.sin(seed * 13.7 + k) + (eps if k == 0 else 0.0)
                for k in range(DIM)]

    rows = (
        [(i, vec(i), 0) for i in range(6)]               # kept0
        + [(10, vec(0), 1),                              # dup of kept 0
           (11, vec(30), 1), (12, vec(31), 1),
           (13, vec(32), 1),
           (14, vec(30), 1),                             # dup within shard 1
           (15, vec(99), 1)]                             # SHARD-1 keeper
        + [(20, vec(99), 2),                             # exact copy of 15
           (25, vec(99, 1e-4), 2),                       # near-copy of 15
           (21, vec(3), 2),                              # dup of kept 3
           (22, vec(50), 2),
           (23, vec(50), 2),                             # dup within shard 2
           (24, [0.0] * DIM, 2)]                         # zero norm
    )
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    p = str(tmp_path / "aemb.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW aemb AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    src = spark.read.parquet(p)
    kept0 = src.where("label = 0").select("vec_id", "embedding")
    shard1 = src.where("label = 1").select("vec_id", "embedding")
    shard2 = src.where("label = 2").select("vec_id", "embedding")
    idx = str(tmp_path / "aeidx")
    dd.embed_index(kept0).write.parquet(idx)
    thr = 0.95
    v1 = dd.embed_incremental(
        shard1, None, thr, kept_index=spark.read.parquet(idx)
    )
    dd.extend_embed_index(shard1, v1, idx)
    got = dd.embed_incremental(
        shard2, None, thr, kept_index=spark.read.parquet(idx)
    )
    # causality: 20 (exact) and 25 (near) match the SHARD-1 admission 15,
    # visible only through the extension; 21 matches the original index
    g = {r["vec_id"]: r for r in got.collect()}
    assert g[20]["dup_of_kept"] and g[20]["kept_match"] == 15
    assert g[25]["dup_of_kept"] and g[25]["kept_match"] == 15
    assert g[21]["dup_of_kept"] and g[21]["kept_match"] == 3
    assert g[23]["dup_within_new"] and not g[23]["keep"]
    assert g[24]["keep"] and not g[24]["dup_of_kept"]
    k0 = "SELECT vec_id, embedding FROM aemb WHERE label = 0"
    s1 = "SELECT vec_id, embedding FROM aemb WHERE label = 1"
    s2 = "SELECT vec_id, embedding FROM aemb WHERE label = 2"
    v1_sql = dd.embed_incremental_sql(s1, k0, thr)
    ku = (
        f"{k0} UNION ALL SELECT s.vec_id, s.embedding FROM ({s1}) s "
        f"JOIN ({v1_sql}) v ON s.vec_id = v.vec_id WHERE v.keep"
    )
    _check(got, dd.embed_incremental_sql(s2, ku, thr), con)


def test_adv_hex8_val_parity(spark, adv):
    """hex8_val (one JVM conv) vs hex8_val_sql (eight-nibble
    recomposition) agree on every draw, including values above INT32
    max — the primitive that turns a data-derived keep_rate into an
    in-plan sampling threshold (pipeline_curate_mixture).  The draw is
    bound to a column first per the binding rule."""
    from xarray_histogram_spark.functions import hashing as H

    df, con = adv
    got = df.select(
        "doc_id",
        H.hex8_val(sp.draw_hex(F.col("doc_id"), salt="adv")).alias("dv"),
    )
    d8 = sp.draw_hex_sql("doc_id", salt="adv")
    _check(
        got,
        f"SELECT doc_id, {H.hex8_val_sql('__d8')} AS dv "
        f"FROM (SELECT doc_id, {d8} AS __d8 FROM adocs)",
        con,
    )
    vals = [r["dv"] for r in got.collect()]
    assert all(0 <= v < 2**32 for v in vals)
    assert any(v > 2**31 for v in vals), "no draw above INT32 max"
    # the shared n-nibble builder reproduces the pre-round-11
    # hand-written hex4 form BYTE-IDENTICALLY — every gated oracle
    # embedding hex4_val_sql (the BPE family, linear scoring) is
    # unchanged by the refactor
    n4 = [H.nibble_val_sql(f"substr(h, {i}, 1)") for i in (1, 2, 3, 4)]
    assert H.hex4_val_sql("h") == (
        f"({n4[0]} * 4096 + {n4[1]} * 256 + {n4[2]} * 16 + {n4[3]})"
    )
    # and the hex8 form raises no INT32 overflow on boundary values
    for hx, want in [("ffffffff", 2**32 - 1), ("80000000", 2**31),
                     ("7fffffff", 2**31 - 1), ("00000000", 0)]:
        got8 = con.execute(
            f"SELECT {H.hex8_val_sql('h')} FROM (SELECT '{hx}' AS h)"
        ).fetchone()[0]
        assert got8 == want, (hx, got8, want)


def test_adv_rate_threshold_parity(spark):
    """rate_threshold vs rate_threshold_sql on the arm-defining rates:
    0.0 (drop all), exact 1.0 (2³²) and above-1 (unclamped, ≥ 2³² —
    keep all either way), NULL (propagates), a 1-ulp-below-1 rate, a
    one-in-2³² rate, and a true SUBNORMAL rate (5e-324: the product is
    an exact exponent shift even from the denormal range, floors to 0)
    — floor(rate·2³²) must be the same BIGINT in both engines (the
    in-plan sampling threshold the composed curation entry rests on)."""
    import math

    rates = [0.0, 1.0, 1.5, None, math.nextafter(1.0, 0.0), 1e-12,
             0.4632, 2.0 ** -32, 5e-324]
    # explicit NULL rows on both sides — a pandas float column would
    # coerce None to NaN, which Spark keeps as NaN (→ bigint 0 under
    # non-ANSI casts) while duckdb.register treats it as NULL: exactly
    # the divergence the pair's NULL-or-finite contract excludes
    sdf = spark.createDataFrame(
        [(i, r) for i, r in enumerate(rates)], "i long, r double"
    )
    con = duckdb.connect()
    # flit, not bare repr: DuckDB parses bare numeric literals as
    # DECIMAL and DECIMAL→DOUBLE is not correctly rounded — the 1-ulp-
    # below-1 rate would land on exactly 1.0 (the flit docstring hazard)
    from xarray_histogram_spark.binspec import flit

    vals = ", ".join(
        f"({i}, {'NULL' if r is None else flit(r)})"
        for i, r in enumerate(rates)
    )
    con.execute(
        f"CREATE VIEW rcorp AS SELECT CAST(c0 AS BIGINT) AS i, "
        f"CAST(c1 AS DOUBLE) AS r FROM (VALUES {vals}) v(c0, c1)"
    )
    assert_matches_sql(
        sdf.select("i", sp.rate_threshold(F.col("r")).alias("thr")),
        f"SELECT i, {sp.rate_threshold_sql('r')} AS thr FROM rcorp",
        con,
    )
    got = {r["i"]: r["thr"] for r in sdf.select(
        "i", sp.rate_threshold(F.col("r")).alias("thr")).collect()}
    assert got[0] == 0 and got[1] == 2**32 and got[2] > 2**32
    assert got[3] is None
    assert got[4] == 2**32 - 1          # 1-ulp-below-1 keeps a whisker less
    assert got[7] == 1                  # one draw value in 2³² kept
    assert got[8] == 0                  # subnormal rate floors to drop-all
    # the NaN boundary the NULL-or-finite contract exists for, pinned
    # in BOTH modes (review-verified, round 12: an advice note claimed
    # ANSI raises — it does not; floor(double) returns BIGINT and
    # swallows NaN to 0 INSIDE the Floor expression, so the ANSI cast
    # never sees a NaN and Spark silently emits drop-all while DuckDB's
    # float→bigint conversion raises — silent divergence in every mode)
    ndf = spark.createDataFrame([(float("nan"),)], "r double")
    prev_ansi = spark.conf.get("spark.sql.ansi.enabled")
    for mode in ("true", "false"):
        spark.conf.set("spark.sql.ansi.enabled", mode)
        try:
            nan_thr = ndf.select(
                sp.rate_threshold(F.col("r")).alias("thr")
            ).collect()[0]["thr"]
        finally:
            spark.conf.set("spark.sql.ansi.enabled", prev_ansi)
        assert nan_thr == 0, (mode, nan_thr)
    with pytest.raises(Exception, match="[Cc]onvert|[Cc]ast"):
        con.execute(
            f"SELECT {sp.rate_threshold_sql('r')} FROM "
            f"(SELECT CAST('nan' AS DOUBLE) AS r)"
        ).fetchall()


def test_adv_bpe_pair_counts(spark, adv):
    df, con = adv
    for merges in ((), tx.DEMO_BPE_MERGES, (("a", "a"), ("-", "-"))):
        _check(tx.bpe_pair_counts(df, "text", merges),
               tx.bpe_pair_counts_sql("adocs", "text", merges), con)


@pytest.mark.slow  # heavy battery; full-profile only
def test_adv_incremental_dedup(spark, adv):
    df, con = adv
    new = df.where(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    kept = df.where(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    _check(
        dd.incremental_dedup(new, kept, "text", "doc_id"),
        dd.incremental_dedup_sql(
            "SELECT doc_id, text FROM adocs WHERE doc_id % 2 = 0",
            "SELECT doc_id, text FROM adocs WHERE doc_id % 2 = 1",
            "text", "doc_id",
        ),
        con,
    )


def test_adv_embed_incremental(spark, tmp_path_factory):
    """embed_incremental parity on crafted DEGENERATE vectors the
    fixtures never contain: NULL embedding, zero-norm, NaN element,
    exact copies straddling the shard split."""
    import math

    from xarray_histogram_spark.operators.similarity import DIM

    def vec(seed):
        return [float((seed * 31 + i * 7) % 13 - 6) for i in range(DIM)]

    # split below: even ids = incoming shard, odd ids = keeper corpus
    rows = [
        (0, vec(1)), (2, vec(1)),                   # new-new dup pair
        (1, vec(2)), (6, vec(2)),                   # new 6 copies kept 1
        (3, None),                                  # NULL embedding (kept)
        (4, [0.0] * DIM),                           # zero norm (new)
        (5, vec(3)[:-1] + [float("nan")]),          # NaN element (kept)
        (7, vec(4)), (8, vec(4)),                   # new 8 copies kept 7
    ]
    p = str(tmp_path_factory.mktemp("advemb") / "emb.parquet")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).coalesce(1).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW aemb AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    new = df.where(F.col("vec_id") % 2 == 0).select("vec_id", "embedding")
    kept = df.where(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")
    res = dd.embed_incremental(new, kept, threshold=0.99)
    _check(
        res,
        dd.embed_incremental_sql(
            "SELECT vec_id, embedding FROM aemb WHERE vec_id % 2 = 0",
            "SELECT vec_id, embedding FROM aemb WHERE vec_id % 2 = 1",
            threshold=0.99,
        ),
        con,
    )
    r = {x["vec_id"]: x for x in res.collect()}
    # copies across the split verify; the new-new pair (0, 2) is caught
    # one way or the other (dup_within_new if 0 survived the kept check,
    # dup_of_kept otherwise — the structured vectors may legitimately
    # clear 0.99 against a kept vector); zero-norm NULL cosine keeps
    assert r[6]["dup_of_kept"]
    assert r[8]["dup_of_kept"]
    assert not r[2]["keep"]
    assert r[4]["keep"]


def test_adv_pack_sequences(spark, adv):
    df, con = adv
    for k in (3, 7, 64):
        _check(sp.pack_sequences(df, "text", "doc_id", "source", k),
               sp.pack_sequences_sql("adocs", "text", "doc_id",
                                     "source", k), con)


def test_adv_bpe_encode(spark, adv):
    df, con = adv
    for merges in (tx.DEMO_BPE_MERGES, (("-", "-"), ("--", "--"))):
        _check(
            tx.bpe_encode(df, "text", "doc_id", merges).select(
                "doc_id",
                F.array_join("bpe_tokens", " ").alias("bpe_text"),
                "n_bpe_tokens",
            ),
            "SELECT doc_id, CASE WHEN bpe_tokens IS NULL THEN NULL "
            "ELSE COALESCE(array_to_string(bpe_tokens, ' '), '') END "
            "AS bpe_text, n_bpe_tokens FROM ("
            + tx.bpe_encode_sql("adocs", "text", "doc_id", merges)
            + ") e",
            con,
        )
