"""LLM-pipeline operator tests: semantic sanity beyond the oracle matches
(the oracle equivalence itself runs for every registered query in
test_entry_contract.py)."""

import pytest
from pyspark.sql import functions as F

from xarray_histogram_spark.operators import dedup as dd
from xarray_histogram_spark.operators import multimodal as mm
from xarray_histogram_spark.operators import similarity as sim
from xarray_histogram_spark.operators import text as tx


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_exact_dedup_finds_planted_dups(spark, docs):
    # plant exact duplicates
    dup = docs.limit(5).withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
    both = docs.unionByName(dup)
    r = dd.exact_dedup(both, "text", "doc_id")
    dups = r.where(F.col("n_dups") >= 2)
    assert dups.count() >= 5
    # keeper is the original (min id)
    assert dups.where(F.col("keep_id") >= 1_000_000).count() == 0


def test_minhash_detects_near_dups(spark, docs):
    # a near-duplicate: original text + small suffix
    near = (
        docs.limit(5)
        .withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
        .withColumn("text", F.concat(F.col("text"), F.lit(" tail")))
    )
    both = docs.unionByName(near)
    pairs = dd.lsh_candidate_pairs(both, "text", "doc_id")
    found = pairs.where(
        (F.col("id_b") - F.col("id_a")) == 1_000_000
    ).count()
    assert found >= 4  # near-dups collide in ≥1 band (allow 1 miss)


def test_jaccard_values(spark, docs):
    near = (
        docs.limit(3)
        .withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
        .withColumn("text", F.concat(F.col("text"), F.lit(" tail")))
    )
    both = docs.unionByName(near)
    j = dd.jaccard_pairs(both, "text", "doc_id")
    planted = j.where((F.col("id_b") - F.col("id_a")) == 1_000_000)
    rows = planted.collect()
    assert rows and all(r["jaccard"] > 0.8 for r in rows)


def test_simhash_similar_docs_close(spark, docs):
    near = (
        docs.limit(3)
        .withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
        .withColumn("text", F.concat(F.col("text"), F.lit(" tail")))
    )
    both = docs.unionByName(near)
    s = {r["doc_id"]: r["simhash"] for r in dd.simhash(both, "text", "doc_id").collect()}
    for base in list(s):
        if base + 1_000_000 in s:
            ham = bin(s[base] ^ s[base + 1_000_000]).count("1")
            assert ham <= 4, f"simhash hamming {ham} too large for near-dup"


def test_cosine_topk_self_similarity(spark, emb):
    # a vector duplicated under a new id must be its own top-1
    dup = emb.where(F.col("vec_id") == 0).withColumn("vec_id", F.lit(999_999))
    both = emb.unionByName(dup)
    top = sim.cosine_topk(both, query_id=0, k=3).collect()
    assert top[0]["vec_id"] == 999_999
    assert top[0]["cos"] == pytest.approx(1.0)


def test_ann_recall_vs_bruteforce(spark, emb):
    exact = {r["vec_id"] for r in sim.cosine_topk(emb, 0, k=10).collect()}
    approx = {r["vec_id"] for r in sim.ann_topk(emb, 0, k=10).collect()}
    # query-directed multiprobe (22 of 64 buckets): numpy prototype measured
    # 8/10 for this query, 5.8/10 mean over 60 queries; slack for fold-order
    # float differences vs the prototype
    assert len(exact & approx) >= 5


def test_token_count_values(spark, docs):
    r = tx.token_count(docs, "text", "doc_id").collect()
    byid = {x["doc_id"]: x for x in r}
    raw = {x["doc_id"]: x["text"] for x in docs.collect()}
    for did, row in list(byid.items())[:20]:
        assert row["n_tokens"] == len(raw[did].split())
        assert row["n_chars"] == len(raw[did])


def test_langid_english_soup(spark, docs):
    # driver documents are english-ish word soup with 'the'/'a' present
    r = tx.lang_id(docs, "text", "doc_id")
    langs = {x["lang_pred"] for x in r.collect()}
    assert langs <= {"en", "und"}


def test_fingerprint_whitespace_invariance(spark, docs):
    doubled = docs.limit(5).withColumn(
        "text", F.regexp_replace("text", " ", "  ")
    ).withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
    both = docs.limit(5).unionByName(doubled)
    fp = tx.fingerprint(both, "text", "doc_id").collect()
    byid = {x["doc_id"]: x["fp_doc"] for x in fp}
    for did in list(byid):
        if did < 1_000_000:
            assert byid[did] == byid[did + 1_000_000]


def test_multimodal_plumbing(spark, docs):
    media = mm.as_media(docs.limit(50), "doc_id", "text", "text/plain")
    meta = mm.decode_meta(media).collect()
    assert len(meta) == 50
    assert all(m["n_bytes"] > 0 and len(m["fp8"]) == 8 for m in meta)
    feats = mm.extract_features(media, use_fake=True).collect()
    assert len(feats) == 50 and all(len(f["feature"]) == mm.FEATURE_DIM for f in feats)


def test_multimodal_stub_raises(spark, docs):
    media = mm.as_media(docs.limit(2), "doc_id", "text", "image/png")
    # non-BMP payloads resize to NULL (unsupported format, graceful skip)
    out = mm.resize_image(media, 64, 64).collect()
    assert len(out) == 2 and all(r["payload"] is None for r in out)
    with pytest.raises(Exception, match="NotImplementedError|unavailable"):
        mm.extract_features(media, use_fake=False).collect()


def test_ivf_recall_vs_bruteforce(spark, emb):
    exact = {r["vec_id"] for r in sim.cosine_topk(emb, 0, k=10).collect()}
    approx = {r["vec_id"] for r in sim.ivf_topk(emb, 0, k=10).collect()}
    assert len(exact & approx) >= 3


def test_ann_indexed_equals_raw(spark, emb, tmp_path):
    """Persisted bucket-partitioned index + driver-ranked probes must return
    the EXACT ann_topk result (same probe set, same cosine), and the scan
    must be partition-pruned on the probe buckets."""
    path = str(tmp_path / "annidx")
    sim.write_ann_index(emb, path)
    raw = [tuple(r) for r in sim.ann_topk(emb, query_id=0).collect()]
    idx_df = sim.ann_topk_indexed(spark, path, query_id=0)
    idx = [tuple(r) for r in idx_df.collect()]
    assert raw == idx
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        idx_df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "bucket" in plan


def _parquet_data_files(path: str) -> list:
    import os

    return [
        os.path.join(r, f)
        for r, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]


def test_index_writes_are_bucket_clustered(spark, emb, tmp_path):
    """The partitioned index writers must cluster rows by bucket before
    the write: a T-task dynamic-partition write otherwise creates up to
    T×B sliver files (round-13 measurement: 2458 files for a 2000-row
    index, with every later probe paying the per-file open cost).  Bound:
    at files_per_bucket=1 each present bucket holds exactly one data
    file, and the clustered write is layout-only (same rows read back)."""
    path = str(tmp_path / "annidx")
    # files_per_bucket=1 pinned explicitly so the 1-file/bucket assertion
    # does not depend on the conftest fixture's parallelism (ADVICE r13)
    sim.write_ann_index(emb.repartition(4), path, files_per_bucket=1)
    idx = spark.read.parquet(path)
    n_buckets = idx.select("bucket").distinct().count()
    files = _parquet_data_files(path)
    assert len(files) == n_buckets
    # layout-only: the index holds exactly the corpus rows
    assert idx.count() == emb.count()

    # explicit files_per_bucket caps per-bucket file count and keeps rows
    rows = sim.with_lsh_bucket(emb, "embedding", sim.ANN_PLANES)
    clustered = sim.bucket_clustered(rows, 64, "vec_id", files_per_bucket=2)
    p2 = str(tmp_path / "fpb2")
    clustered.write.partitionBy("bucket").parquet(p2)
    per_bucket: dict = {}
    for f in _parquet_data_files(p2):
        b = [s for s in f.split("/") if s.startswith("bucket=")][0]
        per_bucket[b] = per_bucket.get(b, 0) + 1
    assert per_bucket and max(per_bucket.values()) <= 2
    assert spark.read.parquet(p2).count() == emb.count()

    # the extension append must stay clustered too: one new file per
    # bucket the appended shard touches, not one per (task × bucket)
    epath = str(tmp_path / "embidx")
    kept = emb.where(F.col("vec_id") % 5 != 2).select("vec_id", "embedding")
    sim.bucket_clustered(
        dd.embed_index(kept), 2 ** sim.N_PLANES, "vec_id"
    ).write.partitionBy("bucket").parquet(epath)
    before = set(_parquet_data_files(epath))
    new = (
        emb.where(F.col("vec_id") % 5 == 2)
        .select("vec_id", "embedding")
        .repartition(4)
    )
    verdicts = new.select("vec_id", F.lit(True).alias("keep"))
    dd.extend_embed_index(new, verdicts, epath)
    added = set(_parquet_data_files(epath)) - before
    touched = (
        dd.embed_index(new).select("bucket").distinct().count()
    )
    assert len(added) <= touched
    assert (
        spark.read.parquet(epath).count() == kept.count() + new.count()
    )


def test_bucket_clustered_missing_salt_col_fails_fast(spark, emb):
    """A frame lacking the salt column must fail up front EVERYWHERE, not
    only on clusters where defaultParallelism >= 2*n_buckets makes the
    salt path live (the latent env-dependent break ADVICE r13 flagged)."""
    rows = sim.with_lsh_bucket(
        emb.select(F.col("embedding")), "embedding", sim.ANN_PLANES
    )
    with pytest.raises(ValueError, match="salt column 'vec_id' not in"):
        sim.bucket_clustered(rows, 64, "vec_id")


def test_dedup_components_transitive(spark, docs):
    """A~B and B~C (but A and C further apart) must share one component —
    the transitive semantics the greedy keep-filter cannot express."""
    base = docs.limit(1).collect()[0]
    extra = spark.createDataFrame(
        [
            (base["doc_id"], base["text"]),
            (9000001, base["text"] + " tail"),
            (9000002, base["text"] + " tail more"),
        ],
        "doc_id: long, text: string",
    )
    r = {
        x["doc_id"]: (x["component"], x["keep"])
        for x in dd.dedup_components(extra, "text", "doc_id").collect()
    }
    assert r[9000001][0] == r[9000002][0] == r[base["doc_id"]][0]
    keepers = [d for d, (_, k) in r.items() if k]
    assert keepers == [base["doc_id"]]


def test_dedup_keep_best_prefers_quality(spark, docs):
    """keep_best marks the per-component quality argmax, not the min id:
    a near-dup whose copy has MORE English stopwords (higher quality
    score) must win even with the larger doc_id; every component gets
    exactly one keeper."""
    base = docs.limit(1).collect()[0]
    extra = spark.createDataFrame(
        [
            (base["doc_id"], base["text"] + " ## #"),  # degraded copy
            (9000001, base["text"] + " the of and"),
        ],
        "doc_id: long, text: string",
    )
    r = {x["doc_id"]: x for x in
         dd.dedup_keep_best(extra, "text", "doc_id").collect()}
    assert r[base["doc_id"]]["component"] == r[9000001]["component"]
    assert r[9000001]["keep_best"] is True  # higher quality, higher id
    assert r[base["doc_id"]]["keep_best"] is False
    assert r[9000001]["quality"] > r[base["doc_id"]]["quality"]
    # whole-corpus invariant: one keeper per component
    full = dd.dedup_keep_best(docs, "text", "doc_id")
    per = full.groupBy("component").agg(
        F.sum(F.col("keep_best").cast("int")).alias("n")
    )
    assert per.where(F.col("n") != 1).count() == 0


def test_bmp_codec_roundtrip():
    """Pure-Python BMP encode/decode: header, stride padding, bottom-up
    rows, BGR swizzle — decode recovers exact geometry and pixel values."""
    px = [(r * 10, r * 10 + 1, r * 10 + 2) for r in range(15)]  # 5x3 RGB
    b = mm.encode_bmp(px, 5, 3)
    assert b[:2] == b"BM"
    w, h, s, tl = mm._decode_bmp(b)
    assert (w, h) == (5, 3)
    assert s == sum(sum(p) for p in px)
    assert tl == px[0][0]  # top-left red channel survives the row flip


def test_ppm_decode():
    raster = bytes(range(2 * 2 * 3))
    payload = b"P6\n# comment\n2 2\n255\n" + raster
    w, h, s, first = mm._decode_ppm(payload)
    assert (w, h) == (2, 2)
    assert s == sum(raster)
    assert first == raster[0]


def test_decode_image_and_resize(spark, docs):
    media = mm.synth_bmp_media(docs.limit(8), "doc_id")
    out = {r["media_id"]: r for r in mm.decode_image(media).collect()}
    assert len(out) == 8
    for mid, r in out.items():
        assert (r["format"], r["width"], r["height"]) == ("bmp", 5, 3)
        assert r["px_sum"] == sum((mid * 31 + i) % 256 for i in range(45))
        assert r["topleft_r"] == (mid * 31) % 256
    # nearest-neighbour resize: decode -> resample -> re-encode, then
    # decode AGAIN and check geometry + top-left pixel preservation
    resized = mm.decode_image(mm.resize_image(media, 2, 2)).collect()
    for r in resized:
        assert (r["format"], r["width"], r["height"]) == ("bmp", 2, 2)
        assert r["topleft_r"] == (r["media_id"] * 31) % 256


def test_decode_header_meta_png_jpeg(spark, docs):
    """Header-only metadata for real-corpus formats: PNG IHDR and JPEG
    SOF parse the synthesized payloads back to their closed-form
    dimensions; corrupt-magic payloads quarantine to NULL fields."""
    media = mm.synth_png_jpeg_media(docs.limit(40), "doc_id")
    out = {r["media_id"]: r for r in mm.decode_header_meta(media).collect()}
    assert len(out) == 40
    seen = set()
    for mid, r in out.items():
        if mid % 17 == 0:
            assert r["format"] is None and r["width"] is None
            seen.add("corrupt")
            continue
        assert r["format"] == ("png" if mid % 2 == 0 else "jpeg")
        assert r["width"] == 1 + mid % 64
        assert r["height"] == 1 + (mid // 3) % 48
        assert r["bit_depth"] == 8 and r["n_channels"] == 3
        seen.add(r["format"])
    assert seen == {"png", "jpeg", "corrupt"}  # all branches non-vacuous


def test_png_encoder_emits_valid_png():
    """The synthesized PNGs are REAL: every chunk CRCs, and the IDAT
    zlib-inflates to the exact filter-0 scanlines — so decode_header_meta
    is exercised on files any standards-compliant decoder would open."""
    import struct as st
    import zlib

    px = bytes((7 * i + 3) % 256 for i in range(5 * 3 * 3))
    b = mm.encode_png(5, 3, px, text=b"note")
    assert b[:8] == mm._PNG_SIG
    pos, chunks = 8, []
    while pos < len(b):
        ln, ct = st.unpack_from(">I4s", b, pos)
        body = b[pos + 8 : pos + 8 + ln]
        crc = st.unpack_from(">I", b, pos + 8 + ln)[0]
        assert zlib.crc32(ct + body) & 0xFFFFFFFF == crc
        chunks.append((ct, body))
        pos += 12 + ln
    assert [c for c, _ in chunks] == [b"IHDR", b"tEXt", b"IDAT", b"IEND"]
    idat = dict(chunks)[b"IDAT"]
    rows = zlib.decompress(idat)
    assert rows == b"".join(
        b"\x00" + px[y * 15 : (y + 1) * 15] for y in range(3)
    )


def _png_chunk(ctype, data):
    """Length + type + payload + CRC32 — the PNG chunk framing shared
    by the reference builder and the hand-crafted malformed payloads."""
    import struct as st
    import zlib

    raw = ctype + data
    return (st.pack(">I", len(data)) + raw
            + st.pack(">I", zlib.crc32(raw) & 0xFFFFFFFF))


def _make_filtered_png(w, h, nch, color_type, rows_px, ft):
    """Reference PNG builder for the decode tests: apply spec filter
    ``ft`` FORWARD to the reconstructed scanlines (the inverse of what
    _decode_png must undo), deflate, and chunk with real CRCs."""
    import struct as st
    import zlib

    chunk = _png_chunk
    stride = w * nch
    out_rows = b""
    prev = bytes(stride)
    for line in rows_px:
        f = bytearray(stride)
        for i in range(stride):
            a = line[i - nch] if i >= nch else 0
            up = prev[i]
            c = prev[i - nch] if i >= nch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (a + up) >> 1
            else:
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    up if pb <= pc else c)
            f[i] = (line[i] - pred) & 0xFF
        out_rows += bytes([ft]) + bytes(f)
        prev = bytes(line)
    ihdr = st.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (mm._PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(out_rows))
            + chunk(b"IEND", b""))


def test_decode_png_pixels_all_filters():
    """_decode_png reconstructs the exact pixels for every color type
    (gray / RGB / gray+alpha / RGBA) under EVERY spec filter (None /
    Sub / Up / Average / Paeth), verified against an independent
    forward-filtering reference builder — plus the encode_png
    round-trip (filter 0, with a tEXt chunk in the walk path)."""
    import random

    w, h = 5, 4
    px = bytes((i * 7 + 3) % 256 for i in range(w * h * 3))
    assert mm._decode_png(mm.encode_png(w, h, px, text=b"hi")) == (
        w, h, sum(px), px[0],
    )
    rng = random.Random(13)
    for color_type, nch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        for ft in (0, 1, 2, 3, 4):
            w, h = 7, 5
            rows = [bytearray(rng.randrange(256) for _ in range(w * nch))
                    for _ in range(h)]
            got = mm._decode_png(
                _make_filtered_png(w, h, nch, color_type, rows, ft)
            )
            assert got == (w, h, sum(sum(r) for r in rows), rows[0][0]), (
                color_type, ft,
            )


def test_decode_png_pixels_refusals_and_quarantine(spark):
    """Refuse-don't-approximate arms (16-bit, interlace raise
    NotImplementedError; CRC damage, truncation, bad filter byte raise
    ValueError) and the Spark kernel's quarantine: every malformed or
    unsupported payload keeps its NULL-field row, never fails the
    task."""
    import struct as st
    import zlib

    base = _make_filtered_png(3, 3, 3, 2, [bytearray(9) for _ in range(3)], 0)

    def patched(off, val):
        body = bytearray(base)
        body[off] = val
        st.pack_into(
            ">I", body, 16 + 13,
            zlib.crc32(bytes(body[12 : 16 + 13])) & 0xFFFFFFFF,
        )
        return bytes(body)

    with pytest.raises(NotImplementedError):
        mm._decode_png(patched(24, 16))          # 16-bit depth
    with pytest.raises(NotImplementedError):
        mm._decode_png(patched(28, 1))           # Adam7 interlace
    bad_crc = bytearray(base)
    bad_crc[-20] ^= 0xFF                         # inside IDAT
    with pytest.raises(ValueError):
        mm._decode_png(bytes(bad_crc))
    with pytest.raises(ValueError):
        mm._decode_png(base[:-10])               # truncated tail
    # invalid filter byte (9) on the first scanline
    rows = zlib.compress(b"\x09" + bytes(9) + (b"\x00" + bytes(9)) * 2)
    bad_ft = (mm._PNG_SIG
              + _png_chunk(b"IHDR", st.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 0))
              + _png_chunk(b"IDAT", rows) + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        mm._decode_png(bad_ft)
    # deflate bomb: tiny CRC-valid 1x1 IHDR over a highly compressible
    # IDAT that would inflate to ~100 MB — the bounded decompressobj
    # stops at expected+1 bytes and quarantines via ValueError instead
    # of allocating the bomb (review-found: MemoryError would kill the
    # task, violating the never-fail-the-job contract)
    bomb = (mm._PNG_SIG
            + _png_chunk(b"IHDR", st.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0))
            + _png_chunk(b"IDAT", zlib.compress(bytes(100_000_000), 9))
            + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="decompressed length"):
        mm._decode_png(bomb)
    # lying IHDR: dimensions whose raster could not fit in the shipped
    # IDAT refuse BEFORE any inflate — covers both the 2^31-square
    # payload that made the bounded decompress raise task-killing
    # OverflowError (max_length past ssize_t) and the claimed-huge
    # honest-looking IHDR that let a small bomb materialize fully
    # before the length check (review-found, pass 3)
    for w_, h_ in ((0x7FFFFFFF, 0x7FFFFFFF), (50_000, 50_000)):
        lying = (mm._PNG_SIG
                 + _png_chunk(b"IHDR",
                              st.pack(">IIBBBBB", w_, h_, 8, 6, 0, 0, 0))
                 + _png_chunk(b"IDAT", zlib.compress(bytes(64), 9))
                 + _png_chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="IDAT could encode"):
            mm._decode_png(lying)
    good = mm.encode_png(4, 2, bytes(range(24)))
    rows_df = [
        (1, good),                                # control: decodes
        (2, patched(24, 16)),                     # 16-bit → quarantine
        (3, bytes(bad_crc)),                      # CRC → quarantine
        (4, b"\x89PNG\r\n\x1a\x00" + bytes(20)),  # broken signature
        (5, None),                                # NULL payload
        (6, mm.encode_jpeg_header(9, 7)),         # non-PNG format
    ]
    df = spark.createDataFrame(rows_df, "media_id LONG, payload BINARY")
    media = df.select(
        "media_id", F.lit("image/png").alias("media_type"), "payload"
    )
    out = {r["media_id"]: r for r in mm.decode_image(media).collect()}
    assert (out[1]["format"], out[1]["width"], out[1]["height"],
            out[1]["px_sum"], out[1]["topleft_r"]) == (
        "png", 4, 2, sum(range(24)), 0,
    )
    for mid in (2, 3, 4, 5, 6):
        assert out[mid]["format"] is None and out[mid]["px_sum"] is None


def test_decode_png_pixels_synth_media(spark, docs):
    """The full kernel over the mixed synth corpus: even non-corrupt ids
    decode to their closed-form pixel sums, JPEG prefixes and corrupted
    payloads quarantine — the Spark-side half of the
    mm_decode_png_pixels driver gate."""
    media = mm.synth_png_jpeg_media(docs.limit(40), "doc_id")
    out = {r["media_id"]: r for r in mm.decode_image(media).collect()}
    assert len(out) == 40
    seen = set()
    for mid, r in out.items():
        if mid % 17 == 0 or mid % 2 == 1:
            assert r["format"] is None and r["px_sum"] is None
            seen.add("null")
            continue
        w, h = 1 + mid % 64, 1 + (mid // 3) % 48
        n = w * h * 3
        exp = sum((mid * 31 + i) % 256 for i in range(n))
        assert (r["format"], r["width"], r["height"]) == ("png", w, h)
        assert r["px_sum"] == exp and r["topleft_r"] == (mid * 31) % 256
        seen.add("png")
    assert seen == {"png", "null"}


def test_decode_header_meta_malformed_payloads(spark):
    """Untrusted-bytes discipline: truncation, CRC damage, desync,
    SOF-less JPEG, foreign magic and NULL payloads all yield NULL-field
    rows, never a task failure."""
    import struct as st
    import zlib

    good_png = mm.encode_png(4, 2, bytes(24))
    bad_crc = bytearray(good_png)
    bad_crc[18] ^= 0xFF  # flip a width byte under the IHDR CRC
    # CRC-VALID IHDR claiming width 2^31: must quarantine (dimension cap),
    # not overflow the int32 output column or fail the Arrow conversion
    huge = bytearray(good_png)
    st.pack_into(">I", huge, 16, 0x8000_0000)
    st.pack_into(
        ">I", huge, 16 + 13, zlib.crc32(bytes(huge[12 : 16 + 13])) & 0xFFFFFFFF
    )
    good_jpeg = mm.encode_jpeg_header(9, 7)
    rows = [
        (8, bytes(huge)),                 # oversized dims, valid CRC
        (1, good_png[:20]),               # truncated IHDR
        (2, bytes(bad_crc)),              # CRC mismatch
        (3, good_jpeg[:5]),               # truncated segment length
        (4, b"\xff\xd8\xff\xd9"),         # SOI+EOI, no SOF
        (5, b"GIF89a" + bytes(20)),       # foreign format
        (6, None),                        # NULL payload
        (7, good_jpeg),                   # control: parses
    ]
    df = spark.createDataFrame(rows, "media_id LONG, payload BINARY")
    media = df.select(
        "media_id", F.lit("image/x").alias("media_type"), "payload"
    )
    out = {r["media_id"]: r for r in mm.decode_header_meta(media).collect()}
    for mid in (1, 2, 3, 4, 5, 6, 8):
        assert out[mid]["format"] is None and out[mid]["width"] is None
    assert (out[7]["format"], out[7]["width"], out[7]["height"]) == (
        "jpeg", 9, 7,
    )


def test_sampling_deterministic_and_rate(spark, docs):
    from xarray_histogram_spark.operators import sampling as sp

    n = docs.count()
    kept = sp.deterministic_sample(docs, "doc_id", 0.25)
    k1 = {r["doc_id"] for r in kept.select("doc_id").collect()}
    k2 = {r["doc_id"] for r in
          sp.deterministic_sample(docs.repartition(7), "doc_id", 0.25)
          .select("doc_id").collect()}
    assert k1 == k2  # partitioning-independent
    assert 0.15 * n < len(k1) < 0.35 * n  # rate is approximately honoured
    # nested property: a 0.1 sample is a subset of the 0.25 sample
    k3 = {r["doc_id"] for r in
          sp.deterministic_sample(docs, "doc_id", 0.1).select("doc_id").collect()}
    assert k3 <= k1
    # salted sample differs
    k4 = {r["doc_id"] for r in
          sp.deterministic_sample(docs, "doc_id", 0.25, salt="v2")
          .select("doc_id").collect()}
    assert k4 != k1


def test_assign_splits_disjoint_exhaustive(spark, docs):
    from xarray_histogram_spark.operators import sampling as sp

    out = sp.assign_splits(docs, "doc_id", [("train", 0.8), ("val", 0.1), ("test", 0.1)])
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    n = docs.count()
    assert sum(counts.values()) == n  # exhaustive
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 0.7 * n


def test_topk_per_group_bound(spark, docs):
    from xarray_histogram_spark.operators import sampling as sp

    out = sp.topk_per_group(
        docs.select("doc_id", "lang"), ["lang"], "doc_id", 5
    )
    per = out.groupBy("lang").count().collect()
    assert all(r["count"] <= 5 for r in per)
    assert out.where(F.col("rk") > 5).count() == 0


def test_top_terms_semantics(spark):
    """Hand-checkable TF-IDF top-terms: 'cat' appears only in doc 1 (rare,
    high idf beats the ubiquitous 'the' despite lower tf); ties break on
    the term string; k truncates; min_df prunes singletons."""
    from xarray_histogram_spark.operators.text import top_terms

    docs = spark.createDataFrame(
        [
            (1, "the the the cat cat sat"),
            (2, "the the dog sat sat"),
            (3, "the bird"),
        ],
        "doc_id long, text string",
    )
    out = top_terms(docs, "text", "doc_id", k=2)
    rows = {
        r["doc_id"]: r
        for r in out.where(F.col("doc_id") == 1).orderBy(
            F.col("score").desc()).collect()
    }
    top1 = out.where(F.col("doc_id") == 1).orderBy(
        F.col("score").desc(), "term").first()
    # doc 1: cat tf=2 df=1 → idf=(3-1+.5)/1.5 ; the tf=3 df=3 → idf=.5/3.5
    assert top1["term"] == "cat"
    assert top1["score"] == 2.0 * ((3.0 - 1.0 + 0.5) / 1.5)
    assert out.groupBy("doc_id").count().agg(F.max("count")).first()[0] <= 2
    # min_df=2 drops every term that appears in only one document
    pruned = top_terms(docs, "text", "doc_id", k=5, min_df=2)
    kept = {r["term"] for r in pruned.collect()}
    assert kept == {"the", "sat"}


def test_lsh_max_bucket_guard(spark):
    """max_bucket drops degenerate LSH buckets before quadratic pair
    expansion: a corpus of identical texts (every doc in one bucket per
    band) yields zero candidate pairs under a cap below the corpus size,
    and the full m(m-1)/2 without it."""
    from xarray_histogram_spark.operators.dedup import lsh_candidate_pairs

    docs = spark.createDataFrame(
        [(i, "the same boilerplate page text repeated") for i in range(20)],
        "doc_id long, text string",
    )
    uncapped = lsh_candidate_pairs(docs, "text", "doc_id")
    assert uncapped.count() == 20 * 19 // 2
    capped = lsh_candidate_pairs(docs, "text", "doc_id", max_bucket=10)
    assert capped.count() == 0


def test_embed_max_bucket_guard(spark, sf_dir):
    """embed_dup_pairs max_bucket: capping at 1 vector per bucket kills
    every pair; a loose cap reproduces the uncapped output."""
    from xarray_histogram_spark.operators.similarity import embed_dup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    loose = embed_dup_pairs(emb, threshold=0.5, max_bucket=10**9)
    base = embed_dup_pairs(emb, threshold=0.5)
    assert loose.count() == base.count()
    assert embed_dup_pairs(emb, threshold=0.5, max_bucket=1).count() == 0


def test_curate_documents_semantics(spark):
    """Curation pipeline: exact-duplicate texts collapse to the lowest id,
    the quality gate and language filter drop rows, splits are exhaustive
    and deterministic across reruns."""
    from xarray_histogram_spark.operators.curate import curate_documents

    docs = spark.createDataFrame(
        [
            (3, "the quick brown fox jumps over the lazy dog"),
            (7, "the quick brown fox jumps over the lazy dog"),  # dup of 3
            (1, "der hund und die katze sind nicht da"),
            (9, "!!! ??? ***"),  # low quality
        ],
        "doc_id long, text string",
    )
    out = curate_documents(docs, "text", "doc_id").collect()
    ids = {r["doc_id"] for r in out}
    assert 7 not in ids and 3 in ids  # dup keeps lowest id
    assert {r["split"] for r in out} <= {"train", "val", "test"}
    again = curate_documents(docs, "text", "doc_id").collect()
    assert sorted(map(str, out)) == sorted(map(str, again))
    en_only = curate_documents(docs, "text", "doc_id", langs=("en",)).collect()
    assert {r["doc_id"] for r in en_only} == {3}
    hq = curate_documents(docs, "text", "doc_id", quality_min=0.3).collect()
    assert 9 not in {r["doc_id"] for r in hq}


def test_deterministic_take_semantics(spark, docs):
    """Exactly n rows; a smaller take is a prefix (subset) of a larger one;
    partitioning-independent."""
    from xarray_histogram_spark.operators import sampling as sp

    t200 = {r["doc_id"] for r in sp.deterministic_take(docs, "doc_id", 200).collect()}
    t50 = {r["doc_id"] for r in sp.deterministic_take(docs, "doc_id", 50).collect()}
    assert len(t200) == 200 and len(t50) == 50 and t50 <= t200
    again = {
        r["doc_id"]
        for r in sp.deterministic_take(docs.repartition(9), "doc_id", 200).collect()
    }
    assert again == t200
    with pytest.raises(ValueError):
        sp.deterministic_take(docs, "doc_id", 0)


def test_vocabulary_semantics(spark):
    """Ranks follow (tf desc, term asc); min_df prunes; tf counts total
    occurrences while df_t counts documents."""
    docs = spark.createDataFrame(
        [(1, "a a a b c"), (2, "a b b z"), (3, "a q")],
        "doc_id long, text string",
    )
    out = {r["term"]: r for r in tx.vocabulary(docs, "text", "doc_id", k=10).collect()}
    assert out["a"]["tf"] == 5 and out["a"]["df_t"] == 3 and out["a"]["rank"] == 1
    assert out["b"]["tf"] == 3 and out["b"]["df_t"] == 2 and out["b"]["rank"] == 2
    assert out["c"]["rank"] == 3  # tf=1 ties break on the term string
    pruned = {r["term"] for r in
              tx.vocabulary(docs, "text", "doc_id", k=10, min_df=2).collect()}
    assert pruned == {"a", "b"}


def test_chunk_assignments_semantics(spark):
    """Concat-and-chunk invariants: offsets tile each shard's stream with
    no gaps, chunk indices are exact integer division of the token span,
    empty docs land at their offset, and the assignment is
    partitioning-independent."""
    from xarray_histogram_spark.operators import sampling as sp

    rows = [(i, "s" + str(i % 2), (i * 37) % 90) for i in range(40)]
    rows.append((100, "s0", 0))  # empty doc
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = sp.chunk_assignments(df, "doc_id", "n_tokens", 64, "source").collect()
    by_shard: dict = {}
    for r in sorted(out, key=lambda r: (r["source"], r["doc_id"])):
        pos = by_shard.setdefault(r["source"], 0)
        assert r["tok_offset"] == pos  # no gaps, no overlap
        by_shard[r["source"]] = pos + r["n_tokens"]
        assert r["chunk_first"] == r["tok_offset"] // 64
        last = (
            (r["tok_offset"] + r["n_tokens"] - 1) // 64
            if r["n_tokens"] > 0
            else r["tok_offset"] // 64
        )
        assert r["chunk_last"] == last
    out2 = sp.chunk_assignments(
        df.repartition(7), "doc_id", "n_tokens", 64, "source"
    ).collect()
    assert sorted(map(str, out)) == sorted(map(str, out2))
    with pytest.raises(ValueError):
        sp.chunk_assignments(df, "doc_id", "n_tokens", 0, "source")


def test_chunk_assignments_duplicate_id_determinism(spark, tmp_path):
    """Duplicate ids within a shard: the (id, token) secondary sort key
    makes offsets deterministic across layouts, and matches the DuckDB
    mirror (ADVICE r05)."""
    from .util import assert_matches_sql
    from xarray_histogram_spark.operators import sampling as sp

    rows = [
        (1, "s0", 10), (1, "s0", 3), (1, "s0", 10),  # full triple dup too
        (2, "s0", 7), (2, "s0", 1),
        (3, "s1", 5), (3, "s1", 5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = sp.chunk_assignments(df, "doc_id", "n_tokens", 8, "source")
    a = sorted(map(str, out.collect()))
    for n in (2, 5):
        b = sorted(
            map(
                str,
                sp.chunk_assignments(
                    df.repartition(n), "doc_id", "n_tokens", 8, "source"
                ).collect(),
            )
        )
        assert a == b
    # shorter duplicate of id=1 packs first: offsets 0(len 3),3,13
    offs = sorted(
        (r["n_tokens"], r["tok_offset"]) for r in out.collect() if r["doc_id"] == 1
    )
    assert offs == [(3, 0), (10, 3), (10, 13)]
    # and the DuckDB mirror agrees on the duplicate-id input
    import duckdb

    p = str(tmp_path / "toks.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW toks AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    assert_matches_sql(
        out,
        sp.chunk_assignments_sql("toks", "doc_id", "n_tokens", 8, "source"),
        con,
    )


def test_simhash_pairs_semantics(spark):
    """Identical docs pair at hamming 0; a lightly-edited near-dup pairs
    with a small positive hamming; unrelated docs don't pair at the
    default threshold."""
    base = "the quick brown fox jumps over the lazy dog " * 8
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # exact dup of 1
            (3, base.replace("lazy", "sleepy", 2)),  # near-dup of 1
            (4, "völlig anderes dokument über ganz andere themen " * 8),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dd.simhash_pairs(docs, "text", "doc_id", max_hamming=10).collect()
    }
    assert out[(1, 2)] == 0
    assert (1, 4) not in out and (2, 4) not in out and (3, 4) not in out
    # max_bucket drops the whole degenerate bucket
    none = dd.simhash_pairs(docs, "text", "doc_id", max_bucket=1).collect()
    assert none == []


def test_jaccard_null_text_pairs_dropped(spark):
    """Two null-text docs share the all-'g' sentinel minhash signature and
    become an LSH candidate pair, but their shingle intersection is empty
    — the inner-join oracle emits no row for them, so neither must the
    array_intersect form (neither as jaccard=0.0 nor, via null-matching
    array_intersect semantics, as jaccard=1.0)."""
    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, "some real text content here")],
        "doc_id long, text string",
    )
    assert dd.jaccard_pairs(docs, "text", "doc_id").collect() == []
    kept = {r["doc_id"] for r in dd.near_dedup_keep(docs, "text", "doc_id").collect()}
    assert kept == {1, 2, 3}


def test_curate_narrow_equals_wide(spark, docs):
    """wide_rows=False (min-id keeper + semi-join) is row-identical to the
    window form, under any input partitioning."""
    from xarray_histogram_spark.operators.curate import curate_documents

    kw = dict(quality_min=0.2, langs=("en", "und"), salt="curate")
    wide = curate_documents(docs, "text", "doc_id", **kw).collect()
    narrow = curate_documents(
        docs.repartition(7), "text", "doc_id", wide_rows=False, **kw
    ).collect()
    assert sorted(map(str, wide)) == sorted(map(str, narrow))


def test_components_reliable_checkpoint(spark, docs, tmp_path):
    """checkpoint_dir switches min-label propagation to reliable
    checkpoint() — same labels as the localCheckpoint default."""
    a = dd.dedup_components(docs, "text", "doc_id").collect()
    edges = (
        dd.jaccard_pairs(docs, "text", "doc_id")
        .where(F.col("jaccard") >= 0.8)
        .select("id_a", "id_b")
    )
    res = dd.components_from_edges(
        docs, edges, "doc_id", checkpoint_dir=str(tmp_path / "ckpt")
    )
    b = res.collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
    # Checkpoint hygiene: the per-round cc-work-* scratch subdir is
    # deleted before return; exactly one cc-final-* subdir (backing the
    # returned DataFrame) remains.
    left = sorted(p.name for p in (tmp_path / "ckpt").iterdir())
    assert not [n for n in left if n.startswith("cc-work-")], left
    assert len([n for n in left if n.startswith("cc-final-")]) == 1, left
    # the returned DataFrame stays consumable off its final checkpoint
    assert res.count() == len(b)


def test_ngram_contamination_semantics(spark):
    """A corpus doc containing a benchmark passage is flagged with the
    passage's shingle count; clean docs are absent; min_hits thresholds."""
    from xarray_histogram_spark.operators.dedup import ngram_contamination

    leak = "the secret benchmark passage nobody should train on"
    corpus = spark.createDataFrame(
        [
            (1, f"some training text ... {leak} ... more text"),
            (2, "completely unrelated content with its own words"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, leak)], "doc_id long, text string")
    out = {r["doc_id"]: r["n_hits"]
           for r in ngram_contamination(corpus, bench, "text", "doc_id",
                                        k=12, min_hits=5).collect()}
    assert 1 in out and 2 not in out
    # the leaked passage contributes its full distinct-shingle set
    assert out[1] >= len(leak) - 11
    strict = ngram_contamination(corpus, bench, "text", "doc_id",
                                 k=12, min_hits=10**6)
    assert strict.count() == 0


def test_repetition_stats_semantics(spark):
    """Repetition signals: a fully repeated doc scores low distinct ratios
    and high line-dup; a unique-token doc scores 1.0 / 0.0; empty → NULLs."""
    from xarray_histogram_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            (2, "each word here differs"),
            (3, "line one\nline one\nline two"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs, "text", "doc_id").collect()}
    assert out[1]["token_distinct_ratio"] == 0.25
    assert out[2]["token_distinct_ratio"] == 1.0
    assert out[2]["line_dup_ratio"] == 0.0
    assert out[3]["line_dup_ratio"] == pytest.approx(1.0 - 2.0 / 3.0)
    assert out[4]["token_distinct_ratio"] is None
    assert out[1]["shingle3_distinct_ratio"] < out[2]["shingle3_distinct_ratio"]


def test_remove_repeated_lines_semantics(spark):
    """C4-style corpus-wide line filter: boilerplate lines occurring in
    more than max_occurrences places are dropped from EVERY document;
    surviving lines keep their original order (byte-exact reassembly,
    empty lines preserved); untouched docs round-trip."""
    from xarray_histogram_spark.operators.text import remove_repeated_lines

    docs = spark.createDataFrame(
        [
            (1, "keep me\ncookie banner\nunique line a"),
            (2, "cookie banner\nunique line b"),
            (3, "cookie banner\nkeep me too\n\nafter empty"),
            (4, "all unique here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r
           for r in remove_repeated_lines(docs, "text", "doc_id", 1).collect()}
    assert out[1]["text_clean"] == "keep me\nunique line a"
    assert out[2]["text_clean"] == "unique line b"
    assert out[3]["text_clean"] == "keep me too\n\nafter empty"
    assert out[4]["text_clean"] == "all unique here"
    assert [out[k]["n_lines_removed"] for k in (1, 2, 3, 4)] == [1, 1, 1, 0]
    # higher cap keeps everything
    loose = {r["doc_id"]: r["n_lines_removed"]
             for r in remove_repeated_lines(docs, "text", "doc_id", 3).collect()}
    assert set(loose.values()) == {0}
    with pytest.raises(NotImplementedError):
        remove_repeated_lines(docs, "text", "doc_id", 1, keep_first=True)


def test_sample_frames_malformed_payloads(spark):
    """Untrusted corpus bytes must not kill the stage: garbled headers,
    zero dims, 16-bit maxval and truncated frames stop the per-payload
    walk at the last clean frame; valid frames before the corruption are
    still emitted."""
    import struct

    from xarray_histogram_spark.operators.multimodal import sample_frames

    def frame(w, h, px):
        return b"P6\n%d %d\n255\n" % (w, h) + bytes([px]) * (w * h * 3)

    rows = [
        (1, "video/p6", frame(2, 2, 7) + frame(2, 2, 9)),          # clean
        (2, "video/p6", b"P6"),                                     # truncated header
        (3, "video/p6", b"P6\nxy z\n255\n"),                        # garbled digits
        (4, "video/p6", b"P6\n0 0\n255\n"),                         # zero dims
        (5, "video/p6", b"P6\n1 1\n65535\n" + b"\x00" * 6),        # 16-bit
        (6, "video/p6", frame(1, 1, 3) + frame(4, 4, 1)[:10]),      # clean + truncated
        (7, "image/bmp", b"BM\x00\x00"),                            # non-P6
    ]
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary"
    )
    got = sample_frames(media).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["media_id"], []).append(r)
    assert set(by_id) == {1, 6}
    assert [r["frame_idx"] for r in sorted(by_id[1], key=lambda r: r["frame_idx"])] == [0, 1]
    assert len(by_id[6]) == 1 and by_id[6][0]["px_sum"] == 9


def test_line_operators_multiline_oracle(spark, tmp_path):
    """The documents fixture is single-line text, so the driver gate never
    exercises the newline-splitting mirrors on real line structure; pin
    engine ≡ DuckDB on multi-line (and tab/empty-line) documents here."""
    import duckdb

    from xarray_histogram_spark.operators.text import (
        remove_repeated_lines,
        remove_repeated_lines_sql,
        repetition_stats,
        repetition_stats_sql,
    )

    from .util import assert_matches_sql

    docs = spark.createDataFrame(
        [
            (1, "keep me\ncookie banner\nunique line a"),
            (2, "cookie banner\nunique line b"),
            (3, "cookie banner\nkeep me too\n\nafter empty"),
            (4, "all unique here"),
            (5, "tab\there\ncookie banner"),
        ],
        "doc_id long, text string",
    )
    out = str(tmp_path / "ml.parquet")
    docs.coalesce(1).write.parquet(out)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW mldocs AS SELECT * FROM read_parquet('{out}/*.parquet')"
    )
    assert_matches_sql(
        remove_repeated_lines(spark.read.parquet(out), "text", "doc_id", 1),
        remove_repeated_lines_sql("mldocs", "text", "doc_id", 1), con,
    )
    assert_matches_sql(
        repetition_stats(spark.read.parquet(out), "text", "doc_id"),
        repetition_stats_sql("mldocs", "text", "doc_id"), con,
    )


def test_sampling_edge_guards(spark, docs):
    """Empty stratified rates fall back to the default threshold on both
    engines; quoted salts survive the SQL mirror; decoders NULL malformed
    payloads instead of failing the task."""
    from xarray_histogram_spark.operators import sampling as sp
    import duckdb

    out = sp.stratified_sample(docs, "lang", "doc_id", {}, default_rate=0.3)
    n = out.count()
    assert 0 < n < docs.count()
    con = duckdb.connect()
    pred = sp.stratified_sample_sql("lang", "doc_id", {}, default_rate=0.3)
    assert "CASE" not in pred
    salted = sp.deterministic_sample_sql("doc_id", 0.5, salt="v1'2024")
    con.execute(f"SELECT 1 WHERE {salted.replace('doc_id', '42')}")  # parses


def test_decoders_null_malformed_payloads(spark):
    from xarray_histogram_spark.operators.multimodal import (
        decode_image, decode_meta, resize_image,
    )

    rows = [
        (1, "image/bmp", bytearray(b"BM\x00\x00")),          # truncated header
        (2, "image/ppm", bytearray(b"P6\n2 2\n255\n")),      # header, no raster
        (3, "image/bmp", None),                               # null payload
    ]
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary"
    )
    got = {r["media_id"]: r for r in decode_image(media).collect()}
    assert all(got[i]["px_sum"] is None for i in (1, 2, 3))
    rz = {r["media_id"]: r["payload"] for r in resize_image(media, 2, 2).collect()}
    assert all(v is None for v in rz.values())
    meta = {r["media_id"]: r["n_bytes"] for r in decode_meta(media).collect()}
    assert meta[3] is None and meta[1] == 4  # NULL payload -> NULL n_bytes


def test_asof_join_semantics(spark):
    from xarray_histogram_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 100, 10), (2, 100, 20), (3, 100, 35), (4, 200, 50)],
        "lid long, k long, t long",
    )
    right = spark.createDataFrame(
        # two right rows at t=20 for key 100 (tie → max rid wins); one row
        # with a NULL value (must NOT tear back to an older row's value)
        [(7, 100, 5, 1.0), (8, 100, 20, 2.0), (9, 100, 20, None),
         (6, 300, 1, 9.0)],
        "rid long, k long, t long, v double",
    )
    out = {
        r["lid"]: r
        for r in asof_join(
            left, right, ["k"], "t", ["v"], "rid"
        ).collect()
    }
    assert out[1]["asof_rid"] == 7 and out[1]["asof_v"] == 1.0
    # inclusive bound + tie at t=20: rid 9 (max) wins, and its NULL v is
    # kept rather than falling back to rid 8's 2.0
    assert out[2]["asof_rid"] == 9 and out[2]["asof_v"] is None
    assert out[3]["asof_rid"] == 9
    assert out[4]["asof_rid"] is None and out[4]["asof_ts"] is None

    # tolerance: lid 3 at t=35 is 15 past its match at 20 → nulled at tol 10
    tol = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(
            left, right, ["k"], "t", ["v"], "rid", tolerance=10
        ).collect()
    }
    assert tol[3] is None and tol[2] == 9


def test_range_join_count_semantics(spark):
    from xarray_histogram_spark.operators.joins import range_join_count

    left = spark.createDataFrame(
        [(1, 100, 0), (2, 100, 95), (3, 200, 0)], "lid long, k long, t long"
    )
    right = spark.createDataFrame(
        # for lid 1 (band (0, 100]): rows at 1, 100 count; row at 0 is
        # strictly-after-excluded; 150 out of band.  Cross-bucket: lid 2's
        # band (95, 195] catches 100 and 150 from the next bucket.
        [(100, 1), (100, 0), (100, 100), (100, 150), (200, 500)],
        "k long, t long",
    )
    out = {
        r["lid"]: r["n_in_window"]
        for r in range_join_count(left, right, ["k"], "t", 100, "lid").collect()
    }
    assert out == {1: 2, 2: 2, 3: 0}


def test_kmeans_refine_semantics(spark, emb):
    from xarray_histogram_spark.operators.similarity import kmeans_refine

    out = kmeans_refine(emb, k=8, n_iter=2, n_hint=512, dim=64).collect()
    n_total = emb.count()
    # every vector lands in exactly one surviving cluster
    assert sum(r["n"] for r in out) == n_total
    assert 1 <= len(out) <= 32
    # centroid components are means of unit-scale data: bounded
    assert all(abs(r["c0"]) < 1.0 and abs(r["c1"]) < 1.0 for r in out)
    # n_iter=1 equals plain seed-assignment summary (no refinement step)
    one = kmeans_refine(emb, k=8, n_iter=1, n_hint=512, dim=64).collect()
    assert sum(r["n"] for r in one) == n_total
    with pytest.raises(ValueError, match="n_iter"):
        kmeans_refine(emb, k=8, n_iter=0)


def test_dup_ngram_stats_semantics(spark):
    from xarray_histogram_spark.operators.text import dup_ngram_stats

    rows = [
        (1, "a b c d"),        # grams: "a b c","b c d"
        (2, "a b c x"),        # shares "a b c" with doc 1
        (3, "p q r"),          # unique gram
        (4, "a b"),            # < n tokens -> no output row
        (5, None),             # null text -> no output row
        (6, "z z z z z"),      # within-doc repeats dedup to ONE gram
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dup_ngram_stats(df, "text", "doc_id").collect()}
    assert set(out) == {1, 2, 3, 6}
    assert out[1]["n_grams"] == 2 and out[1]["n_dup"] == 1
    assert out[1]["dup_frac"] == 0.5
    assert out[2]["n_dup"] == 1
    assert out[3]["n_dup"] == 0 and out[3]["dup_frac"] == 0.0
    assert out[6]["n_grams"] == 1 and out[6]["n_dup"] == 0


def test_decode_audio_malformed_payloads(spark):
    from xarray_histogram_spark.operators.multimodal import (
        decode_audio, encode_wav,
    )

    good = encode_wav([1, -2, 3], 16000)
    # data chunk before fmt: rejected by the chunk walker
    swapped = good[:12] + good[36:] + good[12:36]
    rows = [
        (1, "audio/wav", bytearray(good)),
        (2, "audio/wav", bytearray(b"RIFF\x00\x00\x00\x00WAVE")),  # no chunks
        (3, "audio/wav", bytearray(b"ID3\x03junk")),               # not RIFF
        (4, "audio/wav", None),
        (5, "audio/wav", bytearray(swapped)),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary"
    )
    got = {r["media_id"]: r for r in decode_audio(media).collect()}
    assert got[1]["format"] == "wav" and got[1]["sample_rate"] == 16000
    assert got[1]["n_samples"] == 3 and got[1]["sample_sum"] == 2
    assert got[1]["first_sample"] == 1
    assert all(got[i]["format"] is None for i in (2, 3, 4, 5))
    assert all(got[i]["sample_sum"] is None for i in (2, 3, 4, 5))


def test_asof_join_null_faithfulness(spark):
    from xarray_histogram_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 100, 10), (2, None, 10)], "lid long, k long, t long"
    )
    right = spark.createDataFrame(
        # NULL ts and NULL key rows can match nothing (SQL semantics);
        # NULL-rid row loses the equal-ts tie to rid 8
        [(7, 100, None, 1.0), (6, None, 5, 2.0),
         (8, 100, 10, 3.0), (None, 100, 10, 4.0)],
        "rid long, k long, t long, v double",
    )
    out = {
        r["lid"]: r
        for r in asof_join(left, right, ["k"], "t", ["v"], "rid").collect()
    }
    assert out[1]["asof_rid"] == 8 and out[1]["asof_v"] == 3.0
    assert out[2]["asof_rid"] is None and out[2]["asof_v"] is None


def test_asof_join_rejects_colliding_left_columns(spark):
    """Left columns named like the internals (__side/__m/…) or the outputs
    (asof_*) would silently duplicate — must raise up front (ADVICE r05)."""
    from xarray_histogram_spark.operators.joins import asof_join

    right = spark.createDataFrame(
        [(8, 100, 10, 3.0)], "rid long, k long, t long, v double"
    )
    for bad in ("__side", "__m", "__rid", "__match", "asof_ts", "asof_rid",
                "asof_v"):
        left = spark.createDataFrame(
            [(1, 100, 10, 0)], f"lid long, k long, t long, `{bad}` long"
        )
        with pytest.raises(ValueError, match="collide"):
            asof_join(left, right, ["k"], "t", ["v"], "rid")
    # non-colliding payload still works
    ok = spark.createDataFrame(
        [(1, 100, 10, 0)], "lid long, k long, t long, extra long"
    )
    assert asof_join(ok, right, ["k"], "t", ["v"], "rid").count() == 1


def test_range_join_negative_ts_buckets(spark):
    from xarray_histogram_spark.operators.joins import range_join_count

    # negative timestamps: floor (not truncate-toward-zero) bucketing —
    # t=-50 bucket -1, right rows at -49..0 are in its (−50, 50] band
    left = spark.createDataFrame([(1, 9, -50)], "lid long, k long, t long")
    right = spark.createDataFrame(
        [(9, -49), (9, 0), (9, 50), (9, 51), (9, -50)], "k long, t long"
    )
    out = range_join_count(left, right, ["k"], "t", 100, "lid").collect()
    assert out[0]["n_in_window"] == 3  # -49, 0, 50 in band; -50 and 51 out


def test_decode_audio_rate_overflow_nulls(spark):
    import struct as st

    from xarray_histogram_spark.operators.multimodal import (
        decode_audio, encode_wav,
    )

    good = bytearray(encode_wav([1, 2], 8000))
    bad = bytearray(good)
    bad[24:28] = st.pack("<I", 4_000_000_000)  # u32 rate > int32 max
    media = spark.createDataFrame(
        [(1, "audio/wav", bytes(good)), (2, "audio/wav", bytes(bad))],
        "media_id long, media_type string, payload binary",
    )
    got = {r["media_id"]: r for r in decode_audio(media).collect()}
    assert got[1]["format"] == "wav"
    assert got[2]["format"] is None and got[2]["sample_rate"] is None


def test_funnel_conversion_semantics(spark):
    from xarray_histogram_spark.operators.joins import funnel_conversion

    rows = [
        # user 1: full ordered funnel within window
        (1, 0, "signup"), (1, 5, "click"), (1, 9, "purchase"),
        # user 2: purchase BEFORE the click-after-signup -> not converted
        (2, 0, "signup"), (2, 8, "click"), (2, 3, "purchase"),
        # user 3: converted but outside the window
        (3, 0, "signup"), (3, 1, "click"), (3, 50, "purchase"),
        # user 4: click before signup doesn't count; later click does
        (4, 0, "click"), (4, 2, "signup"), (4, 7, "click"), (4, 8, "purchase"),
        # user 5: no signup -> all stages NULL
        (5, 1, "click"), (5, 2, "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, t long, event_type string")
    out = {
        r["user_id"]: r
        for r in funnel_conversion(
            ev, "user_id", "t", "event_type",
            ["signup", "click", "purchase"], window=20,
        ).collect()
    }
    assert out[1]["converted"] and out[1]["t_2"] == 9
    assert not out[2]["converted"] and out[2]["t_1"] == 8 and out[2]["t_2"] is None
    assert not out[3]["converted"] and out[3]["t_2"] == 50
    assert out[4]["converted"] and out[4]["t_0"] == 2 and out[4]["t_1"] == 7
    assert not out[5]["converted"] and out[5]["t_0"] is None

    with pytest.raises(ValueError, match="stages"):
        funnel_conversion(ev, "user_id", "t", "event_type", ["signup"])
    # repeated stage names: one event would satisfy both occurrences
    with pytest.raises(ValueError, match="distinct"):
        funnel_conversion(
            ev, "user_id", "t", "event_type", ["signup", "click", "click"]
        )


def test_quantize_embeddings_semantics(spark):
    from xarray_histogram_spark.operators.similarity import quantize_embeddings

    rows = [
        (1, [1.0, -0.5, 0.25, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),   # all-zero vector: scale 0, codes 0
        (3, None),                    # NULL vector passes through
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert out[1]["codes"][0] == 127 and out[1]["codes"][1] == -64  # round(-63.5) away from 0
    assert out[1]["codes"][3] == 0
    assert abs(out[1]["scale"] - 1.0 / 127.0) < 1e-12
    # reconstruction error bounded by scale/2
    assert out[1]["max_err"] <= out[1]["scale"] / 2 + 1e-12
    assert out[2]["scale"] == 0.0 and out[2]["codes"] == [0, 0, 0, 0]
    assert out[3]["codes"] is None and out[3]["scale"] is None
    # codes are true int8 (tinyint) — the 4x compression is real
    sch = dict(quantize_embeddings(df).dtypes)
    assert sch["codes"] == "array<tinyint>"


def test_quantize_embeddings_nonfinite_and_empty(spark):
    import math

    from xarray_histogram_spark.operators.similarity import quantize_embeddings

    rows = [
        (1, [float("nan"), 0.5]),     # NaN poisons -> NULL row
        (2, [float("inf"), 0.5]),     # inf -> NULL row
        (3, []),                      # empty -> NULL row (list_sum parity)
        (4, [0.5, -0.25]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    for i in (1, 2, 3):
        assert out[i]["codes"] is None and out[i]["scale"] is None
        assert out[i]["max_err"] is None
    assert out[4]["codes"] == [127, -64]


def test_quantize_adversarial_oracle_parity(spark, tmp_path):
    """Adversarial vectors through BOTH engines: NaN/inf elements, a NULL
    element (pandas→parquet turns NaN into NULL — Spark's exists() is
    NULL-valued there while DuckDB's list_bool_or ignores NULLs, the exact
    divergence the guards pin), empty and NULL vectors."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from xarray_histogram_spark.operators.similarity import (
        quantize_embeddings, quantize_summary_sql,
    )

    from .util import assert_matches_sql

    pdf = pd.DataFrame({
        "vec_id": [1, 2, 3, 4, 5],
        "embedding": [[np.nan, 0.5], [np.inf, 0.5], [], [0.5, -0.25], None],
    })
    path = str(tmp_path / "emb.parquet")
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=pa.schema(
            [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
        )),
        path,
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embx AS SELECT * FROM read_parquet('{path}')")
    q = quantize_embeddings(spark.read.parquet(path))
    sdf = q.select(
        "vec_id",
        F.aggregate("codes", F.lit(0).cast("bigint"), lambda a, c: a + c)
        .alias("code_sum"),
        F.array_min("codes").cast("int").alias("code_min"),
        F.array_max("codes").cast("int").alias("code_max"),
        "scale", "max_err",
    )
    assert_matches_sql(sdf, quantize_summary_sql("embx"), con)
    # true NaN elements (written by Spark, which preserves them) also NULL
    spark.createDataFrame(
        [(10, [float("nan"), 0.5]), (11, [1.0, 0.5])],
        "vec_id long, embedding array<float>",
    ).write.mode("overwrite").parquet(str(tmp_path / "emb2"))
    got = {r["vec_id"]: r for r in quantize_embeddings(
        spark.read.parquet(str(tmp_path / "emb2"))).collect()}
    assert got[10]["codes"] is None and got[11]["codes"] is not None


def test_temporal_join_adversarial_oracle_parity(spark, tmp_path):
    """NULL-bearing events through BOTH engines for the asof and range
    join SQL mirrors (the hash gate the driver applies) — NULL keys, NULL
    timestamps, ties, and an id tie at equal ts."""
    import duckdb

    from xarray_histogram_spark.operators.joins import (
        asof_join, asof_join_sql, range_join_count, range_join_count_sql,
    )

    from .util import assert_matches_sql

    left = spark.createDataFrame(
        [(1, 100, 10), (2, 100, 20), (3, None, 20), (4, 200, 5), (5, 100, None)],
        "lid long, k long, t long",
    )
    right = spark.createDataFrame(
        [(7, 100, 5, 1.0), (8, 100, 20, None), (9, 100, 20, 2.0),
         (10, None, 1, 3.0), (11, 200, None, 4.0)],
        "rid long, k long, t long, v double",
    )
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    left.write.mode("overwrite").parquet(lp)
    right.write.mode("overwrite").parquet(rp)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lft AS SELECT * FROM read_parquet('{lp}/*.parquet')")
    con.execute(f"CREATE VIEW rgt AS SELECT * FROM read_parquet('{rp}/*.parquet')")

    for tol in (None, 10):
        sdf = asof_join(left, right, ["k"], "t", ["v"], "rid", tolerance=tol)
        sql = asof_join_sql(
            "SELECT lid, k, t FROM lft", "SELECT rid, k, t, v FROM rgt",
            ["k"], "t", ["v"], "rid", tolerance=tol,
        )
        assert_matches_sql(sdf, sql, con)

    sdf = range_join_count(
        left.select("lid", "k", "t").where("t IS NOT NULL AND k IS NOT NULL"),
        right.select("k", "t"), ["k"], "t", 15, "lid",
    )
    sql = range_join_count_sql(
        "SELECT lid, k, t FROM lft WHERE t IS NOT NULL AND k IS NOT NULL",
        "SELECT k, t FROM rgt", ["k"], "t", 15, "lid",
    )
    assert_matches_sql(sdf, sql, con)


def test_dup_ngram_adversarial_oracle_parity(spark, tmp_path):
    """NULL/short/whitespace-heavy docs through both dup_ngram mirrors."""
    import duckdb

    from xarray_histogram_spark.operators.text import (
        dup_ngram_stats, dup_ngram_stats_sql,
    )

    from .util import assert_matches_sql

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c x"), (3, None), (4, "a b"), (5, ""),
         (6, "a\tb\nc  d"), (7, "A B C D")],   # tokenizer lowercases
        "doc_id long, text string",
    )
    p = str(tmp_path / "docs")
    docs.write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW dx AS SELECT * FROM read_parquet('{p}/*.parquet')")
    assert_matches_sql(
        dup_ngram_stats(docs, "text", "doc_id", n=3),
        dup_ngram_stats_sql("dx", "text", "doc_id", n=3),
        con,
    )


def test_kmeans_adversarial_oracle_parity(spark, tmp_path):
    """NULL, zero-norm, and NaN vectors in the clustering corpus: both
    engines exclude non-clusterable vectors identically (ANSI Spark would
    otherwise DIVIDE_BY_ZERO on a zero norm; DuckDB sorts NaN sims above
    every real similarity)."""
    import duckdb

    from xarray_histogram_spark.operators.similarity import (
        kmeans_refine, kmeans_refine_sql,
    )

    from .util import assert_matches_sql

    rows = [
        (i, [float((i * 7 + j) % 5) - 2.0 for j in range(4)])
        for i in range(40)
    ]
    rows[13] = (13, None)
    rows[17] = (17, [0.0, 0.0, 0.0, 0.0])
    rows[23] = (23, [float("nan"), 1.0, 1.0, 1.0])
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    d = str(tmp_path / "embk")
    df.write.mode("overwrite").parquet(d)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embk AS SELECT * FROM read_parquet('{d}/*.parquet')")
    assert_matches_sql(
        kmeans_refine(spark.read.parquet(d), k=4, n_iter=2, n_hint=40, dim=4),
        kmeans_refine_sql("embk", k=4, n_iter=2, n_hint=40, dim=4),
        con,
    )


def test_cosine_zero_norm_does_not_crash(spark, tmp_path):
    """A zero-norm or NULL vector in the corpus must not kill the job
    (ANSI DIVIDE_BY_ZERO) and must simply drop out of top-k on BOTH
    engines (NULL sims lose desc orderings)."""
    import duckdb

    from xarray_histogram_spark.operators.similarity import (
        cosine_topk, cosine_topk_sql,
    )

    from .util import assert_matches_sql

    rows = [(i, [float((i + j) % 3) + 0.5 for j in range(4)]) for i in range(10)]
    rows[3] = (3, [0.0, 0.0, 0.0, 0.0])
    rows[7] = (7, None)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    p = str(tmp_path / "embz")
    df.write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embz AS SELECT * FROM read_parquet('{p}/*.parquet')")
    out = cosine_topk(spark.read.parquet(p), query_id=0, k=5)
    got = [r["vec_id"] for r in out.collect()]
    assert 3 not in got and 7 not in got and len(got) == 5
    assert_matches_sql(out, cosine_topk_sql("embz", query_id=0, k=5), con)


def test_cosine_nan_vector_drops_out(spark, tmp_path):
    """A NaN-element vector must NOT rank #1 (NaN sorts above every real
    sim in desc on BOTH engines): total cosine NULLs non-finite sims, so
    the corrupt vector drops out of top-k and of threshold dedup pairs,
    identically on both engines."""
    import duckdb

    from xarray_histogram_spark.operators.similarity import (
        cosine_topk, cosine_topk_sql, embed_dup_pairs, embed_dup_pairs_sql,
    )

    from .util import assert_matches_sql

    rows = [(i, [float((i + j) % 3) + 0.5 for j in range(4)]) for i in range(10)]
    rows[3] = (3, [float("nan"), 1.0, 1.0, 1.0])
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    p = str(tmp_path / "embn")
    df.write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embn AS SELECT * FROM read_parquet('{p}/*.parquet')")
    out = cosine_topk(spark.read.parquet(p), query_id=0, k=5)
    got = [r["vec_id"] for r in out.collect()]
    assert 3 not in got
    assert_matches_sql(out, cosine_topk_sql("embn", query_id=0, k=5), con)
    from xarray_histogram_spark.functions import vectors as V

    pairs = embed_dup_pairs(
        spark.read.parquet(p), threshold=0.95,
        planes=V.hyperplanes(4, 4, seed=42),
    )
    assert all(3 not in (r["id_a"], r["id_b"]) for r in pairs.collect())


# ---------------------------------------------------------------------------
# round-6 second batch: balanced mixture, PII scrub, URL extraction, batch ANN
# ---------------------------------------------------------------------------


def test_balanced_sample_caps_expected_group_size(spark, docs):
    from xarray_histogram_spark.operators import sampling as sp

    counts = {r[0]: r[1] for r in docs.groupBy("lang").count().collect()}
    out = sp.balanced_sample(docs, "lang", "doc_id", 100)
    got = {r[0]: r[1] for r in out.groupBy("lang").count().collect()}
    for g, n in counts.items():
        if n <= 100:
            assert got.get(g, 0) == n  # small groups kept whole
        else:
            # expected 100; the draw is uniform so allow wide slack
            # (<= n, not < n: a group barely over target can legitimately
            # keep every row under its ~n/target rate)
            assert 0 < got.get(g, 0) <= n


def test_balanced_sample_matches_manual_md5(spark, docs):
    # row membership is a pure function of md5(key) vs the exact integer
    # threshold — recompute both driver-side
    import hashlib

    from xarray_histogram_spark.operators import sampling as sp

    rows = docs.select("doc_id", "lang").collect()
    counts = {}
    for r in rows:
        counts[r.lang] = counts.get(r.lang, 0) + 1
    target = 100
    expect = set()
    for r in rows:
        n = counts[r.lang]
        if n <= target:
            expect.add(r.doc_id)
            continue
        draw = hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8]
        if draw < format(target * 16**8 // n, "08x"):
            expect.add(r.doc_id)
    got = {
        r.doc_id
        for r in sp.balanced_sample(docs, "lang", "doc_id", 100)
        .select("doc_id")
        .collect()
    }
    assert got == expect


def test_balanced_sample_null_group_and_validation(spark):
    from xarray_histogram_spark.operators import sampling as sp

    df = spark.createDataFrame(
        [(i, None if i % 2 else "g") for i in range(40)], "id INT, grp STRING"
    )
    out = sp.balanced_sample(df, "grp", "id", 5)
    # NULL keys form their own downsampled group, not a dropped one
    assert out.where(F.col("grp").isNull()).count() > 0
    with pytest.raises(ValueError):
        sp.balanced_sample(df, "grp", "id", 0)


def test_balanced_sample_max_groups_guard(spark):
    """A high-cardinality group key must raise, not silently collect one
    count row per distinct value and compile a megabyte CASE (VERDICT
    r06 'What's wrong' #2); the error points at the scalable siblings."""
    from xarray_histogram_spark.operators import sampling as sp

    df = spark.createDataFrame(
        [(i, f"dom{i}") for i in range(50)], "id INT, grp STRING"
    )
    with pytest.raises(ValueError, match="stratified_sample"):
        sp.balanced_sample(df, "grp", "id", 5, max_groups=10)
    with pytest.raises(ValueError, match=">= 1"):
        sp.balanced_sample(df, "grp", "id", 5, max_groups=0)
    # at the cap exactly: allowed (guard is > max_groups, not >=)
    few = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(30)], "id INT, grp STRING"
    )
    assert sp.balanced_sample(few, "grp", "id", 5, max_groups=3).count() > 0


def test_pii_scrub_redacts_each_class(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "ssn 123-45-6789 ok"),
            (3, "call +4915112345678 or 555-123-4567"),
            (4, "host 192.168.0.1 down"),
            (7, "pay 4111-1111-1111-1111 or 4111 1111 1111 11"),
            (8, "amex 3782 822463 10005, diners 3056-930902-5904"),
            (9, "years 1914 1918 1939 1945 list"),
            (5, None),
            (6, "plain text, no pii"),
        ],
        "doc_id INT, text STRING",
    )
    out = {r.doc_id: r for r in tx.pii_scrub(df, "text", "doc_id").collect()}
    assert out[1].n_email == 1 and "<EMAIL>" in out[1].text_scrubbed
    assert "bob" not in out[1].text_scrubbed
    assert out[2].n_ssn == 1 and "<ID>" in out[2].text_scrubbed
    assert out[3].n_phone == 2 and out[3].text_scrubbed.count("<PHONE>") == 2
    assert out[4].n_ipv4 == 1 and "<IP>" in out[4].text_scrubbed
    assert out[7].n_cc == 2 and out[7].text_scrubbed.count("<CC>") == 2
    # Amex 4-6-5 and Diners 4-6-4 groupings are covered
    assert out[8].n_cc == 2 and out[8].text_scrubbed.count("<CC>") == 2
    # year lists must NOT fire (the [3-6] first-digit anchor)
    assert out[9].n_cc == 0 and "1914" in out[9].text_scrubbed
    # NULL text propagates (never a crash, never a fake count)
    assert out[5].text_scrubbed is None and out[5].n_pii is None
    assert out[6].n_pii == 0 and out[6].text_scrubbed == "plain text, no pii"


def test_pii_scrub_luhn_unseparated_pan(spark):
    """The n_cc_raw step redacts bare PANs only when the Luhn checksum
    holds: valid Visa-16/Amex-15/Mastercard-16 forms go, an off-by-one
    check digit stays, digit runs embedded in longer runs never match
    (word boundary), and a valid PAN appearing as a SUBSTRING of a longer
    run elsewhere in the row is not clobbered by the redaction of its
    standalone twin."""
    df = spark.createDataFrame(
        [
            (1, "pan 4111111111111111 ok"),
            (2, "bad 4111111111111112 no"),
            (3, "amex 378282246310005 and mc 5500005555555559"),
            (4, "run 94111111111111111 has 17 digits"),
            (5, "twin 4111111111111111 inside 04111111111111111x"),
            (6, "short 411111111111 only 12"),
            (7, None),
        ],
        "doc_id INT, text STRING",
    )
    out = {r.doc_id: r for r in tx.pii_scrub(df, "text", "doc_id").collect()}
    assert out[1].n_cc_raw == 1 and out[1].text_scrubbed == "pan <CC> ok"
    assert out[2].n_cc_raw == 0 and "4111111111111112" in out[2].text_scrubbed
    assert out[3].n_cc_raw == 2 and out[3].text_scrubbed.count("<CC>") == 2
    assert out[4].n_cc_raw == 0 and "94111111111111111" in out[4].text_scrubbed
    assert out[5].n_cc_raw == 1
    assert out[5].text_scrubbed == "twin <CC> inside 04111111111111111x"
    assert out[6].n_cc_raw == 0 and "411111111111" in out[6].text_scrubbed
    assert out[7].n_cc_raw is None and out[7].n_pii is None


def test_gopher_rules_values(spark):
    """Each Gopher rule fires on a purpose-built document; the metric
    values are exact (integer counts / single divisions)."""
    base = "the words be to of and that have with " + "alpha beta " * 30
    rows = [
        (1, base),                                    # passes everything
        (2, "too few words"),                         # min_words
        (3, base + " ####" * 20),                     # symbol ratio
        (4, base + "\n- b one\n- b two\n- b three\n- b four\n- b five"
            + "\n- b6\n- b7\n- b8\n- b9\n- b10"),     # bullets 10/11 > 0.9
        (5, base + "\nmore...\nagain...\nyet...",),   # ellipsis 3/4 > 0.3
        (6, "zz " + "1 2 3 4 5 6 7 8 9 10 " * 10),    # alpha-word frac
        (7, None),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = {r.doc_id: r for r in
           tx.gopher_rules(df, "text", "doc_id").collect()}
    assert out[1].keep is True
    assert out[1].n_required == 8
    assert out[2].keep is False and out[2].n_words == 3
    assert out[3].keep is False and out[3].symbol_ratio > 0.1
    assert out[4].frac_bullet_lines == pytest.approx(10 / 11)
    assert out[4].keep is False  # 10/11 ≈ 0.909 > max_bullet_frac=0.9
    assert out[5].keep is False
    assert out[5].frac_ellipsis_lines == pytest.approx(3 / 4)
    assert out[6].keep is False and out[6].frac_alpha_words < 0.8
    assert out[7].keep is None and out[7].n_words is None


def test_gopher_rules_crlf_mirror(spark):
    """Windows line endings: a '...\\r\\n' line must count (or not) the
    SAME way on both engines.  The ellipsis rule is a plain suffix test
    precisely because Java's '$' also matches before a trailing '\\r'
    while RE2's does not (review-found) — so the '...\\r' line does NOT
    count, on either engine, and the oracle hash agrees."""
    import duckdb
    import pandas as pd

    from .util import assert_matches_sql

    rows = [
        (1, "to be continued...\r\nnext line"),
        (2, "ends clean...\nnext"),
        (3, "- bullet\r\n- two"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"]).astype(
        {"doc_id": "int64"}
    )
    df = spark.createDataFrame(pdf, "doc_id long, text string")
    con = duckdb.connect()
    con.register("crlfdocs", pdf)
    assert_matches_sql(
        tx.gopher_rules(df, "text", "doc_id", min_words=1),
        tx.gopher_rules_sql("crlfdocs", "text", "doc_id", min_words=1),
        con,
    )
    out = {r.doc_id: r for r in
           tx.gopher_rules(df, "text", "doc_id").collect()}
    assert out[1].frac_ellipsis_lines == 0.0  # '\r' breaks the suffix
    assert out[2].frac_ellipsis_lines == 0.5
    assert out[3].frac_bullet_lines == 1.0  # '^' anchoring is CRLF-safe


def test_pii_scrub_chain_order_no_double_fire(spark):
    # digits inside an e-mail must not ALSO fire the phone/ipv4 rules:
    # later patterns run on the already-redacted text
    df = spark.createDataFrame(
        [(1, "x 12.3.4.5@host999-123-4567.example.com y")],
        "doc_id INT, text STRING",
    )
    r = tx.pii_scrub(df, "text", "doc_id").collect()[0]
    assert r.n_email == 1
    assert r.n_ipv4 == 0 and r.n_phone == 0 and r.n_ssn == 0
    assert r.n_pii == 1


def test_extract_urls_positions_and_domains(spark):
    df = spark.createDataFrame(
        [
            (1, "see https://A.Example.org/x?k=1 and http://b.net/y."),
            (2, "no links here"),
            (3, None),
        ],
        "doc_id INT, text STRING",
    )
    rows = tx.extract_urls(df, "text", "doc_id").collect()
    assert {r.doc_id for r in rows} == {1}
    by_pos = {r.pos: r for r in rows}
    assert by_pos[1].url == "https://A.Example.org/x?k=1"
    assert by_pos[1].domain == "a.example.org"  # lowercased host
    # the trailing '.' is outside the URL class only when prose follows;
    # 'b.net/y.' keeps the dot-run — assert the domain, not the tail
    assert by_pos[2].domain == "b.net"


def test_ann_topk_batch_consistent_with_single(spark, emb):
    single = {
        r.vec_id: r.cos
        for r in sim.ann_topk(emb, query_id=7, k=5).collect()
    }
    batch = {
        r.vec_id: r.cos
        for r in sim.ann_topk_batch(emb, [7], k=5).collect()
    }
    assert batch == single


def test_ann_topk_batch_recall_vs_bruteforce(spark, emb):
    """DIRECT recall@10 gate for the batch path (VERDICT r06 item 5):
    per query id, the batched ANN must hit at least as many of the exact
    brute-force top-10 as the single-query gate demands (≥5/10, same
    threshold and rationale as test_ann_recall_vs_bruteforce) — not just
    inherit it transitively through the single-path consistency test."""
    batch = {}
    for r in sim.ann_topk_batch(emb, [0, 7, 13], k=10).collect():
        batch.setdefault(r.query_id, set()).add(r.vec_id)
    for qid in (0, 7, 13):
        exact = {r["vec_id"] for r in sim.cosine_topk(emb, qid, k=10).collect()}
        assert len(exact & batch[qid]) >= 5, qid


def test_ann_topk_batch_validation(spark, emb):
    with pytest.raises(ValueError):
        sim.ann_topk_batch(emb, [])
    with pytest.raises(ValueError):
        sim.ann_topk_batch(emb, [1, 1])
    with pytest.raises(ValueError):
        sim.ann_topk_batch(emb, [0, 10_000_000])


def test_ann_topk_batch_shape(spark, emb):
    out = sim.ann_topk_batch(emb, [0, 7, 13], k=5).collect()
    per = {}
    for r in out:
        per.setdefault(r.query_id, []).append(r)
        assert r.vec_id != r.query_id  # self excluded
    assert set(per) == {0, 7, 13}
    for qid, rows in per.items():
        assert len(rows) == 5
        assert sorted(r.rk for r in rows) == [1, 2, 3, 4, 5]


def test_retention_cohorts_values(spark):
    """Expectations built from the SAME floor(epoch/86400) integer
    arithmetic as the operator — never from naive datetime.timestamp(),
    which resolves in the machine's LOCAL timezone and breaks anywhere
    east/west of UTC (review-found)."""
    from pyspark.sql import functions as _F

    from xarray_histogram_spark.operators.joins import retention_cohorts

    day = 86_400
    rows = [
        # user 1: first day 0, returns day 1 (twice, same period) and day 3
        (1, 10 * day + 9 * 3600),
        (1, 11 * day + 5 * 3600),
        (1, 11 * day + 23 * 3600),
        (1, 13 * day + 60),
        # user 2: day 11 only
        (2, 11 * day + 3600),
        # user 3: NULL ts only → contributes nothing
        (3, None),
        # NULL user: dropped, never a pseudo-user
        (None, 10 * day),
    ]
    df = spark.createDataFrame(rows, "user_id LONG, sec LONG").select(
        "user_id", _F.timestamp_seconds(_F.col("sec")).alias("ts")
    )
    out = retention_cohorts(df, "user_id", "ts", period="day")
    cells = {(r.cohort, r.offset): r.n_users for r in out.collect()}
    assert cells[(10, 0)] == 1          # user 1's cohort
    assert cells[(10, 1)] == 1          # returned next day (two events, one cell)
    assert cells[(10, 3)] == 1
    assert cells[(11, 0)] == 1          # user 2's own cohort
    assert sum(cells.values()) == 4     # NULL user contributed nothing

    import pytest as _pt

    with _pt.raises(ValueError, match="period"):
        retention_cohorts(df, "user_id", "ts", period="month")
    from xarray_histogram_spark.operators.joins import retention_cohorts_sql

    with _pt.raises(ValueError, match="period"):
        retention_cohorts_sql("events", "user_id", "ts", period="month")


def test_corpus_report_values(spark):
    """Report aggregates are exact on a hand-built corpus: volumes,
    Gopher keep counts, PII incidence (docs vs spans), quality envelope;
    NULL text contributes zero PII docs and is excluded from MIN/MAX."""
    from xarray_histogram_spark.operators.curate import corpus_report

    good = "the words be to of and that have with " + "alpha beta " * 30
    rows = [
        (1, "a", good),
        (2, "a", "mail x@y.example.org and 10.0.0.1 plus 10.0.0.2"),
        (3, "a", None),
        (4, "b", "tiny"),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, source STRING, text STRING")
    out = {r.source: r for r in
           corpus_report(df, "text", "doc_id", "source").collect()}
    a, b = out["a"], out["b"]
    assert a.n_docs == 3 and b.n_docs == 1
    assert a.sum_tokens == 69 + 6  # good(9+60) + pii doc; NULL adds nothing
    assert a.n_gopher_keep == 1  # only the good doc passes
    assert a.n_docs_with_pii == 1 and a.n_pii_spans == 3  # email + 2 IPs
    assert a.min_quality is not None and a.max_quality >= a.min_quality
    assert b.n_gopher_keep == 0 and b.n_pii_spans == 0
    with pytest.raises(ValueError, match="collides"):
        corpus_report(df, "text", "doc_id", "n_docs")


def test_corpus_report_duplicate_and_null_ids(spark):
    """The ingest report runs on PRE-dedup corpora: duplicate and NULL
    doc ids must not fan out the oracle's composed-mirror joins (keyed
    on a synthesized materialized row number) or drop rows — both
    engines count every physical row once (review-found)."""
    import duckdb
    import pandas as pd

    from xarray_histogram_spark.operators.curate import (
        corpus_report, corpus_report_sql,
    )

    from .util import assert_matches_sql

    rows = [
        (1, "a", "the be to of words here now"),
        (1, "a", "duplicate id different text body"),
        (1, "a", "duplicate id different text body"),  # full dup row
        (None, "a", "null id row still counts once"),
        (2, "b", "mail x@y.example.org ok"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id LONG, source STRING, text STRING"
    )
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "text"]).astype(
        {"doc_id": "Int64"}
    )
    con = duckdb.connect()
    con.register("dupdocs", pdf)
    assert_matches_sql(
        corpus_report(df, "text", "doc_id", "source", min_words=3),
        corpus_report_sql("dupdocs", "text", "doc_id", "source", min_words=3),
        con,
    )
    out = {r.source: r for r in
           corpus_report(df, "text", "doc_id", "source").collect()}
    assert out["a"].n_docs == 4 and out["b"].n_docs == 1


def test_corpus_report_reserved_group_col(spark):
    """Group columns shadowing output OR intermediate feature names get
    the clear ValueError, not an AMBIGUOUS_REFERENCE analysis error
    (review-found); the SQL builder applies the same guard."""
    from xarray_histogram_spark.operators.curate import (
        corpus_report, corpus_report_sql,
    )

    df = spark.createDataFrame(
        [(1, True, "words here")], "doc_id INT, keep BOOLEAN, text STRING"
    )
    for bad in ("keep", "n_tokens", "quality", "n_pii", "n_docs"):
        with pytest.raises(ValueError, match="collides"):
            corpus_report(df, "text", "doc_id", bad)
        with pytest.raises(ValueError, match="collides"):
            corpus_report_sql("t", "text", "doc_id", bad)


def test_filter_top_fraction_semantics(spark):
    """Exact top-fraction pruning: scores 0..99 with keep 1/4 keeps
    the 26 rows with score >= the rank-74 value (the rank floor rounds
    toward keeping — documented); ties at the threshold all stay;
    NULL/NaN always drop (even at keep-all); a degenerate all-equal
    column keeps everything; guards raise."""
    from xarray_histogram_spark.operators import sampling as sp

    rows = [(i, float(i)) for i in range(100)]
    rows += [(100, None), (101, float("nan"))]
    df = spark.createDataFrame(rows, "doc_id INT, score DOUBLE")
    kept = {r.doc_id for r in
            sp.filter_top_fraction(df, "score", 1, 4).collect()}
    # c=100, rank = (99*3)//4 = 74 → threshold 74.0 → 26 rows kept
    assert kept == set(range(74, 100))
    # ties: 10 zeros + 10 ones, keep half → rank (19*1)//2 = 9 → thr 0.0
    # → ALL rows stay (every score >= 0.0)
    tdf = spark.createDataFrame(
        [(i, float(i // 10)) for i in range(20)], "doc_id INT, score DOUBLE"
    )
    assert sp.filter_top_fraction(tdf, "score", 1, 2).count() == 20
    # keep-all drops only NULL/NaN
    assert sp.filter_top_fraction(df, "score", 4, 4).count() == 100
    # degenerate all-equal
    edf = spark.createDataFrame([(i, 5.0) for i in range(7)],
                                "doc_id INT, score DOUBLE")
    assert sp.filter_top_fraction(edf, "score", 1, 3).count() == 7
    with pytest.raises(ValueError, match="keep_num"):
        sp.filter_top_fraction(df, "score", 0, 4)
    with pytest.raises(ValueError, match="keep_num"):
        sp.filter_top_fraction(df, "score", 5, 4)
    null_df = spark.createDataFrame(
        [(1, None)], "doc_id INT, score DOUBLE"
    )
    with pytest.raises(ValueError, match="no non-NULL"):
        sp.filter_top_fraction(null_df, "score", 1, 2)


def test_filter_top_fraction_oracle_ties_and_nulls(spark, tmp_path):
    """Mirror agreement on a hostile distribution: heavy ties around the
    threshold, NULLs, NaNs, negative scores."""
    import duckdb

    from xarray_histogram_spark.operators import sampling as sp

    from .util import assert_matches_sql

    rows = [(i, float(i % 7) - 3.0) for i in range(200)]
    rows += [(200, None), (201, float("nan")), (202, None)]
    df = spark.createDataFrame(rows, "doc_id INT, score DOUBLE")
    p = str(tmp_path / "scores.parquet")
    df.coalesce(1).write.parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW scores AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    for num, den in ((1, 4), (1, 2), (2, 3), (9, 10)):
        assert_matches_sql(
            sp.filter_top_fraction(df, "score", num, den)
            .select("doc_id", "score"),
            sp.filter_top_fraction_sql(
                "scores", ["doc_id", "score"], "score", num, den
            ),
            con,
        )


def test_incremental_dedup_verdicts(spark, docs):
    """Shard-vs-keeper semantics: exact copies and near-dups of kept docs
    are dup_of_kept (kept_match = MIN matching kept id); a new doc
    near-duplicating a SURVIVING lower-id new doc is dup_within_new; a
    new doc whose only lower-id near-dup was itself killed by the kept
    check is NOT dup_within_new (the survivor rule)."""
    rows = docs.limit(2).collect()
    t_txt, u_txt = rows[0]["text"], rows[1]["text"]
    v_txt = u_txt[::-1] + " unique shard document body"
    kept = spark.createDataFrame(
        [(1, t_txt), (2, u_txt)], "doc_id: long, text: string"
    )
    new = spark.createDataFrame(
        [
            (10, t_txt),            # exact copy of kept 1
            (11, v_txt),            # unique -> keep
            (12, v_txt + " tail"),  # near-dup of surviving 11
            (13, t_txt + " tail"),  # near-dup of kept 1 AND of new 10
        ],
        "doc_id: long, text: string",
    )
    r = {x["doc_id"]: x for x in
         dd.incremental_dedup(new, kept, "text", "doc_id").collect()}
    assert len(r) == 4
    assert r[10]["dup_of_kept"] and r[10]["kept_match"] == 1
    assert not r[11]["dup_of_kept"] and not r[11]["dup_within_new"]
    assert r[11]["keep"]
    assert r[12]["dup_within_new"] and not r[12]["dup_of_kept"]
    assert not r[12]["keep"]
    # 13 duplicates kept 1; its lower-id nn partner 10 is itself
    # dup_of_kept, so the survivor rule leaves dup_within_new false
    assert r[13]["dup_of_kept"] and r[13]["kept_match"] == 1
    assert not r[13]["dup_within_new"]
    assert not r[13]["keep"]


def test_incremental_dedup_kept_bands_reuse(spark, docs):
    """Passing a precomputed band_rows index must give identical verdicts
    to recomputing from kept text — the persisted-index path a 100 TB
    keeper corpus uses per shard."""
    kept = docs.where(F.col("doc_id") % 4 != 3).select("doc_id", "text")
    new = docs.where(F.col("doc_id") % 4 == 3).select("doc_id", "text")
    idx = dd.band_rows(kept, "text", "doc_id")
    a = dd.incremental_dedup(new, kept, "text", "doc_id").collect()
    b = dd.incremental_dedup(
        new, kept, "text", "doc_id", kept_bands=idx
    ).collect()
    key = lambda r: r["doc_id"]
    assert sorted(a, key=key) == sorted(b, key=key)


def test_incremental_dedup_null_text(spark):
    """NULL-text docs never band (no fake NULL bucket) and always keep."""
    kept = spark.createDataFrame(
        [(1, None), (2, "some kept document text")],
        "doc_id: long, text: string",
    )
    new = spark.createDataFrame(
        [(10, None), (11, "totally different shard text")],
        "doc_id: long, text: string",
    )
    r = {x["doc_id"]: x for x in
         dd.incremental_dedup(new, kept, "text", "doc_id").collect()}
    assert r[10]["keep"] and not r[10]["dup_of_kept"]
    assert r[11]["keep"]


def test_report_gopher_defaults_in_sync():
    """curate._GOPHER_DEFAULTS duplicates gopher_cols' keyword defaults
    so the per-rule breakdown never perturbs the driver-verified
    gopher_cols path — this pin makes a drift in EITHER a test failure."""
    import inspect

    from xarray_histogram_spark.operators.curate import (
        _GOPHER_DEFAULTS, _RULE_FAILS,
    )

    sig = inspect.signature(tx.gopher_cols)
    actual = {
        n: p.default for n, p in sig.parameters.items()
        if p.default is not inspect.Parameter.empty
        and n != "metrics"  # expression plumbing, not a threshold
    }
    assert actual == _GOPHER_DEFAULTS
    # every threshold is consumed by exactly one fail rule
    assert sorted(k for _, _, _, k in _RULE_FAILS) == sorted(_GOPHER_DEFAULTS)


def test_corpus_report_per_rule_fails(spark):
    """Each n_fail_<rule> counts exactly the docs whose metric violates
    that rule; a doc failing several rules is counted once per rule;
    NULL text fails no individual rule."""
    from xarray_histogram_spark.operators.curate import corpus_report

    good = "the words be to of and that have with " + "alpha beta " * 30
    rows = [
        (1, "a", good),                            # passes everything
        (2, "a", "tiny text"),                     # min_words + required
        (3, "a", None),                            # NULL: fails nothing
        (4, "a", ("- the be to of list item words here\n" * 5)
                 + ("extraordinarily " * 60)),     # all-bullet lines
        (5, "b", "# ## ### " * 30 + "the of and be to words"),  # symbols
    ]
    df = spark.createDataFrame(rows, "doc_id INT, source STRING, text STRING")
    out = {r.source: r for r in
           corpus_report(df, "text", "doc_id", "source",
                         max_bullet_frac=0.5).collect()}
    a, b = out["a"], out["b"]
    assert a.n_fail_min_words == 1          # doc 2 only
    assert a.n_fail_required_words == 1     # doc 2 only
    assert a.n_fail_bullet_lines == 1       # doc 4 (5/6 lines > 0.5)
    assert a.n_fail_max_words == 0 and a.n_fail_max_word_len == 0
    assert b.n_fail_symbol_ratio == 1       # doc 5
    # keep consistency: failing any rule excludes from n_gopher_keep
    assert a.n_gopher_keep == 1 and b.n_gopher_keep == 0


def test_incremental_dedup_band_cap(spark, docs):
    """max_kept_per_band drops degenerate kept band keys: with a cap of 1
    and three identical kept docs, their shared band keys are dropped, so
    an identical new doc is no longer flagged dup_of_kept; without the
    cap it is."""
    base = docs.limit(1).collect()[0]["text"]
    kept = spark.createDataFrame(
        [(1, base), (2, base), (3, base)], "doc_id: long, text: string"
    )
    new = spark.createDataFrame([(10, base)], "doc_id: long, text: string")
    uncapped = dd.incremental_dedup(new, kept, "text", "doc_id").collect()
    assert uncapped[0]["dup_of_kept"] and uncapped[0]["kept_match"] == 1
    capped = dd.incremental_dedup(
        new, kept, "text", "doc_id", max_kept_per_band=1
    ).collect()
    assert not capped[0]["dup_of_kept"] and capped[0]["keep"]


def test_lsh_null_text_no_fake_bucket(spark, docs):
    """Review-found latent divergence: NULL-text docs must emit NO band
    rows, so two NULL-text docs never pair (the oracle's NULL band keys
    never join; the old concat_ws path keyed them all to '')."""
    extra = spark.createDataFrame(
        [(9000001, None), (9000002, None), (9000003, None)],
        "doc_id: long, text: string",
    )
    both = docs.select("doc_id", "text").unionByName(extra)
    pairs = dd.lsh_candidate_pairs(both, "text", "doc_id")
    assert pairs.where(F.col("id_a") >= 9000001).count() == 0
    assert dd.band_rows(extra, "text", "doc_id").count() == 0


def test_band_rows_k_mismatch_guard(spark, docs, tmp_path):
    """A persisted band index built with a different shingle width must
    be REFUSED (silently matching nothing would contaminate the corpus);
    the shingle_k column metadata survives the parquet round-trip."""
    kept = docs.limit(20).select("doc_id", "text")
    new = docs.limit(5).select("doc_id", "text")
    idx = dd.band_rows(kept, "text", "doc_id", k=12)
    p = str(tmp_path / "bands")
    idx.write.parquet(p)
    loaded = spark.read.parquet(p)
    with pytest.raises(ValueError, match="k=12"):
        dd.incremental_dedup(new, kept, "text", "doc_id", kept_bands=loaded)
    # matching k passes (and equals the recompute path)
    ok = dd.incremental_dedup(
        new, kept, "text", "doc_id", k=12, kept_bands=loaded
    ).collect()
    assert len(ok) == 5
    # an index WITHOUT the stamp is refused too: a metadata-dropping
    # round-trip is indistinguishable from a mismatched k (review-found)
    unstamped = loaded.select(
        "doc_id", "bi", F.col("bk").cast("string").alias("bk")
    )
    with pytest.raises(ValueError, match="shingle_k"):
        dd.incremental_dedup(
            new, kept, "text", "doc_id", k=12, kept_bands=unstamped
        )
    with pytest.raises(ValueError, match="band_rows index"):
        dd.incremental_dedup(
            new, kept, "text", "doc_id", kept_bands=new.select("doc_id")
        )


def test_chunk_windows_semantics(spark):
    """Windows start at stride multiples and STOP at the first window
    reaching the document end (no fully-contained trailing windows —
    advice-found duplicate-content fix), clamp at the end, preserve
    case, normalize whitespace; consecutive windows share chunk-stride
    tokens; stride > chunk keeps its sampling gaps; NULL/empty/
    whitespace docs emit nothing; bad params raise."""
    df = spark.createDataFrame(
        [
            (1, "A b c d e f g"),       # 7 tokens
            (2, None),
            (3, ""),
            (4, " \t\n "),
            (5, "only"),
            (6, "a b c d e f g h"),     # 8 tokens: last window exact-end
        ],
        "doc_id: long, text: string",
    )
    rows = tx.chunk_windows(df, "text", "doc_id", 4, 2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 5, 6}
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    # start 6 would be 'g' fully contained in 'e f g' - not emitted
    assert [r["chunk_text"] for r in c1] == [
        "A b c d", "c d e f", "e f g",
    ]
    assert [r["n_chunk_tokens"] for r in c1] == [4, 4, 3]
    # overlap: each window shares chunk-stride=2 tokens with the previous
    assert c1[0]["chunk_text"].split()[2:] == c1[1]["chunk_text"].split()[:2]
    assert by_doc[5][0]["chunk_text"] == "only"
    c6 = sorted(by_doc[6], key=lambda r: r["chunk_id"])
    # window 4-7 ends exactly at the doc end; starts 6 is not emitted
    assert [r["chunk_text"] for r in c6] == [
        "a b c d", "c d e f", "e f g h",
    ]
    # sampling-gap regime (stride > chunk) is unchanged: starts stay
    # below n_tokens, gaps remain
    g = sorted(
        tx.chunk_windows(df, "text", "doc_id", 2, 5).collect(),
        key=lambda r: (r["doc_id"], r["chunk_id"]),
    )
    assert [(r["doc_id"], r["chunk_text"]) for r in g] == [
        (1, "A b"), (1, "f g"), (5, "only"), (6, "a b"), (6, "f g"),
    ]
    with pytest.raises(ValueError):
        tx.chunk_windows(df, "text", "doc_id", 0, 2)
    with pytest.raises(ValueError):
        tx.chunk_windows_sql("documents", "text", "doc_id", 4, 0)


def test_bpe_pair_counts_semantics(spark):
    """Known corpus -> known pair counts: pairs stay within pieces,
    whitespace contributes nothing, the empty table counts character
    pairs, merged tokens pair as units, NULL/empty docs are ignored,
    and bad tables raise on both engines."""
    df = spark.createDataFrame(
        [(1, "the the"), (2, "ab cd"), (3, None), (4, "  "), (5, "x")],
        "doc_id: long, text: string",
    )
    step0 = {
        (r["pair_left"], r["pair_right"]): r["cnt"]
        for r in tx.bpe_pair_counts(df, "text", ()).collect()
    }
    # 'the' twice -> (t,h) and (h,e) twice each; no cross-piece or
    # cross-space pairs; 1-char pieces ('x') contribute nothing
    assert step0 == {("t", "h"): 2, ("h", "e"): 2,
                     ("a", "b"): 1, ("c", "d"): 1}
    merged = {
        (r["pair_left"], r["pair_right"]): r["cnt"]
        for r in tx.bpe_pair_counts(df, "text", (("t", "h"),)).collect()
    }
    # after (t,h): state of 'the' is [th, e] -> pair (th, e)
    assert merged == {("th", "e"): 2, ("a", "b"): 1, ("c", "d"): 1}
    with pytest.raises(ValueError):
        tx.bpe_pair_counts(df, "text", [("a", "")])
    with pytest.raises(ValueError):
        tx.bpe_pair_counts_sql("documents", "text", [("a\x1f", "b")])


def test_learn_bpe_merges_deterministic(spark):
    """The learned table is the greedy (cnt DESC, left, right) argmax
    sequence, is closure-ordered by construction, stops when no pair
    repeats, and seeds from a given table."""
    df = spark.createDataFrame(
        [(1, "aaab aaab"), (2, "aaab")],
        "doc_id: long, text: string",
    )
    # step0 pairs: (a,a) x6, (a,b) x3 -> merge (a,a)
    # then state a|ab? no: [aa, a, b] -> pairs (aa,a) x3, (a,b) x3
    #   -> tie on cnt, (a,b) < (aa,a) lexicographically -> (a,b)
    # then [aa, ab] -> (aa, ab) x3 -> merge (aa, ab)
    # then single-token pieces -> stop
    got = tx.learn_bpe_merges(df, "text", 10)
    assert got == [("a", "a"), ("a", "b"), ("aa", "ab")]
    # seeding: given merges are returned as the prefix
    seeded = tx.learn_bpe_merges(df, "text", 1, merges=(("a", "a"),))
    assert seeded == [("a", "a"), ("a", "b")]
    assert tx.learn_bpe_merges(df, "text", 0) == []
    with pytest.raises(ValueError):
        tx.learn_bpe_merges(df, "text", -1)
    # the learned table is consumable by the encoder (closure-ordered)
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in tx.bpe_token_count(df, "text", "doc_id", got).collect()
    }
    assert counts == {1: 2, 2: 1}


def _vecs_by_id(emb, ids):
    rows = emb.where(F.col("vec_id").isin(*ids)).collect()
    return {r["vec_id"]: list(r["embedding"]) for r in rows}


def test_embed_incremental_verdicts(spark, emb):
    """Shard-vs-keeper semantics on embeddings: a copy of a kept vector
    is dup_of_kept (kept_match = MIN matching kept id); a copy of a
    SURVIVING lower-id new vector is dup_within_new; a copy of a new
    vector that was itself killed by the kept check is NOT
    dup_within_new (the survivor rule)."""
    v = _vecs_by_id(emb, [0, 1, 2])
    kept = spark.createDataFrame(
        [(1, v[0]), (2, v[1])], "vec_id: long, embedding: array<float>"
    )
    new = spark.createDataFrame(
        [
            (10, v[0]),   # copy of kept 1 -> dup_of_kept
            (11, v[2]),   # independent -> keep (0.95 threshold)
            (12, v[2]),   # copy of surviving 11 -> dup_within_new
            (13, v[0]),   # dup of kept 1 AND of new 10 -> survivor rule
        ],
        "vec_id: long, embedding: array<float>",
    )
    r = {x["vec_id"]: x
         for x in dd.embed_incremental(new, kept, 0.95).collect()}
    assert len(r) == 4
    assert r[10]["dup_of_kept"] and r[10]["kept_match"] == 1
    assert r[11]["keep"] and not r[11]["dup_of_kept"]
    assert not r[11]["dup_within_new"]
    assert r[12]["dup_within_new"] and not r[12]["dup_of_kept"]
    assert not r[12]["keep"]
    # 13's lower-id nn partner 10 is itself dup_of_kept -> not counted
    assert r[13]["dup_of_kept"] and r[13]["kept_match"] == 1
    assert not r[13]["dup_within_new"] and not r[13]["keep"]


def test_embed_incremental_index_reuse_and_guards(spark, emb):
    """The persisted planes-stamped embed_index path gives identical
    verdicts to recomputing from kept vectors (incl. the
    partitionBy(bucket) parquet metadata round-trip); a stamp-less or
    differently-bucketized index is REFUSED; the degenerate-bucket
    guard at a non-binding cap changes nothing."""
    import shutil
    import tempfile

    from xarray_histogram_spark.operators import similarity as sim

    new = emb.where(F.col("vec_id") % 5 == 2).select("vec_id", "embedding")
    kept = emb.where(F.col("vec_id") % 5 != 2).select("vec_id", "embedding")
    a = sorted(
        dd.embed_incremental(new, kept, 0.35).collect(),
        key=lambda r: r["vec_id"],
    )
    path = tempfile.mkdtemp(prefix="xhs_embidx_test_")
    try:
        dd.embed_index(kept).write.mode("overwrite").partitionBy(
            "bucket"
        ).parquet(path)
        idx = spark.read.parquet(path)
        assert idx.schema["embedding"].metadata["lsh_planes_fp"]
        b = sorted(
            dd.embed_incremental(
                new, None, 0.35, kept_index=idx
            ).collect(),
            key=lambda r: r["vec_id"],
        )
        assert a == b
        # non-vacuous at every SF: both verdicts must be reachable
        assert any(r["dup_of_kept"] for r in a)
        assert any(r["keep"] for r in a)
        with pytest.raises(ValueError, match="DIFFERENT hyperplanes"):
            dd.embed_incremental(
                new, None, 0.35, kept_index=idx, planes=sim.ANN_PLANES
            )
        with pytest.raises(ValueError, match="lsh_planes_fp"):
            dd.embed_incremental(
                new, None, 0.35,
                kept_index=sim.with_lsh_bucket(kept),
            )
        with pytest.raises(ValueError, match="embed_index frame"):
            dd.embed_incremental(
                new, None, 0.35, kept_index=kept.select("vec_id")
            )
        c = sorted(
            dd.embed_incremental(
                new, kept, 0.35, max_kept_per_bucket=10**9
            ).collect(),
            key=lambda r: r["vec_id"],
        )
        assert a == c
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_embed_incremental_max_kept_per_bucket_binds(spark, emb):
    """A cap of 0 drops every kept bucket: nothing can be dup_of_kept,
    and the within-shard verdicts become those of a kept-free check."""
    new = emb.where(F.col("vec_id") % 5 == 2).select("vec_id", "embedding")
    kept = emb.where(F.col("vec_id") % 5 != 2).select("vec_id", "embedding")
    r = dd.embed_incremental(
        new, kept, 0.35, max_kept_per_bucket=0
    ).collect()
    assert not any(x["dup_of_kept"] for x in r)
    assert all(x["kept_match"] is None for x in r)


def test_chunk_dedup_semantics(spark):
    """Identical docs share every chunk (keep only the lexicographically
    first (doc, chunk) copy); identical chunk text across DIFFERENT
    windows of one doc also groups; unique chunks keep; n_dups counts
    corpus-wide copies of the text."""
    body = " ".join(f"w{i}" for i in range(6))   # 6 tokens
    df = spark.createDataFrame(
        [
            (1, body),          # chunks (chunk=4, stride=2): w0..w3, w2..w5
            (2, body),          # exact copy of doc 1
            (3, "x y z"),       # unique single chunk
        ],
        "doc_id: long, text: string",
    )
    r = {(x["doc_id"], x["chunk_id"]): x
         for x in dd.chunk_dedup(df, "text", "doc_id", 4, 2).collect()}
    assert len(r) == 5
    assert r[(1, 0)]["keep"] and r[(1, 0)]["n_dups"] == 2
    assert r[(1, 1)]["keep"] and r[(1, 1)]["n_dups"] == 2
    assert not r[(2, 0)]["keep"] and not r[(2, 1)]["keep"]
    assert r[(2, 0)]["chunk_md5"] == r[(1, 0)]["chunk_md5"]
    assert r[(3, 0)]["keep"] and r[(3, 0)]["n_dups"] == 1
    # within-doc duplicate chunk text: stride == chunk, repeated halves
    rep = spark.createDataFrame(
        [(7, "a b a b")], "doc_id: long, text: string"
    )
    rr = {x["chunk_id"]: x
          for x in dd.chunk_dedup(rep, "text", "doc_id", 2, 2).collect()}
    assert rr[0]["keep"] and not rr[1]["keep"] and rr[1]["n_dups"] == 2


def test_chunk_dedup_uid_overflow_guard(spark):
    """A chunk_id at/above max_chunks_per_doc must raise, not silently
    collide into the next doc's uid range."""
    from pyspark.errors import PySparkRuntimeError, SparkRuntimeException

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(12)))],
        "doc_id: long, text: string",
    )
    with pytest.raises((PySparkRuntimeError, SparkRuntimeException),
                       match="max_chunks_per_doc"):
        dd.chunk_dedup(
            df, "text", "doc_id", 2, 2, max_chunks_per_doc=3
        ).collect()


def test_chunk_near_pairs_semantics(spark):
    """A lightly-edited copy of a chunk (exact-md5 misses it) surfaces
    as a near pair; uids unpack to (doc, chunk)."""
    base = " ".join(f"tok{i}" for i in range(16))
    edited = base.replace("tok7", "tok7x")
    df = spark.createDataFrame(
        [(1, base), (2, edited), (3, "entirely different words here")],
        "doc_id: long, text: string",
    )
    k = 1 << 20
    pairs = dd.chunk_near_pairs(
        df, "text", "doc_id", 16, 16, k=4
    ).collect()
    ids = {(r["uid_a"] // k, r["uid_a"] % k, r["uid_b"] // k,
            r["uid_b"] % k) for r in pairs}
    assert (1, 0, 2, 0) in ids
    assert all(r["uid_a"] < r["uid_b"] for r in pairs)
    jac = {(r["uid_a"] // k, r["uid_b"] // k): r["jaccard"]
           for r in pairs}
    assert jac[(1, 2)] > 0.7


def test_chunk_near_keep_semantics(spark):
    """Keep-first-occurrence at chunk granularity: the lightly-edited
    copy (higher doc id) drops, the original keeps, the unrelated doc
    keeps; materialize=True agrees bit-for-bit."""
    base = " ".join(f"tok{i}" for i in range(16))
    edited = base.replace("tok7", "tok7x")
    df = spark.createDataFrame(
        [(1, base), (2, edited), (3, "entirely different words here")],
        "doc_id: long, text: string",
    )
    got = {
        (r["doc_id"], r["chunk_id"]): r["keep"]
        for r in dd.chunk_near_keep(
            df, "text", "doc_id", 16, 16, k=4, threshold=0.7
        ).collect()
    }
    assert got == {(1, 0): True, (2, 0): False, (3, 0): True}
    mat = {
        (r["doc_id"], r["chunk_id"]): r["keep"]
        for r in dd.chunk_near_keep(
            df, "text", "doc_id", 16, 16, k=4, threshold=0.7,
            materialize=True,
        ).collect()
    }
    assert mat == got
    # the shared pre-chunked path (a shard loop's zero-retokenize shape)
    from xarray_histogram_spark.operators.text import chunk_windows

    pre = {
        (r["doc_id"], r["chunk_id"]): r["keep"]
        for r in dd.chunk_near_keep(
            None, "text", "doc_id", 16, 16, k=4, threshold=0.7,
            chunks=chunk_windows(df, "text", "doc_id", 16, 16),
        ).collect()
    }
    assert pre == got
    with pytest.raises(ValueError, match="exactly one"):
        dd.chunk_near_keep(None, "text", "doc_id", 16, 16)
    # a caller-owned scratch_dir gets a unique subdir (and is NOT
    # atexit-tracked — the caller deletes it)
    import tempfile

    sd = tempfile.mkdtemp(prefix="xhs_test_scratch_")
    try:
        own_df = dd.chunk_near_keep(
            df, "text", "doc_id", 16, 16, k=4, threshold=0.7,
            materialize=True, scratch_dir=sd,
        )
        own = {
            (r["doc_id"], r["chunk_id"]): r["keep"]
            for r in own_df.collect()
        }
        assert own == got
        import os
        assert any(n.startswith("xhs_chunks_") for n in os.listdir(sd))
        assert not any(p.startswith(sd) for p in dd._CHUNK_SCRATCH)
        # the caller-owned subdirectory is surfaced on the result — the
        # deletion contract is actionable (review-found); a
        # non-materialized call carries no such attribute
        sp = own_df.xhs_scratch_path
        assert sp.startswith(sd + "/xhs_chunks_") and os.path.isdir(sp)
        assert not hasattr(
            dd.chunk_near_keep(df, "text", "doc_id", 16, 16, k=4,
                               threshold=0.7),
            "xhs_scratch_path",
        )
        # the attribute is best-effort (any transformation drops it —
        # advice-found), so the path is ALSO in the stable per-root
        # registry; trailing-slash normalization matches
        assert not hasattr(own_df.where(F.lit(True)), "xhs_scratch_path")
        assert dd.scratch_paths(sd) == [sp]
        assert dd.scratch_paths(sd + "/") == [sp]
        assert dd.scratch_paths(sd + "_nothing") == []
        # drain side (advice-found: without an acknowledgement API a
        # long-lived driver accumulates entries for paths it already
        # deleted): unknown paths are ignored, a named discard removes
        # exactly that entry, re-acknowledging is a safe no-op, and
        # nothing on the filesystem is touched
        assert dd.discard_scratch_paths(sd, ["/no/such/path"]) == []
        assert dd.scratch_paths(sd) == [sp]
        # a bare string refuses instead of matching character-wise
        # (review-found: set(str) would silently drain nothing)
        with pytest.raises(TypeError, match="bare string"):
            dd.discard_scratch_paths(sd, sp)
        assert dd.scratch_paths(sd) == [sp]
        # member paths are slash-normalized like the root itself, on
        # BOTH sides of the comparison, and pathlib members are
        # accepted (review-found: verbatim comparison silently drained
        # nothing; a Path member crashed past the guard)
        assert dd.discard_scratch_paths(sd, [sp + "/"]) == [sp]
        assert dd.scratch_paths(sd) == []
        dd._SCRATCH_PATHS[sd].append(sp + "/")
        assert dd.discard_scratch_paths(sd, [sp]) == [sp + "/"]
        from pathlib import Path

        dd._SCRATCH_PATHS[sd].append(sp)
        assert dd.discard_scratch_paths(sd, [Path(sp)]) == [sp]
        dd._SCRATCH_PATHS[sd].append(sp)
        assert dd.discard_scratch_paths(sd + "/", [sp]) == [sp]
        assert dd.scratch_paths(sd) == []
        assert dd.discard_scratch_paths(sd, [sp]) == []
        assert os.path.isdir(sp)  # bookkeeping only — files untouched
        # discard-all drains whatever is recorded, preserving order
        dd._SCRATCH_PATHS[sd] = ["p1", "p2", "p3"]
        assert dd.discard_scratch_paths(sd, ["p2"]) == ["p2"]
        assert dd.scratch_paths(sd) == ["p1", "p3"]
        assert dd.discard_scratch_paths(sd) == ["p1", "p3"]
        assert dd.scratch_paths(sd) == []
        # the drained root's (empty) list is deliberately KEPT: deleting
        # the key would orphan a list a concurrent setdefault already
        # handed to a recorder (review-found race)
        assert dd._SCRATCH_PATHS[sd] == []
    finally:
        import shutil
        shutil.rmtree(sd, ignore_errors=True)
    # above the pair's jaccard everything keeps (policy reads evidence)
    all_keep = dd.chunk_near_keep(
        df, "text", "doc_id", 16, 16, k=4, threshold=0.999
    ).where(~F.col("keep")).count()
    assert all_keep == 0


def test_chunk_near_pairs_materialize_and_chunks_paths(spark, docs):
    """The three input paths agree bit-for-bit: default (re-chunk 3×
    in-plan), materialize=True (one tokenize pass into a scratch
    parquet), and a caller-supplied pre-chunked frame.  The
    materialized plan must contain NO chunk tokenization — only scans
    of the scratch — and exactly-one-of df/chunks is enforced."""
    import pytest as _pytest
    from xarray_histogram_spark.operators.text import chunk_windows

    sub = docs.select("doc_id", "text").limit(200)
    base = dd.chunk_near_pairs(sub, "text", "doc_id", 32, 24)
    mat = dd.chunk_near_pairs(sub, "text", "doc_id", 32, 24,
                              materialize=True)
    pre = dd.chunk_near_pairs(None, "text", "doc_id", 32, 24,
                              chunks=chunk_windows(sub, "text", "doc_id",
                                                   32, 24))
    got = sorted(map(tuple, base.collect()))
    assert got == sorted(map(tuple, mat.collect()))
    assert got == sorted(map(tuple, pre.collect()))
    assert len(got) > 0
    # the materialized plan re-chunks nothing: the chunk_text assembly
    # (`array_join` of the sliced window — unique to chunk_windows; the
    # band posexplode, shingle sequence and in-bucket pair slice are
    # jaccard's own and legitimately remain) ran once at scratch-write
    # time, the pair plan only scans the scratch back
    mplan = mat._jdf.queryExecution().optimizedPlan().toString()
    assert "array_join(" not in mplan
    dplan = base._jdf.queryExecution().optimizedPlan().toString()
    assert "array_join(" in dplan
    # the local-default scratch path is surfaced on the result and is
    # one of the atexit-tracked roots; the in-plan default carries none
    import os
    assert os.path.isdir(mat.xhs_scratch_path)
    assert any(mat.xhs_scratch_path.startswith(r) for r in dd._CHUNK_SCRATCH)
    assert not hasattr(base, "xhs_scratch_path")
    with _pytest.raises(ValueError, match="exactly one"):
        dd.chunk_near_pairs(sub, "text", "doc_id", 32, 24,
                            chunks=chunk_windows(sub, "text", "doc_id",
                                                 32, 24))
    with _pytest.raises(ValueError, match="exactly one"):
        dd.chunk_near_pairs(None, "text", "doc_id", 32, 24)
    # chunks= + materialize/scratch_dir raises instead of silently
    # ignoring the flags (the embed_incremental kept-sides lesson)
    with _pytest.raises(ValueError, match="silently ignored"):
        dd.chunk_near_pairs(None, "text", "doc_id", 32, 24,
                            chunks=chunk_windows(sub, "text", "doc_id",
                                                 32, 24),
                            materialize=True)
    # eager scratch reap: roots tracked by materialize=True disappear
    # and the tracking list empties
    roots = list(dd._CHUNK_SCRATCH)
    assert roots and all(os.path.isdir(r) for r in roots)
    assert dd.clear_chunk_scratch() == len(roots)
    assert not dd._CHUNK_SCRATCH
    assert not any(os.path.isdir(r) for r in roots)


def test_linear_quality_score_shape(spark, docs):
    """The hashed-linear scorer is a PURE PROJECTION (zero Exchange, no
    Python eval) and ranks an English sentence above token noise under
    the demo weights' intended use (scores are deterministic, so the
    assertion is on determinism + shape, not on the demo table's
    arbitrary ordering)."""
    w = tx.demo_quality_weights()
    out = tx.linear_quality_score(
        docs.select("doc_id", "text").limit(50), "text", "doc_id", w
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, tx.linear_quality_score(
        docs.select("doc_id", "text").limit(50), "text", "doc_id", w
    ).collect()))
    assert a == b and len(a) == 50
    with pytest.raises(ValueError, match="2..4096"):
        tx.linear_quality_score(docs, "text", "doc_id", [0.1])


def test_mixture_weights_shape(spark, docs):
    """mixture_weights touches the corpus ONCE: one map-combined
    groupBy exchange plus the k-row single-partition window exchange —
    never a join, never a per-row Python eval."""
    from xarray_histogram_spark.operators import sampling as sp

    out = sp.mixture_weights(
        docs.select("doc_id", "source"), "source", {"src0": 1.0, "src1": 3.0}
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    rows = out.collect()
    assert len(rows) == len(set(r[0] for r in rows))  # one row per group


def test_bpe_pair_counts_one_shot_iterable(spark):
    """A generator merge table must count under the REQUESTED table, not
    silently fall back to step-0 after the length probe exhausted it
    (review-found)."""
    df = spark.createDataFrame([(1, "the the")], "doc_id: long, text: string")
    got = {
        (r["pair_left"], r["pair_right"]): r["cnt"]
        for r in tx.bpe_pair_counts(
            df, "text", iter([("t", "h")])
        ).collect()
    }
    assert got == {("th", "e"): 2}


def test_learn_bpe_merges_skips_reserved_bytes(spark):
    """A corpus carrying U+001E in punctuation runs must not teach a
    merge the encoder itself rejects (review-found: the next learning
    step would crash in _check_merges)."""
    df = spark.createDataFrame(
        [(1, "\x1e\x1e \x1e\x1e ab ab")], "doc_id: long, text: string"
    )
    got = tx.learn_bpe_merges(df, "text", 5)
    assert got == [("a", "b")]
    # and the learned table is consumable
    tx.bpe_token_count(df, "text", "doc_id", got).collect()


def test_chunk_uid_doc_id_overflow_guard(spark):
    """Snowflake-scale doc ids beyond 2^63/cap must raise, not wrap the
    bigint multiply into another doc's uid range (review-found)."""
    from pyspark.errors import PySparkRuntimeError, SparkRuntimeException

    df = spark.createDataFrame(
        [(2**60, "a b c d")], "doc_id: long, text: string"
    )
    with pytest.raises((PySparkRuntimeError, SparkRuntimeException),
                       match="uid overflow"):
        dd.chunk_dedup(df, "text", "doc_id", 2, 2).collect()
    # renumbering or lowering the cap clears it: 2^60 < 2^63/4
    assert dd.chunk_dedup(
        df, "text", "doc_id", 2, 2, max_chunks_per_doc=4
    ).count() == 2
    # abs(Long.MIN_VALUE) wraps negative — the guard must use direct
    # two-ended comparisons, or -2^63 sails through (review-found)
    dfmin = spark.createDataFrame(
        [(-(2**63), "a b c d")], "doc_id: long, text: string"
    )
    with pytest.raises((PySparkRuntimeError, SparkRuntimeException),
                       match="uid overflow"):
        dd.chunk_dedup(dfmin, "text", "doc_id", 2, 2).collect()
    # NULL doc id has no chunk identity: raise with the cause NAMED,
    # not a misleading cap complaint (review-found)
    dfnull = spark.createDataFrame(
        [(None, "a b c d")], "doc_id: long, text: string"
    )
    with pytest.raises((PySparkRuntimeError, SparkRuntimeException),
                       match="non-NULL doc id"):
        dd.chunk_dedup(dfnull, "text", "doc_id", 2, 2).collect()


def test_embed_incremental_requires_kept_side(spark, emb):
    new = emb.limit(3).select("vec_id", "embedding")
    with pytest.raises(ValueError, match="kept_df"):
        dd.embed_incremental(new, None)
    # and EXACTLY one keeper side: a stale index + fresh kept vectors
    # previously won silently on the index (advice-found)
    idx = dd.embed_index(new)
    with pytest.raises(ValueError, match="mutually exclusive"):
        dd.embed_incremental(new, new, 0.35, kept_index=idx)


def test_extend_band_index_roundtrip(spark, docs, tmp_path):
    """Closing the incremental loop: index(kept) + append(shard keepers)
    must equal band_rows(kept UNION keepers) — so shard N+1 probes see
    shard N's admissions; the shingle width comes from the stamp and a
    stampless index is refused."""
    kept = docs.where(F.col("doc_id") % 4 != 3).select("doc_id", "text")
    new = docs.where(F.col("doc_id") % 4 == 3).select("doc_id", "text")
    path = str(tmp_path / "bandidx")
    dd.band_rows(kept, "text", "doc_id").write.parquet(path)
    verdicts = dd.incremental_dedup(new, kept, "text", "doc_id")
    dd.extend_band_index(new, verdicts, path, "text", "doc_id")
    keep_ids = {r["doc_id"] for r in verdicts.where("keep").collect()}
    expected_docs = kept.unionAll(
        new.where(F.col("doc_id").isin(*keep_ids) if keep_ids else F.lit(False))
    )
    got = sorted(map(tuple, spark.read.parquet(path).collect()))
    exp = sorted(map(tuple, dd.band_rows(
        expected_docs, "text", "doc_id").collect()))
    assert got == exp and len(got) > 0
    # the stamp survives the append (read back, probe with the index)
    idx = spark.read.parquet(path)
    assert idx.schema["bk"].metadata["shingle_k"] == 8
    with pytest.raises(ValueError, match="keep"):
        dd.extend_band_index(new, verdicts.drop("keep"), path,
                             "text", "doc_id")
    bare = str(tmp_path / "bare")
    spark.read.parquet(path).withMetadata("bk", {}).write.parquet(bare)
    with pytest.raises(ValueError, match="shingle_k"):
        dd.extend_band_index(new, verdicts, bare, "text", "doc_id")
    # id-column-name mismatch refused BEFORE writing mixed-schema files
    with pytest.raises(ValueError, match="id column"):
        dd.extend_band_index(
            new.withColumnRenamed("doc_id", "uid"),
            verdicts.withColumnRenamed("doc_id", "uid"),
            path, "text", "uid",
        )


def test_extend_embed_index_roundtrip(spark, emb, tmp_path):
    """Embedding analog: extended index == embed_index(kept UNION
    keepers) with partition layout and stamp intact; wrong planes are
    refused BEFORE any write."""
    from xarray_histogram_spark.operators import similarity as sim

    kept = emb.where(F.col("vec_id") % 5 != 2).select("vec_id", "embedding")
    new = emb.where(F.col("vec_id") % 5 == 2).select("vec_id", "embedding")
    path = str(tmp_path / "embidx")
    dd.embed_index(kept).write.partitionBy("bucket").parquet(path)
    verdicts = dd.embed_incremental(new, kept, 0.35)
    dd.extend_embed_index(new, verdicts, path)
    keep_ids = {r["vec_id"] for r in verdicts.where("keep").collect()}
    assert keep_ids
    got = sorted(
        (r["vec_id"], r["bucket"], tuple(r["embedding"]))
        for r in spark.read.parquet(path).collect()
    )
    exp_docs = kept.unionAll(new.where(F.col("vec_id").isin(*keep_ids)))
    exp = sorted(
        (r["vec_id"], r["bucket"], tuple(r["embedding"]))
        for r in dd.embed_index(exp_docs).collect()
    )
    assert got == exp
    # the extended index still drives embed_incremental (stamp intact),
    # and a shard-2 EXACT COPY of a shard-1 KEEPER flags dup_of_kept —
    # the cross-shard visibility extend_embed_index exists to provide
    idx = spark.read.parquet(path)
    a_keeper = min(keep_ids)
    shard2 = new.where(F.col("vec_id") == a_keeper).select(
        F.lit(9000077).cast("long").alias("vec_id"), "embedding"
    )
    v2 = {r["vec_id"]: r for r in dd.embed_incremental(
        shard2, None, 0.35, kept_index=idx
    ).collect()}
    assert v2[9000077]["dup_of_kept"]
    assert v2[9000077]["kept_match"] == a_keeper
    with pytest.raises(ValueError, match="stamp"):
        dd.extend_embed_index(new, verdicts, path, planes=sim.ANN_PLANES)
    with pytest.raises(ValueError, match="id column"):
        dd.extend_embed_index(
            new.withColumnRenamed("vec_id", "uid"),
            verdicts.withColumnRenamed("vec_id", "uid"),
            path, id_col="uid",
        )
    # FLAT-written (stamp-valid, prune-less) index: the append must
    # match the layout, not brick it with bucket= dirs next to root
    # files (review-found)
    flat = str(tmp_path / "flatidx")
    dd.embed_index(kept).write.parquet(flat)
    dd.extend_embed_index(new, verdicts, flat)
    back = spark.read.parquet(flat)   # readable, one schema
    fgot = sorted(
        (r["vec_id"], r["bucket"], tuple(r["embedding"]))
        for r in back.collect()
    )
    assert fgot == exp
    assert not any("/bucket=" in f for f in back.inputFiles())


def test_extend_embed_index_layout_detection_edge_cases(spark, emb, tmp_path):
    """Layout detection is footer-based (advice-found): a literal
    'bucket=' segment in the index ROOT path must not flip a flat index
    to a partitioned append (which would brick the directory), and a
    partitioned index under such a root must still be detected as
    partitioned."""
    root = tmp_path / "bucket=7"
    root.mkdir()
    kept = emb.where(F.col("vec_id") % 5 != 2).select("vec_id", "embedding")
    new = emb.where(F.col("vec_id") % 5 == 2).select("vec_id", "embedding")
    verdicts = dd.embed_incremental(new, kept, 0.35)
    keep_ids = {r["vec_id"] for r in verdicts.where("keep").collect()}
    assert keep_ids
    exp_docs = kept.unionAll(new.where(F.col("vec_id").isin(*keep_ids)))
    exp = sorted(
        (r["vec_id"], r["bucket"], tuple(r["embedding"]))
        for r in dd.embed_index(exp_docs).collect()
    )

    flat = str(root / "flatidx")
    dd.embed_index(kept).write.parquet(flat)
    dd.extend_embed_index(new, verdicts, flat)
    back = spark.read.parquet(flat)
    fgot = sorted(
        (r["vec_id"], r["bucket"], tuple(r["embedding"]))
        for r in back.collect()
    )
    assert fgot == exp
    # still flat: no bucket= dirs BELOW the index root (the root's own
    # 'bucket=' segment is the trap)
    assert not any(
        "/bucket=" in f.split("flatidx", 1)[1] for f in back.inputFiles()
    )

    part = str(root / "partidx")
    dd.embed_index(kept).write.partitionBy("bucket").parquet(part)
    dd.extend_embed_index(new, verdicts, part)
    back2 = spark.read.parquet(part)
    pgot = sorted(
        (r["vec_id"], r["bucket"], tuple(r["embedding"]))
        for r in back2.collect()
    )
    assert pgot == exp
    assert all(
        "/bucket=" in f.split("partidx", 1)[1] for f in back2.inputFiles()
    )


def test_extend_loop_entry_sentinel_causality(spark, sf_dir):
    """The dedup_extend_loop entry's defining property: shard 2's copy
    (9000002) of the shard-1 sentinel keeper (9000001) flags
    dup_of_kept with kept_match=9000001 — visible ONLY through
    extend_band_index, because the sentinel text exists nowhere in the
    initial keeper corpus (it is synthetic and unique).  Plus the
    standard both-truth-values coverage for the other verdicts."""
    from xarray_histogram_spark.entry_queries import (
        _extend_loop_fn, _LOOP_SENTINEL,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # the causality argument needs the sentinel PHRASE absent from the
    # corpus (checking a single word like 'zq' would be both over-strict
    # — a random token could contain it — and under-checked)
    assert docs.where(
        F.col("text").contains(_LOOP_SENTINEL)
    ).count() == 0, "the sentinel phrase must not occur in the corpus"
    rows = {r["doc_id"]: r for r in _extend_loop_fn(spark, sf_dir).collect()}
    s = rows[9000002]
    assert s["dup_of_kept"] and s["kept_match"] == 9000001
    assert not s["keep"]
    w = rows[9000003]
    assert w["dup_within_new"] and not w["keep"]
    assert any(r["keep"] for r in rows.values())


def test_pack_sequences_semantics(spark):
    """Packed-sequence emission: per-shard document streams slice into
    exact context-token windows (short final window only), concatenation
    round-trips the stream, NULL/empty docs shift nothing, chunk ids are
    contiguous from 0, and bad context raises."""
    from xarray_histogram_spark.operators import sampling as sp

    df = spark.createDataFrame(
        [
            (1, "a b c d e", "s0"),
            (2, "f g", "s0"),
            (3, None, "s0"),
            (4, "", "s0"),
            (5, "x y z", "s1"),
        ],
        "doc_id: long, text: string, source: string",
    )
    got = sorted(
        map(tuple, sp.pack_sequences(df, "text", "doc_id", "source", 4).collect())
    )
    assert got == [
        ("s0", 0, 4, "a b c d"), ("s0", 1, 3, "e f g"),
        ("s1", 0, 3, "x y z"),
    ]
    # stream round-trip at another geometry: every full window exact,
    # flattened text equals the in-order document stream
    seqs = sorted(
        sp.pack_sequences(df, "text", "doc_id", "source", 3).collect(),
        key=lambda r: (r["source"], r["chunk_id"]),
    )
    s0 = [r for r in seqs if r["source"] == "s0"]
    assert " ".join(r["seq_text"] for r in s0).split() == list("abcdefg")
    assert [r["n_seq_tokens"] for r in s0] == [3, 3, 1]
    with pytest.raises(ValueError):
        sp.pack_sequences(df, "text", "doc_id", "source", 0)
    with pytest.raises(ValueError):
        sp.pack_sequences_sql("documents", "text", "doc_id", "source", -1)


def test_pack_sequences_duplicate_id_determinism(spark):
    """Two same-id same-count docs with DIFFERENT text pack in the
    deterministic (id, n, text) order on any partitioning — the
    tertiary key chunk_assignments doesn't need but text emission
    does."""
    from xarray_histogram_spark.operators import sampling as sp

    rows = [(7, "b b", "s0"), (7, "a a", "s0")]
    a = sorted(map(tuple, sp.pack_sequences(
        spark.createDataFrame(rows, "doc_id: long, text: string, source: string"),
        "text", "doc_id", "source", 3).collect()))
    b = sorted(map(tuple, sp.pack_sequences(
        spark.createDataFrame(rows[::-1], "doc_id: long, text: string, source: string")
        .repartition(5),
        "text", "doc_id", "source", 3).collect()))
    assert a == b
    assert a == [("s0", 0, 3, "a a b"), ("s0", 1, 1, "b")]


def test_bpe_encode_semantics(spark):
    """The emitted sequence is the merged state's tokens in order,
    consistent with bpe_token_count; NULL text -> NULL tokens/count,
    whitespace-only -> empty; bad tables raise."""
    df = spark.createDataFrame(
        [(1, "the theory"), (2, None), (3, "   "), (4, "a-b")],
        "doc_id: long, text: string",
    )
    r = {x["doc_id"]: x for x in
         tx.bpe_encode(df, "text", "doc_id").collect()}
    # 'the' -> [the]; 'theory' -> the|o|r|y -> (o,r)? not in demo ranks
    # applied after 'the'; demo table has (o,r): th,e -> the; o r y with
    # (o,r) rank 11 -> or, y
    assert list(r[1]["bpe_tokens"])[:1] == ["the"]
    assert r[1]["n_bpe_tokens"] == len(r[1]["bpe_tokens"])
    assert r[2]["bpe_tokens"] is None and r[2]["n_bpe_tokens"] is None
    assert list(r[3]["bpe_tokens"]) == [] and r[3]["n_bpe_tokens"] == 0
    assert list(r[4]["bpe_tokens"]) == ["a", "-", "b"]
    counts = {x["doc_id"]: x["n_bpe_tokens"] for x in
              tx.bpe_token_count(df, "text", "doc_id").collect()}
    assert {k: v["n_bpe_tokens"] for k, v in r.items()} == counts
    with pytest.raises(ValueError):
        tx.bpe_encode(df, "text", "doc_id", [])
    with pytest.raises(ValueError):
        tx.bpe_encode_sql("documents", "text", "doc_id", [("a", "")])
