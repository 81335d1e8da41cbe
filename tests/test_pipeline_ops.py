"""Training-data pipeline operators: dedup, similarity, text stats,
multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bayesian_bm25_js_spark.functions.prng import mulberry32
from bayesian_bm25_js_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    simhash_signatures,
)
from bayesian_bm25_js_spark.operators.similarity import (
    brute_force_topk,
    cosine_near_pairs,
    lsh_topk,
)
from bayesian_bm25_js_spark.operators.textstats import (
    lang_id_column,
    quality_features,
    text_stats_table,
    token_count_column,
)


def make_docs(spark):
    """Corpus with known duplicate structure."""
    base = [f"tok{i}" for i in range(30)]
    rng = mulberry32(11)
    docs = []
    for i in range(40):
        docs.append([base[int(rng() * 30)] for _ in range(25)])
    # exact duplicate pair
    docs.append(list(docs[0]))
    # near duplicate of doc 1 (one token changed)
    nd = list(docs[1])
    nd[5] = "CHANGED"
    docs.append(nd)
    # unrelated doc
    docs.append(["zebra"] * 25)
    return spark.createDataFrame(
        [(i, toks, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, tokens array<string>, content string",
    )


@pytest.fixture(scope="module")
def dup_docs(spark):
    return make_docs(spark).cache()


def test_exact_dedup(dup_docs):
    groups = exact_dedup(dup_docs).collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == [0, 40]
    assert groups[0]["keeper"] == 0


def test_minhash_identical_docs_sig_equal(dup_docs):
    sigs = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures(dup_docs, shingle_k=3).collect()
    }
    assert sigs[0] == sigs[40]
    assert len(sigs[0]) == 64
    assert sigs[0] != sigs[42]  # unrelated doc differs


def test_minhash_lsh_finds_dups(dup_docs):
    sigs = minhash_signatures(dup_docs, shingle_k=3)
    pairs = {
        (r["a"], r["b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(sigs, threshold=0.5).collect()
    }
    assert pairs.get((0, 40)) == 1.0  # exact dup: all components equal
    assert (1, 41) in pairs  # near dup found
    assert all(a < b for (a, b) in pairs)
    assert not any(42 in p for p in pairs)  # unrelated not paired


def test_ngram_jaccard_verification(spark, dup_docs):
    cand = spark.createDataFrame(
        [(0, 40), (1, 41), (0, 42)], "a long, b long"
    )
    j = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(dup_docs, cand, shingle_k=3).collect()
    }
    assert j[(0, 40)] == pytest.approx(1.0)
    assert 0.5 < j[(1, 41)] < 1.0
    assert j[(0, 42)] == pytest.approx(0.0)


def test_simhash_near_pairs(dup_docs):
    sigs = simhash_signatures(dup_docs)
    got = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
    assert got[0] == got[40]
    pairs = {
        (r["a"], r["b"]): r["hamming"]
        for r in simhash_near_pairs(sigs, max_distance=3).collect()
    }
    assert pairs.get((0, 40)) == 0
    assert (1, 41) in pairs  # near dup within hamming 3
    assert not any(42 in p for p in pairs)


def make_embeddings(spark, n=60, dim=8, seed=3):
    rng = mulberry32(seed)
    rows = []
    for i in range(n):
        v = [rng() * 2 - 1 for _ in range(dim)]
        rows.append((i, v))
    # vec 60 = clone of vec 0 (exact cosine 1), vec 61 = slight perturb
    rows.append((n, list(rows[0][1])))
    rows.append((n + 1, [x + 0.01 for x in rows[1][1]]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def emb(spark):
    return make_embeddings(spark).cache()


def test_brute_force_topk(spark, emb):
    q = spark.createDataFrame(
        [(0, emb.filter("vec_id = 0").first()["embedding"])],
        "query_id long, qvec array<double>",
    )
    rows = brute_force_topk(emb, q, k=3).orderBy("rank").collect()
    # vec 0 and its clone 60 tie at cos=1; tie-break asc vec_id
    assert [r["vec_id"] for r in rows[:2]] == [0, 60]
    assert rows[0]["cos"] == pytest.approx(1.0)
    assert rows[1]["cos"] == pytest.approx(1.0)


def test_lsh_topk_recall_at_top(spark, emb):
    q = spark.createDataFrame(
        [(0, emb.filter("vec_id = 0").first()["embedding"])],
        "query_id long, qvec array<double>",
    )
    exact = [r["vec_id"] for r in brute_force_topk(emb, q, k=1).collect()]
    approx = [r["vec_id"] for r in lsh_topk(emb, q, k=1, n_planes=16, n_bands=8).collect()]
    # identical vector always shares every band with itself
    assert approx[:1] == exact[:1]


def test_cosine_near_pairs(emb):
    pairs = {
        (r["a"], r["b"]): r["cos"]
        for r in cosine_near_pairs(emb, threshold=0.99, n_bands=8).collect()
    }
    assert pairs.get((0, 60)) == pytest.approx(1.0)
    assert (1, 61) in pairs


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (0, ["the", "cat", "and", "the", "dog", "is", "in", "it"]),
            (1, ["el", "gato", "y", "la", "casa", "de", "un", "perro"]),
            (2, ["le", "chat", "et", "la", "maison", "des", "une", "est"]),
            (3, ["xyzzy", "qwerty"]),
        ],
        "doc_id long, toks array<string>",
    )
    got = {
        r["doc_id"]: r["lang"]
        for r in df.select("doc_id", lang_id_column(F.col("toks")).alias("lang")).collect()
    }
    assert got[0] == "en"
    assert got[1] == "es"
    assert got[2] == "fr"
    assert got[3] == "und"


def test_quality_features(spark):
    df = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "a a a a a a a a"),
         (2, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in quality_features(df).collect()}
    assert rows[0]["n_tokens"] == 9
    assert rows[0]["n_distinct"] == 8
    assert rows[0]["distinct_ratio"] == pytest.approx(8 / 9)
    assert rows[1]["distinct_ratio"] == pytest.approx(1 / 8)
    assert rows[0]["quality_score"] > rows[1]["quality_score"]
    assert rows[2]["n_tokens"] == 0 and rows[2]["quality_score"] == pytest.approx(0.0)


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(0, "hello world  foo"), (1, "parseHTTPResponse my_var x2")],
        "doc_id long, text string",
    )
    rows = df.select(
        "doc_id",
        token_count_column(F.col("text")).alias("ws"),
        token_count_column(F.col("text"), bpe_like=True).alias("bpe"),
    ).collect()
    got = {r["doc_id"]: (r["ws"], r["bpe"]) for r in rows}
    assert got[0] == (3, 3)
    assert got[1][0] == 3
    assert got[1][1] > 3  # camelCase/underscore/digit splits


def test_text_stats_table(spark):
    df = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "el gato de la casa es un")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text_stats_table(df).collect()}
    assert rows[0]["lang_pred"] == "en"
    assert rows[1]["lang_pred"] == "es"
    assert rows[0]["fingerprint"] is not None
    assert rows[0]["ws_tokens"] == 6


def test_multimodal_plumbing(spark):
    from bayesian_bm25_js_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
        frame_sample,
        synthesize_media,
    )

    media = synthesize_media(spark, 30)
    feats = extract_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r["feature"]) == FEATURE_DIM
        assert all(-1.0 <= x <= 1.0 for x in r["feature"])
    # determinism: same payload -> same features
    again = extract_features(media).collect()
    assert {r["doc_id"]: r["feature"] for r in feats} == {
        r["doc_id"]: r["feature"] for r in again
    }
    # real decoder on an undecodable payload (sha256 bytes, not a
    # container format): the task fails with the clear per-row error
    # naming the missing decoder, not a raw ImportError
    from bayesian_bm25_js_spark.operators.multimodal import HAS_PIL

    if not HAS_PIL:
        img_only = media.filter("modality = 'image'")
        with pytest.raises(Exception, match="pillow"):
            extract_features(img_only, decode="real").collect()
    frames = frame_sample(media, every_n=10)
    vid = media.filter("modality = 'video'").count()
    assert frames.select("doc_id").distinct().count() == vid
    assert frames.filter("frame_idx < 0").count() == 0


def test_resize_images_rewrites_payload_and_meta(spark):
    import hashlib

    from bayesian_bm25_js_spark.operators.multimodal import (
        resize_images,
        synthesize_media,
    )

    media = synthesize_media(spark, 12)
    out = resize_images(media, 32, 24).collect()
    src = {r["doc_id"]: r for r in media.collect()}
    assert len(out) == 12
    for r in out:
        orig = src[r["doc_id"]]
        if r["modality"] == "image":
            want = hashlib.sha256(bytes(orig["data"]) + b"32x24").digest()
            assert bytes(r["data"]) == want
            assert (r["meta"]["width"], r["meta"]["height"]) == (32, 24)
            # untouched meta fields survive the rewrite
            assert r["meta"]["sample_rate"] == orig["meta"]["sample_rate"]
        else:  # non-image rows pass through byte-identical
            assert bytes(r["data"]) == bytes(orig["data"])
            assert r["meta"] == orig["meta"]


def test_resize_images_rejects_bad_args(spark):
    import pytest as _pytest

    from bayesian_bm25_js_spark.operators.multimodal import (
        resize_images,
        synthesize_media,
    )

    media = synthesize_media(spark, 3)
    from bayesian_bm25_js_spark.operators.multimodal import HAS_PIL

    if not HAS_PIL:
        # non-PPM image payloads need PIL; the error is raised in the
        # task with the message naming pillow
        with _pytest.raises(Exception, match="pillow"):
            resize_images(
                media.filter("modality = 'image'"), 8, 8, decode="real"
            ).collect()
    with _pytest.raises(ValueError):
        resize_images(media, 0, 8)


def test_real_decode_path_with_pil(spark):
    """Exercises the decode='real' structure end-to-end when PIL is
    installed (skipped in containers without it): PNG payloads are
    decoded, resized, and histogram-featurized."""
    from bayesian_bm25_js_spark.operators.multimodal import (
        FEATURE_DIM,
        HAS_PIL,
        extract_features,
        resize_images,
    )

    if not HAS_PIL:
        pytest.skip("PIL not installed")
    import io

    from PIL import Image

    def png(w, h, shade):
        buf = io.BytesIO()
        Image.new("L", (w, h), shade).save(buf, format="PNG")
        return buf.getvalue()

    media = spark.createDataFrame(
        [
            (0, "image", png(8, 6, 0), (8, 6, 0, 0)),
            (1, "image", png(4, 4, 255), (4, 4, 0, 0)),
        ],
        "doc_id long, modality string, data binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    resized = resize_images(media, 2, 2, decode="real").collect()
    for r in resized:
        assert (r["meta"]["width"], r["meta"]["height"]) == (2, 2)
        img = Image.open(io.BytesIO(bytes(r["data"])))
        assert img.size == (2, 2)
    feats = {r["doc_id"]: r["feature"] for r in
             extract_features(media, decode="real").collect()}
    assert len(feats[0]) == FEATURE_DIM
    assert abs(sum(feats[0]) - 1.0) < 1e-9
    # all-black image -> all mass in the first histogram bin
    assert feats[0][0] == 1.0 and feats[1][-1] == 1.0


def test_real_decode_ppm_and_wav_runs_in_container(spark):
    """The real-decode path EXECUTES here with no optional deps:
    binary PPM images and RIFF/WAVE PCM16 audio decode via the
    built-in pure-NumPy decoders, end-to-end through mapInPandas."""
    import numpy as np

    from bayesian_bm25_js_spark.operators.multimodal import (
        FEATURE_DIM,
        decode_ppm,
        decode_wav,
        encode_ppm,
        encode_wav,
        extract_features,
        resize_images,
    )

    # codec roundtrips
    rgb = (np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3) * 7) % 256
    assert (decode_ppm(encode_ppm(rgb)) == rgb).all()
    samples = (np.arange(300, dtype=np.int64) * 217 - 30000).astype(np.int16)
    assert (decode_wav(encode_wav(samples)) == samples).all()

    black = np.zeros((8, 6, 3), dtype=np.uint8)
    white = np.full((4, 4, 3), 255, dtype=np.uint8)
    silent = np.zeros(256, dtype=np.int16)
    media = spark.createDataFrame(
        [
            (0, "image", bytearray(encode_ppm(black)), (6, 8, 0, 0)),
            (1, "image", bytearray(encode_ppm(white)), (4, 4, 0, 0)),
            (2, "audio", bytearray(encode_wav(silent)), (0, 0, 16000, 0)),
        ],
        "doc_id long, modality string, data binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    feats = {r["doc_id"]: r["feature"]
             for r in extract_features(media, decode="real").collect()}
    assert len(feats[0]) == FEATURE_DIM
    # all-black image -> all mass in histogram bin 0; all-white -> last
    assert feats[0][0] == 1.0 and sum(feats[0]) == 1.0
    assert feats[1][-1] == 1.0
    # silence (sample 0 -> bin 128 -> feature bin dim/2)
    assert feats[2][FEATURE_DIM // 2] == 1.0

    resized = {r["doc_id"]: r for r in
               resize_images(media, 2, 3, decode="real").collect()}
    out = decode_ppm(bytes(resized[0]["data"]))
    assert out.shape == (3, 2, 3) and (out == 0).all()
    assert (resized[0]["meta"]["width"], resized[0]["meta"]["height"]) == (2, 3)
    # audio rows pass through resize untouched
    assert bytes(resized[2]["data"]) == bytes(encode_wav(silent))


def test_real_decode_unintegrated_formats_error_clearly(spark):
    """Compressed audio and video raise the per-row NotImplementedError
    naming the missing integration (not a crash deep in NumPy)."""
    from bayesian_bm25_js_spark.operators.multimodal import extract_features

    bad_audio = spark.createDataFrame(
        [(0, "audio", bytearray(b"\xffMP3DATA"), (0, 0, 0, 0))],
        "doc_id long, modality string, data binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    with pytest.raises(Exception, match="librosa|RIFF"):
        extract_features(bad_audio, decode="real").collect()
    video = spark.createDataFrame(
        [(0, "video", bytearray(b"xxxx"), (0, 0, 0, 8))],
        "doc_id long, modality string, data binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    with pytest.raises(Exception, match="not integrated"):
        extract_features(video, decode="real").collect()


def test_real_decode_y4m_video_runs_in_container(spark):
    """Video completes the pure-NumPy modality triple: YUV4MPEG2
    payloads decode end-to-end through mapInPandas with no av/ffmpeg,
    and the feature is the luma histogram pooled over frames."""
    import numpy as np

    from bayesian_bm25_js_spark.operators.multimodal import (
        FEATURE_DIM,
        decode_y4m,
        encode_y4m,
        extract_features,
    )

    # codec roundtrip (mono) + C420 luma extraction with chroma skip
    frames = (np.arange(3 * 6 * 4, dtype=np.uint8).reshape(3, 6, 4) * 11) % 256
    assert (decode_y4m(encode_y4m(frames)) == frames).all()
    w, h = 4, 6
    head = b"YUV4MPEG2 W4 H6 F25:1 Ip A1:1 C420jpeg\n"
    luma = np.full((h, w), 200, dtype=np.uint8)
    chroma = bytes((w // 2) * (h // 2) * 2)
    payload_420 = head + b"FRAME\n" + luma.tobytes() + chroma
    got = decode_y4m(payload_420)
    assert got.shape == (1, h, w) and (got == 200).all()

    black = np.zeros((2, 8, 8), dtype=np.uint8)
    white = np.full((1, 4, 4), 255, dtype=np.uint8)
    media = spark.createDataFrame(
        [
            (0, "video", bytearray(encode_y4m(black)), (8, 8, 0, 2)),
            (1, "video", bytearray(encode_y4m(white)), (4, 4, 0, 1)),
            (2, "video", bytearray(payload_420), (4, 6, 0, 1)),
        ],
        "doc_id long, modality string, data binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    feats = {r["doc_id"]: r["feature"]
             for r in extract_features(media, decode="real").collect()}
    assert feats[0][0] == 1.0 and sum(feats[0]) == 1.0  # all-black luma
    assert feats[1][-1] == 1.0                          # all-white luma
    # luma 200 -> 256-bin 200 -> feature bin 200 // (256 // dim)
    assert feats[2][200 // (256 // FEATURE_DIM)] == 1.0

    # non-Y4M video payloads still raise the clear per-row error
    import pytest as _pytest
    bad = spark.createDataFrame(
        [(9, "video", bytearray(b"\x00\x00\x00 ftypmp42"), (0, 0, 0, 1))],
        "doc_id long, modality string, data binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    with _pytest.raises(Exception, match="YUV4MPEG2|not integrated"):
        extract_features(bad, decode="real").collect()


def test_iceberg_source_gated(spark):
    """The Iceberg reader path (north-star input) is wired up to the
    DataSourceV2 resolution point; without the runtime on the classpath
    it must fail with the actionable setup hint, not a raw
    ClassNotFound. Also pins the snapshot/timestamp mutual exclusion."""
    import pytest as _pytest

    from bayesian_bm25_js_spark.sources.iceberg import read_iceberg_corpus

    with _pytest.raises(ValueError, match="not both"):
        read_iceberg_corpus(spark, "cat.db.t", snapshot_id=1,
                            as_of_timestamp_ms=2)
    with _pytest.raises(Exception) as ei:
        read_iceberg_corpus(spark, "cat.db.corpus", snapshot_id=123)
    msg = str(ei.value)
    assert "iceberg" in msg.lower(), msg
