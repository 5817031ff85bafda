"""Training-data pipeline operators: dedup, similarity, text, multimodal."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from heritrix_spark.pipeline import dedup, multimodal, similarity, text

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "the quick brown fox jumps over a lazy dog today"),  # near dup
    (3, "completely different content about spark engines"),
    (4, "der schnelle braune fuchs springt und ist nicht langsam"),
    (5, "x"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_exact_dedup(docs):
    groups = dedup.exact_groups(docs).collect()
    dup = [g for g in groups if g["n_dups"] > 1]
    assert len(dup) == 1 and dup[0]["keeper"] == 0
    kept = dedup.drop_exact_dups(docs)
    assert kept.count() == 5
    assert {r["doc_id"] for r in kept.collect()} == {0, 2, 3, 4, 5}


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {(r["id_a"], r["id_b"])
             for r in dedup.lsh_candidate_pairs(
                 docs, num_hashes=16, bands=8, n=2).collect()}
    assert (0, 1) in pairs  # exact dups always collide
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup found
    assert (0, 3) not in pairs  # unrelated docs don't collide in all bands


def test_ngram_jaccard_refine(spark, docs):
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "id_a long, id_b long")
    j = {(r["id_a"], r["id_b"]): r["jaccard"]
         for r in dedup.ngram_jaccard(docs, pairs, n=2).collect()}
    assert j[(0, 1)] == 1.0
    assert 0.2 < j[(0, 2)] < 1.0
    assert j[(0, 3)] == 0.0


def test_simhash_near_dups(docs):
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert sh[0] == sh[1]
    assert sh[0] != sh[3]
    nd = {(r["id_a"], r["id_b"]): r["hamming"]
          for r in dedup.simhash_near_dups(docs, max_hamming=16).collect()}
    assert nd[(0, 1)] == 0


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.Generator(np.random.PCG64(7))
    base = rng.normal(size=(6, 8)).astype("float32")
    base[1] = base[0] + 0.01 * rng.normal(size=8).astype("float32")
    rows = [(i, [float(x) for x in base[i]]) for i in range(6)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>").cache()


def test_knn_brute_exact(spark, vectors):
    q = vectors.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    top = similarity.knn_brute(
        vectors.where(F.col("vec_id") != 0), q, k=2).collect()
    assert top[0]["vec_id"] == 1  # the near-copy ranks first
    assert top[0]["cosine"] > 0.99


def test_knn_lsh_and_ivf_recall_top1(spark, vectors):
    rng = np.random.Generator(np.random.PCG64(11))
    planes = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(3)],
        "plane_id int, plane_vec array<float>")
    q = vectors.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    lsh = similarity.knn_lsh(vectors.where(F.col("vec_id") != 0), q,
                             planes, k=2).collect()
    assert lsh and lsh[0]["vec_id"] == 1  # near-copy shares every bucket

    cents = spark.createDataFrame(
        [(0, [float(x) for x in rng.normal(size=8)]),
         (1, [float(x) for x in rng.normal(size=8)])],
        "cell_id int, centroid array<float>")
    ivf = similarity.knn_ivf(vectors.where(F.col("vec_id") != 0), q, cents,
                             k=2, nprobe=2).collect()
    assert ivf and ivf[0]["vec_id"] == 1  # nprobe=all cells → exact


def test_ivf_train_centroids(spark, vectors):
    """Lloyd's training: k centroids of the right dimension, assignment
    covers every vector, and searching with TRAINED centroids still
    recalls the brute-force top-1 at nprobe=k."""
    k = 2
    cents = similarity.ivf_train(vectors, k=k, iters=3)
    rows = cents.collect()
    assert {r["cell_id"] for r in rows} <= set(range(k)) and rows
    assert all(len(r["centroid"]) == 8 for r in rows)
    assigned = similarity.ivf_assign(vectors, cents)
    assert assigned.count() == vectors.count()
    q = vectors.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    ivf = similarity.knn_ivf(vectors.where(F.col("vec_id") != 0), q, cents,
                             k=2, nprobe=k).collect()
    assert ivf and ivf[0]["vec_id"] == 1


def test_text_ops(spark, docs):
    out = text.quality_features(text.lang_id(docs)).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["lang_guess"] == "en"
    assert by_id[4]["lang_guess"] == "de"
    assert by_id[5]["lang_guess"] == "unknown"
    assert by_id[0]["quality_score_pct"] > by_id[5]["quality_score_pct"]
    toks = docs.select(
        "doc_id",
        text.token_count(F.col("text")).alias("n"),
        text.bpe_ish_token_count(F.col("text")).alias("nb")).collect()
    td = {r["doc_id"]: (r["n"], r["nb"]) for r in toks}
    assert td[0][0] == 9 and td[5][0] == 1
    assert td[0][1] >= td[0][0]
    fp = text.rolling_fingerprint(docs).collect()
    fpd = {r["doc_id"]: r["fingerprint"] for r in fp}
    assert fpd[0] == fpd[1] and fpd[0] != fpd[3]


def test_multimodal_features_and_thumbs(spark):
    from heritrix_spark.fixtures import gen, websim
    spec = websim.FixtureSpec("mm", 12, 3, True)
    pdf = gen.images_df(spec)
    images = spark.createDataFrame(pdf)
    feats = multimodal.image_features(images).collect()
    assert len(feats) == 12 and all(r["decode_ok"] for r in feats)
    by_id = {r["image_id"]: r for r in feats}
    for r in pdf.itertuples():
        assert by_id[r.image_id]["phash"] == r.phash
        assert abs(by_id[r.image_id]["mean_r"] - 127.5) < 40
    th = multimodal.thumbnails(images, 4, 4).collect()
    assert len(th) == 12
    from heritrix_spark.functions import imagecodec
    t0 = imagecodec.decode(bytes(th[0]["thumb"]))
    assert t0.shape == (4, 4, 3)


def test_avcodec_roundtrip():
    from heritrix_spark.functions import avcodec, imagecodec
    s = avcodec.gen_samples(3, 4000, 16_000)
    dec, sr = avcodec.decode_audio(avcodec.encode_audio(s, 16_000))
    assert sr == 16_000 and np.array_equal(dec, s)          # lossless
    blob = avcodec.gen_video(5, n_frames=4, w=10, h=6, frame_interval_ms=250)
    frames, interval = avcodec.decode_video(blob)
    assert interval == 250 and len(frames) == 4
    assert np.array_equal(imagecodec.decode(frames[2]),
                          imagecodec.gen_pixels(1000 * 5 + 2, 10, 6))
    with pytest.raises(ValueError):
        avcodec.decode_audio(b"nope")
    with pytest.raises(ValueError):
        avcodec.decode_video(b"nope")


def test_audio_features(spark):
    from heritrix_spark.functions import avcodec
    rows = [(f"c{k}", bytearray(avcodec.encode_audio(
        avcodec.gen_samples(k, 1000 + 100 * k), 16_000))) for k in range(5)]
    rows.append(("bad", bytearray(b"not-audio")))    # corrupt -> decode_ok F
    rows.append(("nul", None))                       # null bytes filtered out
    clips = spark.createDataFrame(rows, "clip_id string, bytes binary")
    got = {r["clip_id"]: r for r in
           multimodal.audio_features(clips).collect()}
    assert set(got) == {f"c{k}" for k in range(5)} | {"bad"}
    assert not got["bad"]["decode_ok"]
    for k in range(5):
        r = got[f"c{k}"]
        assert r["decode_ok"] and r["sample_rate"] == 16_000
        assert r["n_samples"] == 1000 + 100 * k
        expect = avcodec.rms(avcodec.gen_samples(k, 1000 + 100 * k))
        assert abs(r["rms"] - expect) < 1e-12


def test_video_frame_sample(spark):
    from heritrix_spark.functions import avcodec, imagecodec
    # 10 frames at 200 ms -> ts 0..1800; every_ms=1000 buckets sample
    # the first frame of each window: idx 0 (ts 0) and idx 5 (ts 1000).
    rows = [(f"v{k}", bytearray(avcodec.gen_video(
        k, n_frames=10, w=8, h=8, frame_interval_ms=200))) for k in range(3)]
    videos = spark.createDataFrame(rows, "video_id string, bytes binary")
    out = multimodal.video_frame_sample(videos, every_ms=1000).collect()
    assert len(out) == 6
    for r in out:
        assert (r["frame_idx"], r["ts_ms"]) in [(0, 0), (5, 1000)]
        k = int(r["video_id"][1:])
        assert np.array_equal(
            imagecodec.decode(bytes(r["frame"])),
            imagecodec.gen_pixels(1000 * k + r["frame_idx"], 8, 8))
    # sampled frames are engine-image payloads: compose with image_features
    sampled = multimodal.video_frame_sample(videos, every_ms=1000).select(
        F.concat_ws("#", "video_id", "frame_idx").alias("image_id"),
        F.col("frame").alias("bytes"), F.lit("png").alias("fmt"))
    feats = multimodal.image_features(sampled).collect()
    assert len(feats) == 6 and all(r["decode_ok"] for r in feats)


def test_phash_near_dup_pairs(spark):
    rows = [("a", 0b1010), ("b", 0b1011), ("c", -4611686018427387904)]
    feats = spark.createDataFrame(rows, "image_id string, phash long")
    pairs = multimodal.phash_near_dup_pairs(feats, max_hamming=2).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert got == {("a", "b"): 1}


def test_embedding_near_dups(spark, vectors):
    # vec 1 is a near-copy of vec 0: cosine ~1 and identical sign bits on
    # dims 1-2 (dim 0 of vec 0 is ~1e-3, small enough that the 0.01
    # perturbation flips its sign — exactly the boundary-recall miss the
    # docstring's multi-plane-set advice is about, so the test avoids it).
    planes = similarity.axis_planes(spark, [1, 2], 8)
    pairs = similarity.embedding_near_dups(
        vectors, planes, threshold=0.98).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(0, 1)]
    assert pairs[0]["cosine"] > 0.99
    # exact brute-force agreement at a loose threshold: LSH candidates
    # verified by cosine are a subset of all-pairs cosine >= t
    brute = {(a, b)
             for a in range(6) for b in range(a + 1, 6)}
    got = {(r["id_a"], r["id_b"])
           for r in similarity.embedding_near_dups(
               vectors, planes, threshold=-1.0).collect()}
    assert got <= brute


def test_embedding_near_dups_bucket_cap(spark, vectors):
    # cap of 1 member per bucket → no pairs at all (non-silent bound)
    planes = similarity.axis_planes(spark, [0], 8)
    got = similarity.embedding_near_dups(
        vectors, planes, threshold=-1.0, max_bucket=1).count()
    assert got == 0
