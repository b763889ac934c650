"""Image payload invariants (BASELINE.json input_hint): decoded-pixel
allclose (exact for raw; PSNR >= 40 dB for lossy), caption byte-equality
through a join, phash stability."""

import numpy as np
import pytest

from geoengine import fixtures, images


def test_raw_codec_lossless_roundtrip():
    df = fixtures.images_pandas(20)
    for _, r in df.iterrows():
        px = images.decode_image(r["bytes"], r["w"], r["h"], r["fmt"])
        assert px.shape == (r["h"], r["w"], 3)
        if r["fmt"] == "raw":
            assert px.tobytes() == r["bytes"]  # exact (lossless)


def test_q6_psnr_above_40db():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    dec = images.decode_image(images.encode_q6(px), 32, 32, "q6")
    assert images.psnr(px, dec) >= 40.0


def test_unknown_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        images.decode_image(b"", 1, 1, "jpeg")


def test_phash_deterministic_and_robust():
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    h1 = images.phash64(px)
    h2 = images.phash64(px.copy())
    assert h1 == h2
    # q6 quantization barely moves the hash (near-dup detection property)
    hq = images.phash64(images.decode_image(images.encode_q6(px), 24, 24, "q6"))
    assert images.hamming64(h1, hq) <= 6
    other = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    assert images.hamming64(h1, images.phash64(other)) > 10


def test_images_table_spark_matches_pandas_twin(spark):
    sdf = fixtures.images_table(spark, 60, partitions=4).toPandas()
    pdf = fixtures.images_pandas(60)
    sdf = sdf.sort_values("image_id", ignore_index=True)
    pdf = pdf.sort_values("image_id", ignore_index=True)
    assert (sdf["caption"] == pdf["caption"]).all()  # caption byte-equality
    assert (sdf["phash"] == pdf["phash"]).all()
    assert all(a == b for a, b in zip(sdf["bytes"], pdf["bytes"]))
    np.testing.assert_allclose(sdf["latitude"], pdf["latitude"])


def test_with_computed_phash_matches_stored(spark):
    sdf = fixtures.images_table(spark, 50, partitions=2)
    out = images.with_computed_phash(sdf).select("phash", "phash_computed").toPandas()
    assert (out["phash"] == out["phash_computed"]).all()


def test_reencode_q6_psnr_column(spark):
    sdf = fixtures.images_table(spark, 30, partitions=2)
    out = images.reencode_q6(sdf).select("psnr_db").toPandas()
    assert (out["psnr_db"] >= 40.0).all()


def test_frame_sample_roundtrip(spark):
    sdf = fixtures.images_table(spark, 12, partitions=2)
    out = images.frame_sample(sdf, every_k=1).select(
        "n_frames", "bytes", "bytes_sampled"
    ).toPandas()
    assert (out["n_frames"] == 1).all()  # single-frame images
    assert all(a == b for a, b in zip(out["bytes"], out["bytes_sampled"]))


def test_audio_features_kernel(spark):
    import numpy as np
    import pandas as pd

    wave = (np.sin(np.linspace(0, 100, 16000)) * 10000).astype(np.int16)
    df = spark.createDataFrame(
        pd.DataFrame({"id": ["a"], "bytes": [wave.tobytes()]}),
        schema="id string, bytes binary",
    )
    r = images.audio_features(df).collect()[0]
    assert abs(r["duration_s"] - 1.0) < 1e-9
    assert 6000 < r["rms"] < 8000 and 9900 <= r["peak"] <= 10000


def test_resize_images_shape(spark):
    sdf = fixtures.images_table(spark, 12, partitions=2)
    out = images.resize_images(sdf, 8, 8).select("bytes_resized").toPandas()
    assert all(len(b) == 8 * 8 * 3 for b in out["bytes_resized"])


def test_phash_near_dup_exact_pair_set(spark):
    """Block-pigeonhole phash near-dup: recovers EXACTLY the noised-twin
    pairs (2% pixel noise, hamming <=2) with zero false positives among
    independent images (hamming >=22 measured); stored-phash path skips
    the decode stage and agrees."""
    from geoengine.fixtures import near_dup_images_table
    from geoengine.images import phash_near_dup_pairs, with_computed_phash

    imgs = near_dup_images_table(spark, 200, partitions=4)
    got = phash_near_dup_pairs(imgs).toPandas()
    want = {(f"img{i-1:010d}", f"img{i:010d}") for i in range(200) if i % 5 == 3}
    assert set(zip(got["doc1"], got["doc2"])) == want
    assert (got["hamming"] <= 7).all()

    # stored-hash path: precompute once, reuse — same answer, no decode
    stored = with_computed_phash(imgs, out="phash")
    got2 = phash_near_dup_pairs(stored, phash_col="phash").toPandas()
    assert set(zip(got2["doc1"], got2["doc2"])) == want
