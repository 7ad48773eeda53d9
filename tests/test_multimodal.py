"""Multimodal plumbing (L10): schemas, batch shapes, determinism, and
the pointer-to-blob layout — with the codec stubbed (none in env)."""

import pytest

from novlake_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return M.synthesize_media(spark, n=30)


def test_schema(media):
    assert media.schema == M.media_schema
    assert media.count() == 30


def test_decode_requires_codec_or_fake(media):
    with pytest.raises(NotImplementedError):
        M.decode_image(media).collect()


def test_fake_decode_shapes(media):
    out = M.decode_image(media, fake=True)
    rows = out.collect()
    assert len(rows) == media.filter("kind = 'image'").count()
    assert all(0 <= r.mean_intensity <= 255 for r in rows)


def test_fake_decode_deterministic(media):
    a = sorted(M.decode_image(media, fake=True).collect())
    b = sorted(M.decode_image(media, fake=True).collect())
    assert a == b


def test_resize_plan(media):
    rows = M.resize_plan(media, target=64).collect()
    assert rows and all(r.scale <= 1.0 for r in rows)


def test_frame_sampling_counts(media):
    out = M.sample_frames(media, fps=2.0).collect()
    vids = {r.media_id: r.meta["duration_ms"] for r in media.filter("kind='video'").collect()}
    from collections import Counter

    per = Counter(r.media_id for r in out)
    for mid, dur in vids.items():
        assert per[mid] == -(-dur // 500)  # ceil(duration / 500ms)


def test_features_unit_norm_and_stable(media):
    import math

    out = {r.media_id: r.feature for r in M.extract_features(media).collect()}
    again = {r.media_id: r.feature for r in M.extract_features(media).collect()}
    assert out == again
    norm = math.fsum(x * x for x in out[0])
    assert abs(norm - 1.0) < 1e-3


def test_blob_pointer_layout(media, spark, tmp_path):
    ptr = M.with_blob_pointers(media, "lake://media/raw")
    assert set(ptr.columns) == {"media_id", "kind", "uri", "byte_len", "sha256", "meta"}
    # layout round-trips through parquet with partition pruning by kind
    path = str(tmp_path / "media_ptr")
    ptr.write.partitionBy("kind").parquet(path)
    back = spark.read.parquet(path)
    assert back.filter("kind = 'image'").count() == media.filter("kind='image'").count()
