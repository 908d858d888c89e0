"""Multimodal binary-column plumbing tests (decode stubbed, plumbing real)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def blobs(spark):
    rows = [(i, bytearray(bytes(range(i, i + 100)) * 3)) for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, blob binary")


def test_byte_features(spark, blobs):
    rows = {r["doc_id"]: r for r in MM.byte_features(blobs).collect()}
    b0 = bytes(range(0, 100)) * 3
    a = np.frombuffer(b0, dtype=np.uint8)
    assert rows[0]["n_bytes"] == 300
    assert rows[0]["byte_sum"] == int(a.sum())
    assert rows[0]["n_distinct"] == 100
    p = np.full(100, 3 / 300)
    assert rows[0]["entropy"] == pytest.approx(-(p * np.log2(p)).sum(), abs=1e-6)


def test_decode_image_rejects_unknown_and_truncated(spark, blobs):
    """Real decode path: non-image bytes and truncated JPEG fail with a
    clear error at execution (raised inside the executor, surfaced via
    PythonException)."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises((PythonException, Py4JJavaError),
                       match="unrecognized image format"):
        MM.decode_image(blobs).collect()
    jpeg = spark.createDataFrame([(1, bytearray(b"\xff\xd8\xff\xe0 no"))],
                                 "doc_id long, blob binary")
    with pytest.raises((PythonException, Py4JJavaError),
                       match="JPEG"):
        MM.decode_image(jpeg).collect()


def test_decode_fake_and_resize(spark, blobs):
    imgs = MM.decode_image(blobs, fake=True, size=(16, 16))
    rows = {r["doc_id"]: r for r in imgs.collect()}
    assert rows[2]["h"] == 16 and len(bytes(rows[2]["pixels"])) == 256
    grid = np.frombuffer(bytes(rows[2]["pixels"]), dtype=np.uint8)
    want = np.resize(np.frombuffer(bytes(range(2, 102)) * 3, dtype=np.uint8), (16, 16))
    np.testing.assert_array_equal(grid.reshape(16, 16), want)
    small = MM.resize_image(imgs, (4, 4)).collect()
    assert all(len(bytes(r["pixels"])) == 16 for r in small)


def test_frame_sample(spark, blobs):
    frames = MM.frame_sample(blobs, every=2, frame_bytes=50).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 300 bytes / 50 = 6 frames, every 2nd → frames 0, 2, 4
    assert sorted(r["frame_no"] for r in by_doc[1]) == [0, 2, 4]
    f2 = next(r for r in by_doc[1] if r["frame_no"] == 2)
    assert bytes(f2["frame"]) == (bytes(range(1, 101)) * 3)[100:150]
