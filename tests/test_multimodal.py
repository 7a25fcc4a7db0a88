"""Multimodal plumbing: binary payload column, Arrow-batched decode UDF,
stubbed codecs."""

import pandas as pd
import pytest

from pyspark_distributed_kmodes_spark.multimodal.binary import (
    decode_audio,
    decode_image,
    fake_decode_meta,
    qo80_multimodal_decode,
    with_blob,
)
from pyspark_distributed_kmodes_spark.sources.tables import table


def test_real_codecs_are_explicit_stubs():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF")


def test_blob_column_is_binary(spark, sf_dir):
    df = with_blob(table(spark, sf_dir, "documents"))
    assert dict(df.dtypes)["payload"] == "binary"


def test_fake_decode_deterministic():
    out1 = fake_decode_meta(pd.Series([1]), pd.Series([b"x" * 100]))
    out2 = fake_decode_meta(pd.Series([1]), pd.Series([b"x" * 100]))
    assert out1.equals(out2)
    assert out1.loc[0, "width"] == 100 % 640


def test_decode_pipeline_schema_and_rows(spark, sf_dir):
    out = qo80_multimodal_decode(spark, sf_dir)
    assert [f.name for f in out.schema.fields] == ["doc_id", "byte_len", "width", "height", "n_frames"]
    rows = out.collect()
    assert len(rows) == table(spark, sf_dir, "documents").count()
    assert all(0 <= r.width < 640 and 0 <= r.height < 480 for r in rows)


def test_resize_pipeline(spark, sf_dir):
    from pyspark_distributed_kmodes_spark.multimodal.binary import fake_decode_meta, resize_image, resized_meta
    import pandas as pd
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        resize_image(b"\x89PNG", 10, 10)
    docs = table(spark, sf_dir, "documents")
    out = {r.doc_id: (r.width, r.height) for r in resized_meta(docs).collect()}
    base = fake_decode_meta(
        pd.Series([0]), pd.Series([docs.filter("doc_id = 0").first().text.encode()])
    ).iloc[0]
    assert out[0] == (base.width // 2, base.height // 2)
