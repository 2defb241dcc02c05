"""Import-gated real-decode path: the gate must be decided by runtime
codec availability, and the fallback must stay a loud NotImplementedError
(never a silent wrong answer) in codec-less containers like this one."""

import pytest

from ad_data_pipelines_spark.operators import multimodal as mm
from ad_data_pipelines_spark.plans import testdata_queries as tq
from tests.conftest import SF_SMALL


def test_decode_image_gate_matches_runtime(spark):
    docs = tq.t(spark, SF_SMALL, "documents").limit(5)
    payload = mm.with_payload(docs)
    if not mm.pillow_available():
        with pytest.raises(NotImplementedError):
            mm.decode_image(payload)
        return
    # codec-enabled runtime: text payloads are not valid images, so the
    # per-row corrupt-blob guard must yield NULL dims, not a crash
    rows = mm.decode_image(payload).collect()
    assert len(rows) == 5
    assert all(r.width is None and r.mode is None for r in rows)


@pytest.mark.skipif(not mm.pillow_available(), reason="Pillow not installed")
def test_decode_image_real_png(spark):
    import io

    import PIL.Image

    buf = io.BytesIO()
    PIL.Image.new("RGB", (20, 10)).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame([(1, bytearray(png))], "doc_id long, payload binary")
    (row,) = mm.decode_image(df).collect()
    assert (row.width, row.height, row.mode) == (20, 10, "RGB")
