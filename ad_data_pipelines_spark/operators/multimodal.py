"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched `mapInPandas`.

Beyond-reference (BASELINE.json north star). The design treats
image/audio/video as `binary` columns with a metadata struct; decode /
resize / frame-sample are Pandas-UDF stages over `mapInPandas`, so each
Arrow batch crosses the JVM↔Python boundary once and the expensive codec
work is vectorized per batch.

The actual codecs (PIL/librosa/av) are NOT in this container, so
`decode_image` raises NotImplementedError by design; `binary_meta` is the
same plumbing with a deterministic metadata extractor (byte length +
md5), which IS oracle-checkable — proving schema, batching and UDF
signature are correct end-to-end.

Scale notes: mapInPandas streams batches (no per-row pickling); payload
columns should be read with `spark.sql.parquet.enableVectorizedReader`
on and kept OUT of shuffle keys; partition by content hash for decode
skew (all-identical assets land together under naive hashing).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Output schema of the metadata-extraction stage.
BINARY_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
    ]
)


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload column. On real data this is the
    stored media blob; here it is the UTF-8 encoding of `text` so the
    pipeline stays deterministic and oracle-checkable."""
    return docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))


def binary_meta(docs: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads.

    The canonical multimodal stage shape: mapInPandas(Iterator[pd.DataFrame]
    → Iterator[pd.DataFrame]) with an explicit output schema. Replace the
    body with image decode / audio resample in a codec-enabled image.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "checksum": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return with_payload(docs).mapInPandas(extract, BINARY_META_SCHEMA)


def decode_image(docs_with_payload: DataFrame) -> DataFrame:
    """Image decode stage — STUB: codec libraries (PIL et al.) are not
    available in this container. The mapInPandas wiring is identical to
    `binary_meta`; only the batch body differs."""
    raise NotImplementedError(
        "image decode requires a codec-enabled runtime; see binary_meta for "
        "the working mapInPandas plumbing this stage plugs into"
    )


BINARY_META_SQL = """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS checksum
    FROM documents
"""
