"""Python UDTF: fixed-size token chunking for LLM training data.

A table function (one row in → N chunk rows out) — the UDTF surface
from SURVEY §2.2's UDF/UDAF/UDTF row, applied to the most common
training-data transform there is: splitting documents into
fixed-token-budget chunks.

The chunk boundaries are pure arithmetic over the whitespace token
array, so the DuckDB oracle reproduces them exactly (list slicing).
Executed per-partition (Arrow-batched rows); no shuffle, no driver
involvement — at 100 TB the chunker is a pure map stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

CHUNK_SIZE = 50


@udtf(returnType="doc_id: bigint, chunk_idx: bigint, n_tokens: bigint, chunk: string")
class ChunkDocument:
    """Emit ``CHUNK_SIZE``-token chunks of a document (last chunk may
    be short). Empty/whitespace-only docs emit zero rows."""

    def eval(self, doc_id: int, text: str):
        if text is None:
            return
        toks = text.strip().lower().split()
        for i in range(0, len(toks), CHUNK_SIZE):
            part = toks[i : i + CHUNK_SIZE]
            yield doc_id, i // CHUNK_SIZE, len(part), " ".join(part)


def chunk_documents(
    spark: SparkSession, docs: DataFrame, view_name: str = "_docs_to_chunk"
) -> DataFrame:
    """Lateral-apply the chunker over a documents DataFrame."""
    spark.udtf.register("chunk_document", ChunkDocument)
    docs.createOrReplaceTempView(view_name)
    return spark.sql(
        f"SELECT c.doc_id, c.chunk_idx, c.n_tokens, c.chunk"
        f" FROM {view_name}, LATERAL chunk_document(doc_id, text) AS c"
    )
