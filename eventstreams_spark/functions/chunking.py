"""Document chunking UDTF (SURVEY §2.10 table-function surface).

Domain op: Logstash ``split`` (one event → many) beyond simple array
explode — here the LLM-pipeline workhorse version: split a document
into fixed-size token chunks (training-corpus / RAG preprocessing).

Implemented as a Python UDTF (Spark ≥3.5, arrow-batched): one input
row yields ``ceil(n_tokens/chunk)`` rows. A UDTF is the right surface
when the expansion logic is imperative; for this particular op a pure
column expression exists too (``sequence`` + ``transform`` +
``slice``), which ``chunk_text_columnar`` provides — it is the 100 TB
hot path (whole-stage codegen, no Python workers), while the UDTF
form documents/exercises the extension point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="chunk_no INT, chunk STRING")
class ChunkText:
    """Yield fixed-size whitespace-token chunks of ``text``."""

    def eval(self, text: str, chunk_size: int):  # noqa: D102
        if text is None:
            return
        toks = text.split(" ")
        for i in range(0, len(toks), chunk_size):
            yield (i // chunk_size, " ".join(toks[i : i + chunk_size]))


def chunk_text_columnar(
    df: DataFrame, text_col: str, chunk_size: int, keys: list[str]
) -> DataFrame:
    """Columnar equivalent: tokens → index sequence → posexplode slices.

    Whole plan stays JVM-side; expansion is ``posexplode`` so Spark can
    pipeline it inside codegen — no shuffle is introduced by chunking
    itself.
    """
    toks = F.split(F.col(text_col), " ")
    nchunks = F.ceil(F.size("_toks") / F.lit(chunk_size)).cast("int")
    return (
        df.select(*keys, toks.alias("_toks"))
        .select(
            *keys,
            F.col("_toks"),
            F.explode(F.sequence(F.lit(0), nchunks - 1)).alias("chunk_no"),
        )
        .withColumn(
            "chunk",
            F.array_join(
                F.slice(F.col("_toks"), F.col("chunk_no") * chunk_size + 1, chunk_size),
                " ",
            ),
        )
        .drop("_toks")
    )
