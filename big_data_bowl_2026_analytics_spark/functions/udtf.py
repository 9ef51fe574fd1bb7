"""Python user-defined table functions (Spark 4 UDTF API).

The reference has no UDTFs (SURVEY §2.9); this is the engine's
extension point for row→rows Python logic that doesn't fit a scalar
UDF. ``ChunkDocument`` mirrors the native chunker in
``plans/queries/text.py::q86_text_chunking`` exactly (tested equal in
``tests/test_udtf_observe.py``): the native sequence+explode form is
the hot path (JVM-side, codegen); the UDTF exists for logic that
genuinely needs Python (custom tokenizers, model-based splitters),
where it still fans out partition-parallel.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id int, start int, chunk string")
class ChunkDocument:
    """Overlapping fixed-width chunks: eval(text, size, stride) →
    one row per chunk, 1-based starts, last chunk may be short."""

    def eval(self, text: str, size: int, stride: int):  # noqa: ANN201
        if text is None:
            return
        n = max(len(text), 1)
        for chunk_id, start in enumerate(range(0, n, stride)):
            yield (chunk_id, start + 1, text[start : start + size])
