"""Python UDTFs (table functions) — the 1:N row-expanding extension
point (SURVEY.md §2.10).

Built-in generators (explode/posexplode) cover most fan-out; a UDTF is
the slot for fan-outs with per-row Python logic.  The shingle UDTF here
mirrors operators/dedup.shingle_rows so tests can cross-check the two
formulations; production paths prefer the codegen'd window form.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos: int, shingle: string")
class WordNGrams:
    """Emit (position, word-n-gram) rows for a text — LATERAL-joinable:
    ``SELECT d.doc_id, g.shingle FROM docs d, LATERAL word_ngrams(d.text, 3) g``.
    """

    def eval(self, text: str, n: int):  # noqa: ANN001
        if text is None:
            return
        toks = text.split(" ")
        for i in range(max(len(toks) - n + 1, 0)):
            yield i, " ".join(toks[i:i + n])


def register_udtfs(spark) -> None:
    spark.udtf.register("word_ngrams", WordNGrams)
