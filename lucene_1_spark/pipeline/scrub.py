"""PII scrubbing for training-data pipelines.

A 100-TB pretraining corpus is scrubbed of personally-identifying
strings before anything else touches it; the standard shapes (C4,
CCNet, Dolma's `pii` taggers) are regex families over the raw text.
Everything here is a single projection of JVM-side regex expressions
(`regexp_extract_all` / `regexp_replace` inside whole-stage codegen) —
no Python in the hot path, no shuffle: the operator is
embarrassingly parallel and scales with the scan.

The patterns are deliberately RE2-compatible (no lookarounds, no
backrefs) so an external SQL engine (DuckDB oracle, Trino) evaluates
the IDENTICAL automaton.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# order matters and is part of the contract: emails are scrubbed
# before IPs before phones, and each kind is COUNTED on the text with
# the previous kinds already redacted — so a digit-run inside an
# email can never double-count as a phone.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\b\+?\d[\d -]{7,14}\d\b",
}


def pii_scrub(docs: DataFrame, text_col: str = "text",
              patterns: dict[str, str] | None = None,
              token_fmt: str = "<{kind}>",
              out_col: str | None = None) -> DataFrame:
    """Redact PII matches and count them per document.

    Adds one ``<kind>_n`` long column per pattern (match count, taken
    on the text with every EARLIER kind already redacted — see module
    note on ordering) and ``out_col`` (default ``{text_col}_scrubbed``)
    with every match replaced by ``token_fmt`` — e.g. ``<email>``.
    Null text passes through as null with zero counts.
    """
    pats = patterns if patterns is not None else PII_PATTERNS
    out_col = out_col or f"{text_col}_scrubbed"
    out = docs
    scrubbed = F.col(text_col)
    for kind, pat in pats.items():
        out = out.withColumn(
            f"{kind}_n",
            F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(
                F.size(F.regexp_extract_all(scrubbed,
                                            F.lit(pat), F.lit(0))))
            .cast("long"))
        scrubbed = F.regexp_replace(scrubbed, pat,
                                    token_fmt.format(kind=kind))
    return out.withColumn(out_col, scrubbed)


def pii_summary(docs: DataFrame, text_col: str = "text",
                patterns: dict[str, str] | None = None) -> DataFrame:
    """One-row corpus summary: total redactions per kind + docs
    touched — the pipeline's audit artifact (what fraction of the
    corpus carried PII).  One partial-aggregated pass."""
    pats = patterns if patterns is not None else PII_PATTERNS
    scrubbed = pii_scrub(docs, text_col, pats)
    touched = None
    aggs = []
    for kind in pats:
        aggs.append(F.sum(f"{kind}_n").alias(f"{kind}_total"))
        c = F.col(f"{kind}_n") > 0
        touched = c if touched is None else (touched | c)
    aggs.append(F.sum(F.when(touched, 1).otherwise(0))
                .cast("long").alias("docs_touched"))
    return scrubbed.agg(*aggs)
